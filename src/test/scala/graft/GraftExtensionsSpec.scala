package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions surface: every graft native function must
  * be callable from plain SQL on a session built with
  * `spark.sql.extensions=graft.GraftExtensions`, and agree with the
  * builtin formulations. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("all functions resolve and evaluate from SQL") {
    val r = spark.sql(
      """SELECT
        |  fingerprint64('abc') AS fp,
        |  simhash64(array('the', 'quick', 'fox')) AS sh,
        |  size(minhash_sig(array(1L, 2L, 3L), 64)) AS nperms,
        |  size(shingle_hash64('a b c d', array('a','b','c','d'), 3)) AS nsh,
        |  shingle_hash64('a b', array('a','b'), 3, true) AS short_empty,
        |  round(cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                   array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), 6) AS cs,
        |  l2norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS nrm,
        |  size(srp_bucket_ids(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), 8, 4, 2)) AS nbuckets,
        |  cms_estimate(
        |    (SELECT count_min_sketch(t, 0.01d, 0.99d, 7)
        |     FROM VALUES ('x'), ('x'), ('y') AS v(t)), 'x') AS cms,
        |  sign_bits64(array(CAST(1.5 AS FLOAT), CAST(-0.5 AS FLOAT),
        |                    CAST(0.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS sb
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == graft.functions.Fingerprint64.hash("abc".getBytes("UTF-8")))
    assert(r.getInt(2) == 64)
    assert(r.getInt(3) == 2) // 'a b c d' -> 2 trigrams
    assert(r.getSeq[Long](4).isEmpty)
    assert(r.getDouble(5) == 1.0)
    assert(r.getDouble(6) == 5.0)
    assert(r.getInt(7) == 8)
    assert(r.getLong(8) == 2L, "cms_estimate must recover the exact count of 'x'")
    assert(r.getLong(9) == 9L, // bits 0 (1.5>0) and 3 (2.0>0); 0.0 is NOT set
      "sign_bits64 must set exactly the strictly-positive dims")
  }

  test("SQL simhash64 equals builtin xxhash64 vote aggregation") {
    spark.sql("SELECT 'alpha beta gamma alpha' AS text").createOrReplaceTempView("t")
    val got = spark.sql(
      "SELECT simhash64(split(text, ' ')) AS fp FROM t").collect()(0).getLong(0)
    // independent formulation through builtins (64 vote sums)
    import org.apache.spark.sql.functions._
    val toks = spark.sql(
      "SELECT explode(split('alpha beta gamma alpha', ' ')) AS tok")
    val sums = (0 until 64).map(b =>
      sum(when(expr(s"(xxhash64(tok) >> $b) & 1") === 1, 1L).otherwise(-1L)).as(s"s$b"))
    val row = toks.agg(sums.head, sums.tail: _*).collect()(0)
    var expected = 0L
    (0 until 64).foreach(b => if (row.getLong(b) > 0) expected |= (1L << b))
    assert(got == expected)
  }

  test("static parameters must be literals") {
    intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(1L), CAST(rand() * 4 AS INT))").collect()
    }
  }
}
