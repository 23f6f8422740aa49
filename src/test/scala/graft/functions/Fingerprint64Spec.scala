package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class Fingerprint64Spec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fingerprint64.register(spark)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Reference FNV-1a, implemented independently of the expression. */
  private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    for (b <- s.getBytes("UTF-8")) { h ^= (b & 0xffL); h *= 0x100000001b3L }
    h
  }

  test("matches the FNV-1a spec through whole-stage codegen") {
    import scala.jdk.CollectionConverters._
    val rows = Seq("", "a", "hello world", "snowman ☃ utf8",
      "x" * 10000).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = spark.createDataFrame(rows).toDF("id", "s")
    val got = df.selectExpr("id", "fingerprint64(s) AS fp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, s) =>
      assert(got(id) == fnv1a(s), s"mismatch for '${s.take(20)}'")
    }
    // plan stays inside whole-stage codegen (LocalTableScan folds local
    // relations, so check over a real file scan)
    val plan = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("fingerprint64(text)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"fingerprint must codegen:\n$plan")
  }

  test("interpreted path (outside codegen) agrees with codegen path") {
    val e = Fingerprint64(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("graft")))
    assert(e.eval(null) == fnv1a("graft"))
  }

  test("null and type errors behave") {
    val r = spark.sql("SELECT fingerprint64(CAST(NULL AS STRING)) AS fp")
      .collect()
    assert(r.head.isNullAt(0), "null in -> null out")
    intercept[Exception] {
      spark.sql("SELECT fingerprint64(42)").collect()
    }
  }
}
