package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for d58 (trained discriminative-vocabulary classifier)
  * and e23 (MMR diversity selection) beyond the hash oracle:
  *
  *  - d58's exclusivity restriction is LOAD-BEARING: every marked test
  *    doc classifies to its true language, every unmarked one falls to
  *    'unk', and the starved configuration (the unrestricted
  *    term-frequency dot product) degenerates to one constant
  *    majority-class prediction on this corpus — the measured failure
  *    the restriction exists to prevent.
  *  - e23's diversity term is ACTIVE: the greedy MMR set differs from
  *    the pure relevance top-k over the same candidates (a vacuous
  *    lambda would make them equal), picks are distinct members of the
  *    candidate slice, and the first pick is the relevance argmax.
  */
class ClassifyMmrSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("d58: marked docs classify exactly; unmarked fall to unk") {
    val rows = q("d58_centroid_classify").collect()
    assert(rows.nonEmpty)
    var marked = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val pred = r.getAs[String]("pred_lang")
      if (id % 2 == 0) {
        marked += 1
        assert(pred == r.getAs[String]("lang") && r.getAs[Boolean]("correct"),
          s"marked doc $id predicted $pred, true ${r.getAs[String]("lang")}")
        assert(r.getAs[Long]("score") > 0)
      } else {
        assert(pred == "unk" && r.getAs[Long]("score") == 0L,
          s"unmarked doc $id predicted $pred")
      }
    }
    assert(marked > 10, s"flow: $marked marked test docs")
  }

  test("d58 dial: the unrestricted dot product is majority-constant") {
    // the same pipeline minus the exclusive-vocabulary filter — on this
    // corpus's language-independent vocabulary it must collapse to a
    // single constant prediction (measured 'en', the largest class)
    val tok = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("w"))
    val model = tok.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      .groupBy(col("lang").as("ml"), col("w")).agg(count(lit(1)).as("cnt"))
    val preds = tok.filter(pmod(col("doc_id"), lit(3)) === 0)
      .join(broadcast(model), Seq("w"))
      .groupBy("doc_id", "ml").agg(sum("cnt").as("score"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("ml").asc)))
      .filter(col("rn") === 1)
      .select("ml").distinct().collect().map(_.getString(0))
    assert(preds.length == 1,
      s"unrestricted model should be constant, predicted ${preds.toSeq}")
  }

  test("e23: picks distinct, in-slice, first = relevance argmax, set != top-k") {
    val rows = q("e23_mmr_select").orderBy("t").collect()
    assert(rows.length == 8)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 8, "picks must be distinct")
    assert(ids.forall(_ % 5 == 3), "picks must come from the candidate slice")

    val e = Tables.load(spark, dir, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val topByRel = e.filter(pmod(col("vec_id"), lit(5)) === 3)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .crossJoin(broadcast(qv))
      .select(col("cid"),
        graft.functions.VectorOps.cosineSim(col("ce"), col("qe")).as("rel"))
      .orderBy(col("rel").desc, col("cid").asc).limit(8)
      .collect().map(_.getAs[Long]("cid"))
    assert(ids.head == topByRel.head, "step 1 is the relevance argmax")
    assert(ids.toSet != topByRel.toSet,
      "diversity term inactive: MMR set equals the pure top-k set")
  }
}
