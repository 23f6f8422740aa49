package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of plan must agree exactly with the composed
  * union+window formulation on real data, plan through AsOfJoinExec
  * (not a window or cartesian), and honor left-outer null semantics. */
class AsOfJoinPlanSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("custom plan result == union+window result on gate data") {
    val a = graft.SparkEntry.queries("q33_asof_join")(spark, dir)
      .collect().map(_.toString).sorted
    val b = graft.SparkEntry.queries("q38_asof_custom_plan")(spark, dir)
      .collect().map(_.toString).sorted
    assert(a.length > 0 && a.sameElements(b),
      s"formulations disagree: ${a.length} vs ${b.length} rows")
  }

  test("physical plan uses AsOfJoinExec, no window, no cartesian") {
    val p = graft.SparkEntry.queries("q38_asof_custom_plan")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"expected the custom exec:\n$p")
    assert(!p.contains("Window"), "custom plan must not fall back to window")
    assert(!p.contains("CartesianProduct"))
  }

  test("unmatched left rows survive with null payload; ties inclusive") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (2L, 10L, "p3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 9.0), (1L, 60L, 7.0), (1L, 10L, 5.0),
      (3L, 1L, 1.0)).toDF("rk", "rt", "v")
    val got = GraftAsOf.join(left, right, "k", "t", "rk", "rt")
      .select("tag", "v").collect().map(r =>
        r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got("p1") == 9.0, "equal timestamps match inclusively")
    assert(got("p2") == 5.0, "latest at-or-before wins")
    assert(got("p3") == null, "key with no right rows yields nulls")
  }

  test("null ts/key right rows are skipped, not stalled on") {
    val s = spark
    import s.implicits._
    // nulls sort first: a null-ts row leads the key group and must not
    // hide the real match behind it; null-key rows must not clear an
    // established candidate
    val left = Seq((1L, 10L, "p1")).toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), None: Option[Long], 99.0),
      (None: Option[Long], Some(1L), 98.0),
      (Some(1L), Some(5L), 7.0)).toDF("rk", "rt", "v")
    val got = GraftAsOf.join(left, right, "k", "t", "rk", "rt")
      .select("tag", "v").collect()
    assert(got.length == 1 && got(0).getDouble(1) == 7.0,
      s"null right rows must be transparent: ${got.toSeq}")
  }

  test("string keys work (reference-typed ordering + copied key)") {
    val s = spark
    import s.implicits._
    val left = Seq(("alpha", 10L, 1L), ("beta", 10L, 2L), ("gamma", 10L, 3L))
      .toDF("k", "t", "lid").repartition(3)
    val right = Seq(("alpha", 5L, 1.0), ("beta", 11L, 2.0), ("delta", 1L, 9.0))
      .toDF("rk", "rt", "v").repartition(2)
    val got = GraftAsOf.join(left, right, "k", "t", "rk", "rt")
      .select(col("lid"), col("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1.0 else r.getDouble(1)))
      .toMap
    assert(got == Map(1L -> 1.0, 2L -> -1.0, 3L -> -1.0), got.toString)
  }

  test("mismatched key types fail fast on the driver") {
    val s = spark
    import s.implicits._
    val left = Seq((1, 10L)).toDF("k", "t")          // Int key
    val right = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v") // Long key
    val e = intercept[IllegalArgumentException] {
      GraftAsOf.join(left, right, "k", "t", "rk", "rt")
    }
    assert(e.getMessage.contains("key types differ"))
  }

  test("many keys and partitions: agrees with a window formulation") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 2000).map(i =>
      (rnd.nextInt(50).toLong, rnd.nextInt(10000).toLong, i.toLong))
      .toDF("k", "t", "lid").repartition(7)
    val right = (1 to 3000).map(i =>
      (rnd.nextInt(50).toLong, rnd.nextInt(10000).toLong, i.toDouble))
      .toDF("rk", "rt", "v").repartition(5)
    // reference: max right (rt, v) per (k, t) via inequality join + window
    val ref = left.join(right,
        left("k") === right("rk") && right("rt") <= left("t"), "left")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lid").orderBy(col("rt").desc_nulls_last, col("v").desc)))
      .filter(col("rnk") === 1 || col("rt").isNull)
      .select(col("lid"), col("rt"), col("v"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val got = GraftAsOf.join(left, right, "k", "t", "rk", "rt")
      .select(col("lid"), col("rt"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got.size == 2000)
    assert(got == ref, {
      val diffs = got.collect { case (k, v) if ref.get(k) != Some(v) =>
        s"$k: got $v want ${ref.get(k)}" }.take(5)
      s"mismatches: $diffs"
    })
  }
}
