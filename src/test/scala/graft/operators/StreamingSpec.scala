package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming surface: the stateful sessionizer
  * (flatMapGroupsWithState) must agree with the batch SQL "islands"
  * formulation of the same 30-minute-gap session logic, and the windowed
  * aggregation must cover every input event exactly once. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("sessionize matches batch islands formulation") {
    val streamed = graft.streaming.EventStreams.sessionize(spark, dir)
      .orderBy("user_id", "sid").collect()

    Tables.load(spark, dir, "events").createOrReplaceTempView("ev")
    val batch = spark.sql(
      """WITH flags AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR unix_micros(ts) - unix_micros(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags)
        |SELECT user_id, sid, count(*) AS n_events,
        |  unix_micros(max(ts)) - unix_micros(min(ts)) AS dur_us
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, sid""".stripMargin).collect()

    assert(streamed.length == batch.length,
      s"session count ${streamed.length} != batch ${batch.length}")
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.toString == b.toString, s"session mismatch: $s vs $b")
    }
    // every session must respect the gap invariant: duration is bounded
    // by (n_events - 1) * gap, since consecutive events are <= gap apart
    val gap = graft.streaming.EventStreams.SessionGapUs
    streamed.foreach { r =>
      val n = r.getAs[Long]("n_events"); val dur = r.getAs[Long]("dur_us")
      assert(dur <= (n - 1) * gap, s"gap invariant violated: $r")
    }
  }

  test("windowed counts cover every event exactly once") {
    val win = graft.streaming.EventStreams.windowedCounts(spark, dir)
    val total = win.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    val expected = Tables.load(spark, dir, "events").count()
    assert(total == expected, s"windowed n sums to $total, expected $expected")
  }

  test("sliding windows cover every event exactly twice (size/slide = 2)") {
    val win = graft.streaming.EventStreams.slidingCounts(spark, dir)
    val total = win.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    val expected = Tables.load(spark, dir, "events").count()
    assert(total == 2 * expected,
      s"sliding n sums to $total, expected ${2 * expected} (every event in 2 windows)")
    // and each window start is a slide-aligned epoch second
    val misaligned = win.filter(
      org.apache.spark.sql.functions.expr("win_start_s % 10800 != 0")).count()
    assert(misaligned == 0, s"$misaligned window starts off the 3h slide grid")
  }

  test("session_window agrees with batch islands under the [ts, ts+gap) convention") {
    val streamed = graft.streaming.EventStreams.sessionWindows(spark, dir)
      .orderBy("user_id", "sess_start_us").collect()

    Tables.load(spark, dir, "events").createOrReplaceTempView("ev_sw")
    // session_window merges half-open intervals, so a gap of EXACTLY the
    // 30-min threshold starts a new session: split on >=, not > (s02).
    val batch = spark.sql(
      """WITH flags AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR unix_micros(ts) - unix_micros(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM ev_sw
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags)
        |SELECT user_id, unix_micros(min(ts)) AS sess_start_us,
        |  count(*) AS n_events,
        |  unix_micros(max(ts)) - unix_micros(min(ts)) AS dur_us
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, sess_start_us""".stripMargin).collect()

    assert(streamed.length == batch.length && streamed.nonEmpty,
      s"session count ${streamed.length} != batch ${batch.length}")
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.toString == b.toString, s"session mismatch: $s vs $b")
    }
  }

  test("stream-static join matches the batch join+agg") {
    import org.apache.spark.sql.functions._
    val streamed = graft.streaming.EventStreams.streamStaticJoin(spark, dir)
      .orderBy("c_mktsegment", "event_type").collect()
    val batch = Tables.load(spark, dir, "events")
      .join(Tables.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 3).as("sum_value"))
      .orderBy("c_mktsegment", "event_type").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty,
      s"${streamed.length} vs ${batch.length}")
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.toString == b.toString, s"row mismatch: $s vs $b")
    }
  }

  test("stream-stream outer join emits null-padded rows for click-less purchases") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.EventStreams.streamOuterJoin(spark, dir)
    val counts = out.groupBy((col("n_clicks") === 0L).as("unmatched"))
      .count().collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    // the whole point vs s04: zero-click purchases DO appear, via the
    // watermark-driven eviction emit — if noDataBatches regressed or the
    // state watermark stopped passing, this drops to zero
    assert(counts.getOrElse(true, 0L) > 0,
      s"no unmatched purchases emitted: $counts")
    assert(counts.getOrElse(false, 0L) > 0,
      s"no matched purchases emitted: $counts")
    // and the matched subset must agree with the inner join (the outer
    // output is already completed-region-filtered; the id-join restricts
    // the comparison to the common region)
    val inner = graft.streaming.EventStreams.streamStreamJoin(spark, dir)
      .withColumnRenamed("p_user", "u").withColumnRenamed("p_id", "i")
      .withColumnRenamed("n_clicks", "n_inner")
    val joined = out.filter(col("n_clicks") > 0)
      .join(inner, col("p_user") === col("u") && col("p_id") === col("i"))
    assert(joined.filter(col("n_clicks") =!= col("n_inner")).count() == 0)
  }
}
