package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cross-batch session continuity: the EventTimeTimeout sessionizer must
  * carry an OPEN session across micro-batch boundaries and emit it ONCE,
  * with the merged duration, when the watermark passes the inactivity
  * gap — the continuous-deployment semantics the one-shot [[
  * graft.streaming.EventStreams.sessionize]] scope note defers to it. */
class OpenSessionSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val gapUs = graft.streaming.EventStreams.SessionGapUs // 30 min

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("session spanning a batch boundary emits once with merged duration") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[(Long, Long)] // (user_id, tus)
    val events = in.toDS().toDF("user_id", "tus")
      .selectExpr("user_id", "timestamp_micros(tus) AS ts")
      .withWatermark("ts", "0 seconds")
    val sessions = graft.streaming.EventStreams.sessionizeOpen(s, events)
      .toDF("user_id", "sid", "n_events", "dur_us")

    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("open_sessions").start()
    try {
      // events sit one day off epoch: the watermark filter drops rows
      // with ts <= watermark, and the pre-first-batch watermark is 0
      def us(sec: Long): Long = (86400L + sec) * 1000000L
      def dur(sec: Long): Long = sec * 1000000L

      // batch 1: user 1 starts a session; user 2 fires a lone event
      in.addData((1L, us(0)), (1L, us(60)), (2L, us(0)))
      q.processAllAvailable()
      assert(s.table("open_sessions").count() == 0,
        "no session may emit while still inside the gap")

      // batch 2: user 1 continues the SAME session (540s < 30min gap);
      // user 3's far-future event drives the watermark past everyone
      in.addData((1L, us(600)), (3L, us(100000)))
      q.processAllAvailable()

      // trailing no-data batches fire the event-time timeouts; poll for
      // the two closed sessions (user 3's stays open forever)
      val deadline = System.currentTimeMillis() + 20000
      def rows() = s.table("open_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      while (System.currentTimeMillis() < deadline && rows().length < 2) {
        in.addData((3L, us(100001))) // nudge another batch along
        q.processAllAvailable()
        Thread.sleep(100)
      }
      val out = rows().sortBy(_._1)
      assert(out.length == 2, s"expected exactly 2 closed sessions, got ${out.mkString(",")}")
      // user 1: ONE merged session over both batches: 3 events, 600s span
      assert(out(0) == ((1L, 1L, 3L, dur(600))),
        s"cross-batch session must merge, got ${out(0)}")
      // user 2: lone event, zero duration
      assert(out(1) == ((2L, 1L, 1L, 0L)))
      // user 3 must NOT have emitted (session still open)
      assert(!out.exists(_._1 == 3L))
    } finally q.stop()
  }

  test("late events merge into the open session, never split or negate duration") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[(Long, Long)]
    // generous watermark delay so batch-2 late events are ACCEPTED
    val events = in.toDS().toDF("user_id", "tus")
      .selectExpr("user_id", "timestamp_micros(tus) AS ts")
      .withWatermark("ts", "2 hours")
    val sessions = graft.streaming.EventStreams.sessionizeOpen(s, events)
      .toDF("user_id", "sid", "n_events", "dur_us")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("open_sessions3").start()
    try {
      def us(sec: Long): Long = (86400L + sec) * 1000000L

      in.addData((1L, us(3600)), (1L, us(3660)))
      q.processAllAvailable()
      // batch 2: a LATE event before the open session's start, an in-span
      // late event, and a fresh one — all must merge into ONE session
      in.addData((1L, us(3000)), (1L, us(3630)), (1L, us(3700)),
        (9L, us(400000)))
      q.processAllAvailable()

      val deadline = System.currentTimeMillis() + 20000
      def rows() = s.table("open_sessions3")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      while (System.currentTimeMillis() < deadline && !rows().exists(_._1 == 1L)) {
        in.addData((9L, us(400001)))
        q.processAllAvailable()
        Thread.sleep(100)
      }
      val u1 = rows().filter(_._1 == 1L)
      assert(u1.length == 1, s"late events must not split the session: ${u1.mkString(",")}")
      assert(u1(0) == ((1L, 1L, 5L, 700L * 1000000)),
        s"merged session must span 3000..3700 with all 5 events, got ${u1(0)}")
      assert(rows().forall(_._4 >= 0), "durations must never be negative")
    } finally q.stop()
  }

  test("separated batches produce two sessions with continuous sids") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[(Long, Long)]
    val events = in.toDS().toDF("user_id", "tus")
      .selectExpr("user_id", "timestamp_micros(tus) AS ts")
      .withWatermark("ts", "0 seconds")
    val sessions = graft.streaming.EventStreams.sessionizeOpen(s, events)
      .toDF("user_id", "sid", "n_events", "dur_us")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("open_sessions2").start()
    try {
      def us(sec: Long): Long = (86400L + sec) * 1000000L
      def dur(sec: Long): Long = sec * 1000000L
      val gapS = gapUs / 1000000L

      in.addData((1L, us(0)), (1L, us(10)))
      q.processAllAvailable()
      // batch 2: user 1 returns AFTER the gap -> first session closes in
      // the data batch itself (no timeout needed), second stays open
      in.addData((1L, us(gapS + 100)), (1L, us(gapS + 160)))
      q.processAllAvailable()

      val got1 = s.table("open_sessions2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got1.toSeq == Seq((1L, 1L, 2L, dur(10))),
        s"gap-split must close session 1 in the data batch, got ${got1.mkString(",")}")

      // far-future watermark then closes session 2 via timeout, sid=2
      val deadline = System.currentTimeMillis() + 20000
      def rows() = s.table("open_sessions2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      in.addData((9L, us(1000000)))
      q.processAllAvailable()
      while (System.currentTimeMillis() < deadline && rows().length < 2) {
        in.addData((9L, us(1000001)))
        q.processAllAvailable()
        Thread.sleep(100)
      }
      val out = rows().filter(_._1 == 1L).sortBy(_._2)
      assert(out.length == 2)
      assert(out(1) == ((1L, 2L, 2L, dur(60))),
        s"second session must carry sid 2 and its own duration, got ${out(1)}")
    } finally q.stop()
  }
}
