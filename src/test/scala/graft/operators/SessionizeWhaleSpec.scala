package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Whale-user gate for stateful sessionization: one user contributes
  * 100k events in a single micro-batch (the worst case for the per-group
  * sort buffer). The buffer is a primitive long array (8 B/event), so
  * this must complete comfortably and produce exactly the expected
  * session structure. */
class SessionizeWhaleSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var dir: String = _

  private val gapUs = graft.streaming.EventStreams.SessionGapUs
  private val whaleEvents = 100000
  // one session per 10k events: jump > 30min at every 10k boundary
  private def whaleTs(i: Int): Long =
    i.toLong * 1000000L + (i / 10000).toLong * (gapUs + 60000000L)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage a single-file events.parquet: the whale + a 3-event minnow
    dir = Files.createTempDirectory("graft-whale").toString
    val s = spark
    import s.implicits._
    val whale = (0 until whaleEvents).map(i => (1L, whaleTs(i), i.toLong))
    val minnow = Seq((2L, 0L, 0L), (2L, 1000000L, 1L),
      (2L, gapUs + 2000000L, 2L))
    val stage = s"$dir/_stage"
    (whale ++ minnow).toSeq.toDF("user_id", "tus", "event_id")
      .selectExpr("user_id", "timestamp_micros(tus) AS ts", "event_id")
      .coalesce(1).write.parquet(stage)
    val part = Files.list(Paths.get(stage)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(dir, "events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("100k-event whale user sessionizes correctly in one batch") {
    val t0 = System.nanoTime()
    val out = graft.streaming.EventStreams.sessionize(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"sessionized ${whaleEvents + 3} events in $secs%.1f s")

    val whale = out.filter(_._1 == 1L).sortBy(_._2)
    assert(whale.length == 10, s"expected 10 whale sessions, got ${whale.length}")
    assert(whale.map(_._3).forall(_ == 10000L),
      "each whale session must hold exactly 10k events")
    // within a session events are 1s apart: duration = 9999s
    assert(whale.map(_._4).forall(_ == 9999L * 1000000L))

    val minnow = out.filter(_._1 == 2L).sortBy(_._2)
    assert(minnow.map(m => (m._3, m._4)).toSeq ==
      Seq((2L, 1000000L), (1L, 0L)), s"minnow sessions: ${minnow.toSeq}")
  }
}
