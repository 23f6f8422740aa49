package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The drift-scaled stream-await contract (r18): budgets scale with the
  * window via the `graft.stream.timeout.scale` property, a timeout
  * throws the classifiable [[StreamTimeoutException]] (never a bare
  * require failure), and the query is stopped on every path — the
  * machinery that keeps one slow-window stream drain from voiding a
  * whole bench round with rc=1. */
class StreamWaitSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def withScaleProp(v: Option[String])(body: => Unit): Unit = {
    val key = "graft.stream.timeout.scale"
    val prev = sys.props.get(key)
    try {
      v match {
        case Some(s) => System.setProperty(key, s)
        case None    => System.clearProperty(key)
      }
      body
    } finally prev match {
      case Some(s) => System.setProperty(key, s)
      case None    => System.clearProperty(key)
    }
  }

  test("scale defaults to 1 and clamps to [1, 16]") {
    withScaleProp(None)(assert(StreamWait.scale == 1.0))
    withScaleProp(Some("4.15"))(assert(StreamWait.scale == 4.15))
    withScaleProp(Some("0.2"))(assert(StreamWait.scale == 1.0))
    withScaleProp(Some("1533"))(assert(StreamWait.scale == 16.0))
    withScaleProp(Some("bogus"))(assert(StreamWait.scale == 1.0))
  }

  test("a finishing AvailableNow query awaits clean under any scale") {
    withScaleProp(Some("8")) {
      val q = spark.readStream.format("rate")
        .option("rowsPerSecond", "10").load()
        .writeStream.format("memory").queryName("sw_ok")
        .trigger(Trigger.AvailableNow()).start()
      StreamWait.await(q, 120000)
      assert(!q.isActive)
    }
  }

  test("a query whose batch THROWS propagates the real error, never a timeout") {
    // classification matters: Bench treats StreamTimeoutException as an
    // environment-class failure (no rc=1) — an engine error inside a
    // micro-batch must surface as itself, not be mistaken for a timeout
    import org.apache.spark.sql.DataFrame
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "10").load()
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        throw new IllegalStateException("engine bug")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    val e = intercept[Throwable](StreamWait.await(q, 120000))
    assert(!e.isInstanceOf[StreamTimeoutException])
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null)
      && chain(e).exists(t => String.valueOf(t.getMessage).contains("engine bug")),
      s"expected the batch error to surface, got: $e")
    assert(!q.isActive)
  }

  test("a non-terminating query times out with StreamTimeoutException and is stopped") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .writeStream.format("memory").queryName("sw_hang")
      .trigger(Trigger.ProcessingTime("10 seconds")).start()
    val e = intercept[StreamTimeoutException](StreamWait.await(q, 300))
    assert(e.getMessage.contains("timed out"))
    assert(!q.isActive, "timeout path must stop the query")
  }
}
