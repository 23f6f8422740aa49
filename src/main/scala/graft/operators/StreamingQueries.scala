package graft.operators

import graft.streaming.EventStreams

/** Gate entry for the streaming surface; oracle buckets event time the
  * same way the tumbling window does (epoch // 21600 * 21600). */
object StreamingQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef("s01_stream_window",
      """SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS win_start_s,
        | event_type, count(*) AS n, round(sum(value),3) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      EventStreams.windowedCounts(s, dir)
    }
  )
}
