package graft.operators

import org.apache.spark.sql.functions._

/** Event-stream-shaped queries: as-of join (oracle: DuckDB ASOF JOIN). */
object EventQueries {

  val defs: Seq[QueryDef] = Seq(

    // For each purchase, the most recent at-or-before click by the same
    // user: gap in microseconds + that click's value.
    QueryDef("q33_asof_join",
      """SELECT p.event_id AS purchase_id, p.user_id,
        |       round(c.value, 3) AS click_value,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      AsOfJoin.asofBackward(purchases, clicks, "user_id", "ts",
          Seq("value" -> "click_value"))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          round(col("__matched.click_value"), 3).as("click_value"),
          (unix_micros(col("ts")) - unix_micros(col("__matched.__r_ts"))).as("gap_us"))
    },

    // Same as-of semantics through the custom whole-operator plan
    // (AsOfJoinNode -> AsOfJoinStrategy -> AsOfJoinExec): one streaming
    // merge per co-partitioned pair, no union/window. Same DuckDB oracle
    // as q33 — the two formulations must agree bit-for-bit.
    QueryDef("q38_asof_custom_plan",
      """SELECT p.event_id AS purchase_id, p.user_id,
        |       round(c.value, 3) AS click_value,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
          col("value").as("r_value"))
      graft.plans.GraftAsOf.join(purchases, clicks,
          leftKey = "user_id", leftTs = "ts",
          rightKey = "r_user_id", rightTs = "r_ts")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          round(col("r_value"), 3).as("click_value"),
          (unix_micros(col("ts")) - unix_micros(col("r_ts"))).as("gap_us"))
    }
  )
}
