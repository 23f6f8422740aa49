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
    },

    // Stateful sessionization (flatMapGroupsWithState); oracle = the SQL
    // "islands" formulation of the same 30-min-gap session logic.
    QueryDef("s02_sessionize",
      """WITH flags AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM flags)
        |SELECT user_id, sid, count(*) AS n_events,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |FROM sess GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      EventStreams.sessionize(s, dir)
    },

    // Streaming dedup (watermarked dropDuplicates): output is the
    // distinct key set, so plain SELECT DISTINCT is the exact oracle.
    QueryDef("s03_stream_dedup",
      "SELECT DISTINCT user_id, event_type FROM events") { (s, dir) =>
      EventStreams.streamDedup(s, dir)
    },

    // Stream-stream interval join (purchases x preceding-hour clicks per
    // user); oracle = the same interval join in batch SQL.
    QueryDef("s04_stream_stream_join",
      """SELECT p.user_id AS p_user, p.event_id AS p_id,
        | count(*) AS n_clicks
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      EventStreams.streamStreamJoin(s, dir)
    },

    // Streaming parquet sink through graft:// (file-sink commit protocol
    // over the caching FS), read back through the cache for the
    // aggregate; oracle = the same aggregate on the batch table.
    QueryDef("s05_stream_cache_sink",
      """SELECT event_type, count(*) AS n, round(sum(value),3) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      EventStreams.streamToCacheSink(s, dir)
    },

    // foreachBatch incremental ETL: per-batch partial aggregates (exact
    // cents longs) appended to a graft:// log, folded on read; oracle =
    // the same fixed-point aggregate over the batch table.
    QueryDef("s06_foreach_batch",
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(floor(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      EventStreams.foreachBatchPartials(s, dir)
    },

    // Stream-static broadcast join (dimension enrichment) + aggregation;
    // oracle = the same join/agg in batch SQL. sum(value) per group is
    // order-dependent double addition in principle, but identical at
    // round(,3) (the s01 contract, green since r1).
    QueryDef("s07_stream_static_join",
      """SELECT c.c_mktsegment, e.event_type, count(*) AS n,
        | round(sum(e.value),3) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      EventStreams.streamStaticJoin(s, dir)
    },

    // Spark 4 transformWithState (typed ValueState over RocksDB): per-user
    // lifetime stats; the one-shot AvailableNow emission equals the batch
    // aggregate, so the plain GROUP BY is the exact oracle (all-integer).
    QueryDef("s08_transform_with_state",
      """SELECT user_id, count(*) AS n_events,
        | CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS span_us,
        | CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_clicks
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      EventStreams.transformWithStateStats(s, dir)
    },

    // Built-in session_window aggregation; oracle = the same 30-min-gap
    // islands formulation as s02, with sessions keyed by their start
    // time instead of a per-user counter (window identity is the merged
    // interval). Boundary convention differs from s02: session_window
    // intervals are half-open [ts, ts+gap), so a gap of EXACTLY 30min
    // does not merge — the oracle splits on >= where s02 splits on >.
    // All-integer output.
    QueryDef("s09_session_window",
      """WITH flags AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flags)
        |SELECT user_id, epoch_us(min(ts)) AS sess_start_us,
        |  count(*) AS n_events,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |FROM sess GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      EventStreams.sessionWindows(s, dir)
    },

    // Sliding-window aggregation (6h windows every 3h — size/slide = 2
    // overlapping windows per event); oracle assigns each event to both
    // of its window starts via UNION ALL and re-aggregates. Same
    // round(,3) sum contract as s01.
    QueryDef("s10_sliding_window",
      """WITH w AS (
        |  SELECT CAST(floor(epoch(ts) / 10800) * 10800 AS BIGINT) AS win_start_s,
        |         event_type, value FROM events
        |  UNION ALL
        |  SELECT CAST((floor(epoch(ts) / 10800) - 1) * 10800 AS BIGINT) AS win_start_s,
        |         event_type, value FROM events)
        |SELECT win_start_s, event_type, count(*) AS n,
        |       round(sum(value), 3) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      EventStreams.slidingCounts(s, dir)
    },

    // Stream-stream LEFT OUTER join: s04's pairing plus null-padded
    // emission for click-less purchases once the watermark proves no
    // match can arrive. Both arms restrict to the completed region
    // (p_ts <= max stream time - 2h: watermark delay + join range +
    // margin) — a purchase's verdict is final only once its window
    // closed; the last delay's worth is still legitimately pending
    // state when an AvailableNow run stops. count(c.event_id) counts
    // non-null matches, so unmatched purchases emit n_clicks = 0.
    QueryDef("s11_stream_outer_join",
      """SELECT p.user_id AS p_user, p.event_id AS p_id,
        | count(c.event_id) AS n_clicks
        |FROM events p LEFT JOIN events c
        |  ON p.user_id = c.user_id
        | AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |WHERE p.event_type = 'purchase'
        |  AND epoch_us(p.ts) <= (SELECT max(epoch_us(ts)) FROM events) - 7200000000
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      EventStreams.streamOuterJoin(s, dir)
    },

    // Streaming sketch maintenance: per-micro-batch count-min partials
    // (native count_min_sketch aggregate) appended to a log, merged
    // after the stream with no raw replay; emission = exact top-10
    // users (ties by user_id) with the merged sketch's estimate
    // contract riding in-band (seed-fixed, deterministic per SF).
    QueryDef("s12_stream_sketch",
      """SELECT user_id, cnt, CAST(rnk AS BIGINT) AS rnk, true AS cms_ok
        |FROM (
        |  SELECT user_id, count(*) AS cnt,
        |    row_number() OVER (ORDER BY count(*) DESC, user_id) AS rnk
        |  FROM events GROUP BY user_id) t
        |WHERE rnk <= 10""".stripMargin) { (s, dir) =>
      EventStreams.streamingSketch(s, dir)
    },

    // Streaming ingest dedup (s13): documents arrive as id-ordered
    // micro-batches, each deduped against the accumulated signature
    // store + its own lower-id members (greedy first-occurrence — the
    // d49 discipline run continuously). n_dups_prior counts ALL
    // lower-id jaccard >= 0.3 matches, so the output is independent of
    // batch boundaries and the oracle is the global lower-id rule;
    // batches_ok pins in-band that the run really crossed 4 distinct
    // micro-batches (the store path is vacuous in a one-batch
    // collapse). Planted re-crawl twins (id + 3,000,000) arrive in the
    // final batch and must be flagged against the store.
    QueryDef("s13_stream_ingest_dedup",
      """WITH input AS (
        |  SELECT doc_id, lang, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id, lang, source,
        |         text || ' is ' || (doc_id % 97) AS text
        |  FROM documents WHERE doc_id % 6 = 2),
        |sh AS (SELECT doc_id, lang, source,
        |  list_distinct(list_transform(
        |    range(1, greatest(len(regexp_extract_all(text,'\S+'))-2,0)+1),
        |    i->concat(regexp_extract_all(text,'\S+')[i],' ',
        |              regexp_extract_all(text,'\S+')[i+1],' ',
        |              regexp_extract_all(text,'\S+')[i+2]))) AS grams
        |  FROM input),
        |p AS (SELECT b.doc_id AS id, count(*) AS c
        |      FROM sh a JOIN sh b
        |        ON a.lang = b.lang AND a.source = b.source
        |          AND a.doc_id < b.doc_id
        |      WHERE length(list_intersect(a.grams,b.grams)) > 0
        |        AND round(CAST(length(list_intersect(a.grams,b.grams)) AS DOUBLE) /
        |          (length(a.grams)+length(b.grams)
        |           -length(list_intersect(a.grams,b.grams))),3) >= 0.3
        |      GROUP BY b.doc_id)
        |SELECT i.doc_id,
        |  CAST(COALESCE(p.c,0) AS BIGINT) AS n_dups_prior,
        |  COALESCE(p.c,0) = 0 AS kept, true AS batches_ok
        |FROM input i LEFT JOIN p ON p.id = i.doc_id""".stripMargin) { (s, dir) =>
      EventStreams.streamIngestDedup(s, dir)
    },

    // Streaming per-language token-budget quota admission (s14): the
    // streaming counterpart of d29's budget selection — id-ordered
    // micro-batches admit docs until a provisioned per-lang budget
    // (corpus_total div 8, sized in a pre-pass like any quota
    // provisioned from yesterday's stats) is exhausted; per-lang
    // consumed state rides an external batch_id-keyed store (the s13
    // idempotency discipline). The budget crosses in a DIFFERENT batch
    // per language at every SF (en in batch 2, the small langs in
    // batch 4), so cross-batch state is load-bearing; the admitted set
    // is batch-boundary independent (monotone-exhaustion argument in
    // the streamQuota scaladoc), so the oracle is the global
    // lower-id-prefix rule; batches_ok pins the 4-batch shape in-band.
    QueryDef("s14_stream_quota",
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    len(regexp_extract_all(text, '\S+')) AS n_tok
        |  FROM documents),
        |b AS (SELECT sum(n_tok) // 8 AS budget FROM tok),
        |c AS (
        |  SELECT doc_id, lang, n_tok,
        |    coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS arrived_before
        |  FROM tok)
        |SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
        |  CAST(arrived_before AS BIGINT) AS arrived_before,
        |  arrived_before < (SELECT budget FROM b) AS admitted,
        |  true AS batches_ok
        |FROM c""".stripMargin) { (s, dir) =>
      EventStreams.streamQuota(s, dir)
    },

    // Streaming curation COMPOSITION (s15): quality → repetition →
    // causal line-clean vs the accumulated hot-line store → near-dup vs
    // the accumulated gram store (s13) → per-lang quota (s14), as ONE
    // micro-batch pipeline with three external batch_id-keyed stores.
    // Every rule is causal (lower-id = already arrived), so the
    // composed per-doc outcome is batch-boundary independent and the
    // oracle is one global replay assembled from the stages' proven
    // formulations (d19/d53 quality-rep, d52's line axis with the
    // streaming first-3-keep rule, s13's lower-id jaccard, s14's
    // lower-id prefix quota over the CLEANED kept stream). batches_ok
    // pins the 4-batch shape in-band; StreamRetrySpec drives
    // re-delivery idempotency.
    QueryDef("s15_stream_curation",
      """WITH base0 AS MATERIALIZED (
        |  SELECT doc_id, lang, source,
        |    CASE WHEN doc_id % 101 = 17 AND doc_id % 6 <> 2
        |      THEN 'subscribe to the newsletter edition ' ||
        |           CAST(doc_id % 3 AS VARCHAR) ||
        |           '. all rights reserved form ' ||
        |           CAST(doc_id % 2 AS VARCHAR)
        |      ELSE text END AS text
        |  FROM documents WHERE doc_id % 2 = 0),
        |inp0 AS MATERIALIZED (
        |  SELECT doc_id, lang, source, text FROM base0
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id, lang, source,
        |         text || ' is ' || (doc_id % 97) AS text
        |  FROM base0 WHERE doc_id % 6 = 2),
        |inp AS MATERIALIZED (
        |  SELECT doc_id, lang, source,
        |    CASE WHEN doc_id % 7 = 0 THEN 'subscribe to the newsletter edition ' ||
        |      CAST(doc_id % 3 AS VARCHAR) || '. ' ELSE '' END || text ||
        |    CASE WHEN doc_id % 5 = 0 THEN '. all rights reserved form ' ||
        |      CAST(doc_id % 2 AS VARCHAR) ELSE '' END AS text
        |  FROM inp0),
        |bud AS MATERIALIZED (
        |  SELECT sum(len(regexp_extract_all(text, '\S+'))) // 16 AS budget
        |  FROM inp),
        |f AS MATERIALIZED (SELECT doc_id, lang, source, text,
        |   regexp_extract_all(text,'\S+') AS tk,
        |   length(regexp_extract_all(text,'\S+')) AS n_tok,
        |   list_sum(list_transform(regexp_extract_all(text,'\S+'),
        |     t->length(t))) AS tok_chars,
        |   length(list_filter(regexp_extract_all(text,'\S+'),
        |     t -> t IN ('the','a','and','of','to','in','is'))) AS n_stop
        |  FROM inp),
        |g AS MATERIALIZED (SELECT *, greatest(n_tok-2,0) AS n_tri,
        |   length(list_distinct(list_transform(
        |     range(1, greatest(n_tok-2,0)+1),
        |     i -> concat(tk[i],' ',tk[i+1],' ',tk[i+2])))) AS n_tri_distinct
        |  FROM f),
        |q AS MATERIALIZED (SELECT doc_id, lang, source, text, tk FROM g
        |  WHERE n_tok BETWEEN 10 AND 1000
        |    AND 2*n_tok <= tok_chars AND tok_chars <= 12*n_tok
        |    AND n_stop >= 2
        |    AND (n_tri = 0 OR 10*n_tri_distinct >= 4*n_tri)),
        |rep0 AS MATERIALIZED (SELECT doc_id, g2, count(*) AS k FROM (
        |   SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g2
        |   FROM q, unnest(range(1, greatest(len(tk)-1,0)+1)) r(i))
        |  GROUP BY doc_id, g2),
        |rep1 AS MATERIALIZED (SELECT doc_id, max(k) AS top_k,
        |   sum(CASE WHEN k > 1 THEN k ELSE 0 END) AS dup_k, sum(k) AS n_g
        |  FROM rep0 GROUP BY doc_id),
        |rep AS MATERIALIZED (SELECT q.* FROM q JOIN rep1 USING (doc_id)
        |  WHERE n_g < 20 OR (top_k*1000 <= 50*n_g AND dup_k*1000 <= 120*n_g)),
        |ls0 AS MATERIALIZED (SELECT doc_id,
        |   list_filter(regexp_split_to_array(text, '[.!?]+\s+'),
        |     x -> length(trim(x)) > 0) AS ls FROM rep),
        |lns AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos, ls[i] AS line
        |  FROM ls0, unnest(range(1, len(ls)+1)) r(i)),
        |dl AS MATERIALIZED (SELECT DISTINCT doc_id, line FROM lns),
        |rnk AS MATERIALIZED (SELECT doc_id, line,
        |   row_number() OVER (PARTITION BY line ORDER BY doc_id) - 1 AS prior
        |  FROM dl),
        |hotfor AS MATERIALIZED (SELECT doc_id, line FROM rnk WHERE prior >= 3),
        |ld0 AS MATERIALIZED (SELECT l.doc_id,
        |   string_agg(l.line, ' ' ORDER BY l.pos) AS ltext
        |  FROM lns l WHERE NOT EXISTS (SELECT 1 FROM hotfor h
        |    WHERE h.doc_id = l.doc_id AND h.line = l.line)
        |  GROUP BY l.doc_id),
        |ld AS MATERIALIZED (SELECT r.doc_id, r.lang, r.source,
        |   l.ltext AS text, regexp_extract_all(l.ltext,'\S+') AS tk
        |  FROM rep r JOIN ld0 l USING (doc_id)),
        |sh AS MATERIALIZED (SELECT doc_id, lang, source,
        |   list_distinct(list_transform(range(1, greatest(len(tk)-2,0)+1),
        |     i->concat(tk[i],' ',tk[i+1],' ',tk[i+2]))) AS grams FROM ld),
        |p AS MATERIALIZED (SELECT b.doc_id AS id, count(*) AS c
        |  FROM sh a JOIN sh b
        |    ON a.lang = b.lang AND a.source = b.source
        |      AND a.doc_id < b.doc_id
        |  WHERE length(list_intersect(a.grams,b.grams)) > 0
        |    AND round(CAST(length(list_intersect(a.grams,b.grams)) AS DOUBLE) /
        |      (length(a.grams)+length(b.grams)
        |       -length(list_intersect(a.grams,b.grams))),3) >= 0.3
        |  GROUP BY b.doc_id),
        |keptq AS MATERIALIZED (SELECT d.doc_id, d.lang, len(d.tk) AS n_tok
        |  FROM ld d LEFT JOIN p ON p.id = d.doc_id
        |  WHERE COALESCE(p.c, 0) = 0),
        |cq AS MATERIALIZED (SELECT doc_id,
        |   coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |     AS arrived_before
        |  FROM keptq)
        |SELECT i.doc_id, i.lang,
        |  CASE WHEN q.doc_id IS NULL THEN 'quality'
        |       WHEN re.doc_id IS NULL THEN 'repetition'
        |       WHEN d.doc_id IS NULL THEN 'line_emptied'
        |       WHEN COALESCE(p.c, 0) > 0 THEN 'dup'
        |       WHEN cq.arrived_before >= (SELECT budget FROM bud) THEN 'quota'
        |       ELSE 'admitted' END AS outcome,
        |  true AS batches_ok
        |FROM inp i
        |  LEFT JOIN q ON q.doc_id = i.doc_id
        |  LEFT JOIN rep re ON re.doc_id = i.doc_id
        |  LEFT JOIN ld d ON d.doc_id = i.doc_id
        |  LEFT JOIN p ON p.id = i.doc_id
        |  LEFT JOIN cq ON cq.doc_id = i.doc_id""".stripMargin) { (s, dir) =>
      EventStreams.streamCuration(s, dir)
    }
  )
}
