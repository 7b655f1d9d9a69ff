package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.streaming.EventStreams

/** Batch-mode coverage of the streaming transformations. The exact
  * same `EventStreams` functions run incrementally under
  * `readStream`/`writeStream` (see EventStreamsSpec) — Spark's unified
  * batch/streaming model means the oracle-checked batch result IS the
  * streaming result once the watermark passes.
  */
object StreamingQueries extends QueryPack {

  private def ev(s: SparkSession, d: String): DataFrame =
    EventStreams.withEventTime(Tables.events(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1-day event-time windows per event_type.
    "q53_window_tumbling" -> ((s, d) =>
      EventStreams.tumblingAgg(ev(s, d), "1 day")),
    // Sliding 6h/3h windows with deterministic mean.
    "q54_window_sliding" -> ((s, d) =>
      EventStreams.slidingAgg(ev(s, d), "6 hours", "3 hours")),
    // Built-in gap-based session windows (2h gap) per user.
    "q55_session_window" -> ((s, d) =>
      EventStreams.sessionAgg(ev(s, d), "2 hours")),
    // Ordered-step funnel over the event stream (signup → click →
    // purchase), one shuffle for the whole chain.
    "q84_funnel" -> ((s, d) =>
      EventStreams.funnelCounts(Tables.events(s, d), "user_id",
        "event_type", "ts", Seq("signup", "click", "purchase"))),
    // Custom keyed-state sessionizer (flatMapGroupsWithState), batch
    // mode: same state logic the incremental stream runs.
    "q56_sessionize_stateful" -> ((s, d) => {
      val sp = s; import sp.implicits._
      EventStreams.sessionizeStateful(
        Tables.events(s, d).as[EventStreams.Event],
        gapMinutes = 120, emitOpen = true).toDF()
    })
  )

  private val gapUs = 7200000000L // 2 hours in µs

  val oracles: Map[String, String] = Map(
    "q84_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |   WHERE event_type = 'signup' GROUP BY user_id),
        | s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |   JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |   WHERE e.event_type = 'click' GROUP BY e.user_id),
        | s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |   JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |   WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        | SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name,
        |   (SELECT count(*) FROM s1) AS users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))""".stripMargin,
    "q53_window_tumbling" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start,
        |  event_type,
        |  count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR)
        |    AS DOUBLE) AS sum_value
        | FROM events GROUP BY 1, 2""".stripMargin,
    "q54_window_sliding" ->
      """WITH e AS (SELECT epoch_us(ts) AS t, event_type, value
        |   FROM events),
        | wins AS (SELECT
        |   make_timestamp((t // 10800000000) * 10800000000
        |     - k * 10800000000) AS w_start, event_type, value
        |  FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k) ks)
        | SELECT w_start, event_type, n,
        |  CAST((num - ((num % den + den) % den)) // den AS BIGINT)
        |    / 1000000.0 AS avg_value
        | FROM (SELECT w_start, event_type, count(*) AS n,
        |   CAST(sum(CAST(value AS DECIMAL(18,4))) * 2000000 AS HUGEINT)
        |     + count(*) AS num,
        |   CAST(2 * count(*) AS HUGEINT) AS den
        |  FROM wins GROUP BY 1, 2)""".stripMargin,
    "q55_session_window" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        | marked AS (SELECT user_id, t,
        |   CASE WHEN lag(t) OVER w IS NULL
        |         OR t - lag(t) OVER w >= $gapUs THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        | sess AS (SELECT user_id, t, sum(ns) OVER (
        |   PARTITION BY user_id ORDER BY t
        |   ROWS UNBOUNDED PRECEDING) AS sid FROM marked)
        | SELECT user_id, make_timestamp(min(t)) AS session_start,
        |  make_timestamp(max(t) + $gapUs) AS session_end,
        |  count(*) AS n_events
        | FROM sess GROUP BY user_id, sid""".stripMargin,
    "q56_sessionize_stateful" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        | marked AS (SELECT user_id, t,
        |   CASE WHEN lag(t) OVER w IS NULL
        |         OR t - lag(t) OVER w > $gapUs THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        | sess AS (SELECT user_id, t, sum(ns) OVER (
        |   PARTITION BY user_id ORDER BY t
        |   ROWS UNBOUNDED PRECEDING) AS sid FROM marked)
        | SELECT user_id, min(t) AS start_us, max(t) AS end_us,
        |  count(*) AS n_events
        | FROM sess GROUP BY user_id, sid""".stripMargin
  )
}
