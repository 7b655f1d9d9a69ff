package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.NowFunctions

/** As-of / range-join coverage over the events and lineitem tables.
  * DuckDB's native ASOF JOIN recomputes q76 independently; q77's
  * oracle is the plain theta join the binned plan must agree with. */
object TemporalQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // For every click, the latest view of the same user at or before
    // it (the canonical as-of lookup over an event stream).
    "q76_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      // unique (key, time) on the right side — as-of determinism
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("view_id"))
      TemporalJoins.asofJoin(clicks, views, "user_id", "ts", "ts", "v_")
        .select(col("event_id").as("click_id"), col("v_view_id").as("view_id"),
          NowFunctions.intDiv(col("ts") - col("v_ts"), lit(1000000000L))
            .as("lag_s"))
    }),
    // Overlapping price bands × lineitem: per-band count and exact sum.
    // Bands overlap (4500 step, 7000 width), so no aligned-bucket
    // rewrite applies — this exercises the real interval-join path.
    "q77_range_join" -> ((s, d) => {
      val bands = s.range(0, 25).select(col("id").as("band_id"),
        (col("id") * 4500.0).as("lo"), (col("id") * 4500.0 + 7000.0).as("hi"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"))
      TemporalJoins.rangeJoinBinned(li, "l_extendedprice", bands,
          "lo", "hi", binWidth = 7000.0)
        .groupBy(col("i_band_id").as("band_id"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("l_extendedprice") * 10000).cast("long")) /
            10000.0).as("sum_price"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q76_asof_join" ->
      """WITH v AS (SELECT user_id, ts, max(event_id) AS view_id
        |   FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
        | c AS (SELECT user_id, ts, event_id FROM events
        |   WHERE event_type = 'click')
        | SELECT c.event_id AS click_id, v.view_id AS view_id,
        |  (epoch_ns(c.ts) - epoch_ns(v.ts)) // 1000000000 AS lag_s
        | FROM c ASOF JOIN v
        |   ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin,
    "q77_range_join" ->
      """WITH bands AS (SELECT i AS band_id, i * 4500.0 AS lo,
        |   i * 4500.0 + 7000.0 AS hi
        |  FROM UNNEST(generate_series(0, 24)) AS t(i))
        | SELECT band_id, count(*) AS n,
        |  sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) / 10000.0
        |    AS sum_price
        | FROM lineitem JOIN bands
        |   ON l_extendedprice >= lo AND l_extendedprice < hi
        | GROUP BY band_id""".stripMargin
  )
}
