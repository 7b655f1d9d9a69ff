package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.functions.Sketches

/** KMV sketch coverage. The estimate is a deterministic function of
  * xxhash64, which DuckDB cannot recompute — rows-only driver check
  * (like q43); SketchesSpec proves accuracy, determinism, and exact
  * mergeability instead. */
object SketchQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-event-type approximate distinct users, k=256 (~6% σ)
    "q80_kmv_distinct" -> ((s, d) =>
      Sketches.approxDistinctByKey(Tables.events(s, d),
        Seq("event_type"), "user_id", k = 256))
  )

  val oracles: Map[String, String] = Map.empty
}
