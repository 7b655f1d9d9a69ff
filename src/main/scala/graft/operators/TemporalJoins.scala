package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Time-series joins the reference's designed surface lacks but any
  * analytics engine over stamped events needs (the reference models
  * edges AS time series — SURVEY §2.9; these are the standard
  * operators over that model).
  *
  * Both are built as declarative single-shuffle plans, not nested-loop
  * theta joins:
  *
  *  - [[asofJoin]]: the classic "latest right row at or before each
  *    left row per key". The naive formulation is a non-equi join +
  *    per-row max (quadratic in rows per key). This one unions the two
  *    tagged sides and takes a running `last(right, ignoreNulls)` over
  *    (key, time) — ONE shuffle on the key, linear work, no row
  *    explosion; exactly how a 1000-executor backfill wants it.
  *  - [[rangeJoinBinned]]: point-in-interval join via bucketing: each
  *    interval is exploded to the time bins it covers, points map to
  *    their bin, the join is a plain equi-join on the bin plus an
  *    exact residual filter. Turns O(points × intervals) into
  *    O(points + intervals·(len/bin)) with shuffle keys that
  *    distribute uniformly.
  */
object TemporalJoins {

  /** As-of join: for each left row, the single latest right row of the
    * same `key` with right.`rightTime` ≤ left.`leftTime` (inner: left
    * rows with no such right row are dropped; pass `tolerance` to also
    * bound left.t − right.t). Right columns appear prefixed with
    * `rightPrefix`.
    *
    * Determinism: callers must make (key, rightTime) unique on the
    * right side (pre-aggregate duplicates), the usual as-of contract —
    * otherwise "the" latest row at a tied timestamp is not defined.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPrefix: String = "r_",
               tolerance: Option[Column] = None): DataFrame = {
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val l = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"), struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val r = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"), lit(null).cast(lType).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))
    // at equal times the right row sorts first (side 0 < 1), so a
    // right row exactly at left.t matches — "≤" semantics
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionAll(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
    val bounded = tolerance.fold(matched)(tol =>
      matched.filter(col("__t") - col(s"__m.$rightTime") <= tol))
    bounded.select(
      left.columns.map(c => col(s"__l.$c").as(c)) ++
        right.columns.map(c => col(s"__m.$c").as(s"$rightPrefix$c")): _*)
  }

  /** Nearest-neighbor as-of join: each left row matched to the
    * CLOSEST right row of the same key within `tolerance` (ns/units
    * of the time columns) — the sensor-fusion variant of [[asofJoin]]
    * (backward-only "latest ≤ t" misses a reading 1 ms in the future
    * when the previous one is minutes stale). Ties (equidistant
    * backward/forward) resolve BACKWARD, so the operator degrades to
    * plain as-of semantics as tolerance shrinks. Same tagged-union
    * shape as [[asofJoin]]: the backward (last right ≤ t) and forward
    * (first right ≥ t) candidates come from two window functions over
    * the SAME (key; time, side) sort — one shuffle for the whole
    * operator, no join, and the pick is row-local. Same determinism
    * contract: (key, rightTime) must be unique on the right. */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTime: String, rightTime: String,
                  tolerance: Column,
                  rightPrefix: String = "r_"): DataFrame = {
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val l = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"), struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val r = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"), lit(null).cast(lType).as("__l"),
      struct(right.columns.map(col): _*).as("__r"))
    // right rows at equal time sort first (side 0 < 1): they land in
    // the BACKWARD frame at distance 0 and win any tie
    val ord = Seq(col("__t"), col("__side"))
    val wB = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val db = col("__t") - col(s"__b.$rightTime")
    val df = col(s"__f.$rightTime") - col("__t")
    val picked = l.unionAll(r)
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__r"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
      .withColumn("__n",
        when(col("__f").isNull ||
          (col("__b").isNotNull && db <= df), col("__b"))
          .otherwise(col("__f")))
      .filter(col("__n").isNotNull &&
        abs(col("__t") - col(s"__n.$rightTime")) <= tolerance)
    picked.select(
      left.columns.map(c => col(s"__l.$c").as(c)) ++
        right.columns.map(c => col(s"__n.$c").as(s"$rightPrefix$c")): _*)
  }

  /** Point-in-interval join: rows of `points` matched to every row of
    * `intervals` with lo ≤ p < hi (half-open). Interval columns appear
    * prefixed with `intervalPrefix`. `binWidth` should be on the order
    * of the typical interval length: each interval lands in
    * ⌈len/binWidth⌉+1 bins, each point in exactly one, and the join is
    * an equi-join on the bin id. Intervals may overlap freely (the
    * case a width_bucket/aligned-window rewrite cannot express). */
  def rangeJoinBinned(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double,
                      intervalPrefix: String = "i_"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / lit(binWidth)).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / lit(binWidth)).cast("long"),
        floor(col(hiCol) / lit(binWidth)).cast("long"))))
    val renamed = iv.select(col("__bin") +:
      intervals.columns.map(c => col(c).as(s"$intervalPrefix$c")): _*)
    p.join(renamed, Seq("__bin"))
      .filter(col(pointCol) >= col(s"$intervalPrefix$loCol") &&
        col(pointCol) < col(s"$intervalPrefix$hiCol"))
      .drop("__bin")
  }
}
