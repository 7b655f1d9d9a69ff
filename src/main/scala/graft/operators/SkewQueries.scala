package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-mitigation coverage: the salted plans must produce EXACTLY the
  * rows of their unsalted equivalents — the DuckDB oracles compute the
  * plain GROUP BY / join, so any salting bug (lost salt partition,
  * double-counted dim row) hash-fails.
  *
  * l_quantity is integral-valued, so its double sum is exact and
  * order-independent — the salted two-phase reduce can't perturb it. */
object SkewQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // two-phase salted aggregation == plain aggregation
    "q78_salted_agg" -> ((s, d) =>
      Skew.saltedSumCount(Tables.lineitem(s, d), "l_suppkey",
        "l_quantity", salts = 16)),
    // salted replicated-dim join == plain join (then a small agg so
    // the result is a stable few-hundred-row frame)
    "q79_salted_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_quantity"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      Skew.saltedJoin(li, sup, "l_suppkey", "s_suppkey", salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q78_salted_agg" ->
      """SELECT l_suppkey, sum(l_quantity) AS sum_l_quantity,
        |  count(*) AS n
        | FROM lineitem GROUP BY l_suppkey""".stripMargin,
    "q79_salted_join" ->
      """SELECT s_nationkey, count(*) AS n, sum(l_quantity) AS sum_qty
        | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        | GROUP BY s_nationkey""".stripMargin
  )
}
