package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the 100 TB regime.
  *
  * AQE already splits skewed SHUFFLE partitions for joins
  * (`spark.sql.adaptive.skewJoin`), but aggregations over a hot key
  * and joins against a skewed build side still bottleneck one task.
  * These helpers implement the classic salting patterns:
  *  - two-phase aggregation: map each row to (key, salt) — partial
  *    aggregates spread over `salts` tasks — then reduce the salted
  *    partials. Works for any algebraic aggregate (sum/count/min/max).
  *  - salted join: replicate the small side `salts` times so the big
  *    side's salted keys all find their match.
  */
object Skew {

  private def salt(salts: Int): Column =
    pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts))

  /** Two-phase salted sum+count per key: no single reducer sees a hot
    * key's full row set. Output: key, sum_<valueCol>, n. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int = 16): DataFrame =
    df.withColumn("_salt", salt(salts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_ps"), count(lit(1)).as("_pn"))
      .groupBy(col(key))
      .agg(sum(col("_ps")).as(s"sum_$valueCol"), sum(col("_pn")).as("n"))

  /** Salted equi-join for a skewed probe side: the small `dim` side is
    * replicated once per salt so every salted fact key joins locally.
    * Equivalent rows to `fact.join(dim, fact(k)===dim(k))`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", salt(salts))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedFact.join(explodedDim,
      saltedFact(factKey) === explodedDim(dimKey)
        && saltedFact("_salt") === explodedDim("_salt"))
      .drop("_salt")
  }
}
