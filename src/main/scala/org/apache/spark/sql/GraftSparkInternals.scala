package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Narrow bridge into Spark's `private[sql]` surface (the standard
  * ecosystem-library technique — Delta/Sedona ship the same kind of
  * shim): wrap an already-materialized `InternalRow` RDD as a fresh
  * DataFrame with NO origin metadata.
  *
  * Why it exists: `Dataset.localCheckpoint` preserves the origin
  * plan's constraints and attribute ids in its `LogicalRDD`. For an
  * iterative fixpoint (Engine.buildRecursiveCte) whose step projects
  * a scanned column verbatim, successive checkpointed legs then share
  * attribute ids and carry constraints referencing attributes outside
  * their own output — `Union.rewriteConstraints` faults on exactly
  * that (key-not-found, reproduced by DeepRecursionSpec's 999-round
  * ring). Wrapping the checkpointed bytes through
  * `internalCreateDataFrame` drops the poisoned metadata at zero row
  * cost; the public `createDataFrame(RDD[Row], schema)` alternative
  * would round-trip every row through external `Row` objects on every
  * downstream scan. */
object GraftSparkInternals {
  def wrapInternal(spark: classic.SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.internalCreateDataFrame(rdd, schema, isStreaming = false)
}
