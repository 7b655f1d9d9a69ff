package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NowFunctions
import graft.operators.Similarity

/** Physical table layouts for the 100 TB deployment. Local runs and
  * the cluster share these writers/readers — only `path` changes.
  *
  * The reference prunes storage by time period per file
  * (store.h:172 getFiles(start,end), expr_period expr.c:1578-1631);
  * the lakehouse-native equivalent is hive-style date partitioning:
  * a stamp-range predicate becomes a PartitionFilter and unselected
  * days are never listed, let alone read.
  */
object Layouts {

  /** Write a stamped event table partitioned by UTC day. At 100 TB:
    * one directory per day, parquet row-group stats prune within the
    * day, `maxRecordsPerFile` caps file sizes. */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date",
        to_date(NowFunctions.stampToTs(col("ts"))))
      .repartition(col("event_date")) // one shuffle → one file per day
      .write.partitionBy("event_date")
      .option("maxRecordsPerFile", 10000000)
      .mode("overwrite").parquet(path)

  /** Read back with stamp-range pruning: the date predicate derived
    * from the ns range prunes partitions BEFORE any file is opened. */
  def readEventsRange(spark: SparkSession, path: String,
                      fromNs: Long, untilNs: Long): DataFrame = {
    val fromDate = java.time.Instant.ofEpochSecond(fromNs / 1000000000L)
      .toString.take(10)
    val untilDate = java.time.Instant.ofEpochSecond(untilNs / 1000000000L)
      .toString.take(10)
    spark.read.parquet(path)
      .filter(col("event_date") >= fromDate
        && col("event_date") <= untilDate // partition pruning
        && col("ts") >= fromNs && col("ts") < untilNs) // row-group stats
  }

  /** Save a table bucketed by a join key (hive-style bucketed parquet
    * via saveAsTable). Two tables bucketed the same way co-locate
    * matching keys, so their equi-join runs with NO exchange on either
    * side — at 100 TB this turns the recurring fact⋈fact join's
    * dominant shuffle into a bucket-local merge. `buckets` should be
    * sized so one bucket ≈ one task's memory (e.g. 4096 at 100 TB). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key: Catalyst
    * recognizes the matching output partitioning and plans a
    * SortMergeJoin with zero Exchange (LayoutsSpec asserts this). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Persist an IVF index layout: vectors partitioned by their coarse
    * centroid. A probe then touches nprobe/nlist of the data ON DISK —
    * the partition filter is the "inverted list" selection. */
  def writeIvf(emb: DataFrame, idCol: String, vecCol: String,
               nlist: Int, path: String): Unit = {
    val cents = Similarity.centroids(emb, idCol, vecCol, nlist)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    Similarity.ivfAssign(emb, idCol, vecCol, cents)
      .repartition(col("centroid_id"))
      .write.partitionBy("centroid_id")
      .mode("overwrite").parquet(s"$path/vectors")
  }

  /** Probe a persisted IVF layout: rank centroids against the query,
    * then scan only the nprobe matching partitions. */
  def searchIvf(spark: SparkSession, path: String, query: Seq[Double],
                nprobe: Int, k: Int): DataFrame = {
    import graft.functions.VectorOps._
    val cos = nativeCosine(spark)
    val q = typedlit(query)
    val probed = spark.read.parquet(s"$path/centroids")
      .select(col("centroid_id"), cos(col("cv"), q).as("csim"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
      .limit(nprobe).collect().map(_.getLong(0))
    spark.read.parquet(s"$path/vectors")
      .filter(col("centroid_id").isin(probed: _*)) // partition pruning
      .select(col("vec_id"),
        round(cos(col("v"), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  private def typedlit(v: Seq[Double]) =
    org.apache.spark.sql.functions.typedlit(v)
}
