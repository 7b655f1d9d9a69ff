package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Compact a small-file parquet directory into ~`targetBytes` files
    * — the OPTIMIZE / bin-packing maintenance every streaming or
    * micro-batch ingestion needs: a sink writing every trigger leaves
    * thousands of KB-sized files per day, and at 100 TB the resulting
    * file-listing + task-per-file overhead dominates scan time long
    * before data volume does. Sizing comes from the actual on-disk
    * bytes (not a row-count guess, which misestimates wide/narrow
    * schemas); the rewrite is one round-robin repartition — no key
    * assumption, pure coalescing. Optionally `sortWithinBy` re-sorts
    * rows inside each output file so min/max row-group stats stay
    * selective after the merge (compaction that destroys clustering
    * trades one problem for another). Returns (files_before,
    * files_after, bytes). Atomicity at cluster scale comes from the
    * table format's commit protocol; here the rewrite lands in
    * `outPath` and the swap is the caller's rename. */
  def compactSmallFiles(spark: SparkSession, path: String,
                        outPath: String, targetBytes: Long,
                        sortWithinBy: Seq[String] = Nil): (Long, Long, Long) = {
    require(targetBytes > 0, s"targetBytes=$targetBytes must be positive")
    // RECURSIVE listing, matching what spark.read.parquet actually
    // loads — a top-level-only walk would report 0 bytes for a
    // hive-partitioned layout (date=*/part-*.parquet) and funnel the
    // whole table through one task
    import scala.jdk.CollectionConverters._
    // Files.walk holds directory handles open until the stream is
    // closed — materialize inside Using so repeated compactions don't
    // leak file descriptors
    val parts = scala.util.Using.resource(
      java.nio.file.Files.walk(java.nio.file.Paths.get(path))) { st =>
      st.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") &&
          java.nio.file.Files.isRegularFile(p))
        .toArray
    }
    val bytes = parts.map(java.nio.file.Files.size(_)).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    val df = spark.read.parquet(path)
    // plain bin-packing = round-robin; clustered compaction = range
    // repartition + in-partition sort, so output files own DISJOINT
    // key ranges (overlapping ranges would defeat min/max skipping)
    val packed =
      if (sortWithinBy.isEmpty) df.repartition(nOut.toInt)
      else df.repartitionByRange(nOut.toInt, sortWithinBy.map(col): _*)
        .sortWithinPartitions(sortWithinBy.map(col): _*)
    packed.write.mode("overwrite").parquet(outPath)
    val outParts = Option(new java.io.File(outPath).listFiles())
      .getOrElse(Array.empty)
      .count(f => f.getName.endsWith(".parquet") && f.isFile)
    (parts.length.toLong, outParts.toLong, bytes)
  }

  /** 16-bit Morton spread: insert a zero bit between every bit of the
    * low 16 bits (classic magic-number shifts — constant-folded,
    * codegen'd, no UDF). */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Z-order (Morton) two-column layout: quantize both key columns to
    * 16 bits over their min-max range, interleave the bits, then
    * range-partition + sort by the Z value. Every written file then
    * covers a NARROW rectangle in (a, b) space, so parquet row-group
    * min/max stats skip files for predicates on EITHER column — the
    * multi-dimensional generalization of the engine's CREATE INDEX
    * (range-repartition+sort), which only helps its leading column.
    * This is what OPTIMIZE ZORDER does in lakehouses, built from plain
    * codegen'd column ops. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    path: String, files: Int): Unit = {
    val r = df.agg(min(col(colA)), max(col(colA)),
      min(col(colB)), max(col(colB))).collect()(0)
    def quant(c: Column, lo: Double, hi: Double): Column =
      ((c.cast("double") - lit(lo)) / lit(math.max(hi - lo, 1e-300)) *
        lit(65535.0)).cast("long")
    def d(i: Int): Double = r.get(i) match {
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(s"non-numeric $other")
    }
    val z = spread16(quant(col(colA), d(0), d(1)))
      .bitwiseOR(shiftleft(spread16(quant(col(colB), d(2), d(3))), 1))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
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
    * the partition filter is the "inverted list" selection.
    * `refineIters > 0` runs deterministic Lloyd rounds
    * ([[Similarity.kmeansRefine]]) over the first-n seed before
    * partitioning — better-balanced cells at the cost of one corpus
    * pass per round. */
  def writeIvf(emb: DataFrame, idCol: String, vecCol: String,
               nlist: Int, path: String, refineIters: Int = 0): Unit = {
    val seed = Similarity.centroids(emb, idCol, vecCol, nlist)
    val cents =
      if (refineIters > 0)
        Similarity.kmeansRefine(emb, idCol, vecCol, seed, refineIters)
      else seed
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
