package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet; filters and column pruning push down to
  * the scan (verify with `.explain("formatted")` → `PushedFilters`,
  * `ReadSchema`). At cluster scale the same loaders work over a
  * date-partitioned directory layout — nothing here assumes local mode.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) — Spark's TimestampType is
    // µs-only, so read nanos as a raw ns-since-epoch long. This matches
    // the engine's time model (SURVEY §7.3: stamp = LongType ns, the
    // reference stores int64 ns, types/time.h:27-37).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // timestamps WITHOUT the UTC-adjusted flag read as TimestampType
    // (stored µs = UTC epoch µs, no session-timezone math) — so
    // unix_micros() below is byte-identical to DuckDB's epoch_us()
    // on the same file, independent of the host timezone
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events with the repo-wide stamp contract: `ts` = ns-since-epoch
    * LongType (SURVEY §7.3 — the reference's int64-ns time model).
    * Early testdata generations shipped ts as parquet TIMESTAMP(NANOS)
    * (read as the long directly via nanosAsLong); current generations
    * ship µs TIMESTAMP. For the latter, wrapping the column in
    * `unix_micros(ts) * 1000` would satisfy the contract but strip
    * parquet predicate pushdown from EVERY period filter in the suite
    * (a filter over an arithmetic expression never reaches the scan) —
    * at 100 TB that is the difference between pruning a day and
    * scanning a decade. So the loader lands a ONE-TIME normalized
    * ns-long copy per sf dir (the bronze→silver landing step any
    * lakehouse ingestion performs) under java.io.tmpdir and reads
    * that: scans keep native long pushdown, every consumer keeps the
    * exact ns contract. Values are instant-identical to the source
    * (µs→ns is ×1000), so DuckDB oracles reading the ORIGINAL file
    * via epoch_us/epoch_ns agree bit-for-bit. Per-JVM directory ⇒ no
    * cross-process write races; ~1 s once per JVM at sf0.1. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ =>
        val key = java.nio.file.Paths.get(d).toAbsolutePath.toString
        val dest = normalizedEvents.computeIfAbsent(key, _ => {
          import java.nio.file.{Files, Paths, StandardCopyOption}
          // DETERMINISTIC landing path keyed by (dataset path, source
          // mtime, source size): reruns in fresh JVMs reuse the copy
          // instead of leaking a new one per run, and regenerating the
          // source parquet changes the fingerprint so the cache can
          // never serve stale data. Stale siblings (old fingerprints of
          // the same dataset) are swept on the way in.
          val src = Paths.get(d, "events.parquet")
          val fp =
            if (Files.isRegularFile(src))
              s"${Files.getLastModifiedTime(src).toMillis}-${Files.size(src)}"
            else "na"
          val stem = "graft-events-ns-" +
            Integer.toHexString(key.hashCode).reverse.padTo(8, '0').reverse
          val tmpRoot = Paths.get(
            System.getProperty("java.io.tmpdir", "/tmp"))
          val target = tmpRoot.resolve(s"$stem-$fp")
          Option(tmpRoot.toFile.listFiles()).getOrElse(Array.empty)
            .filter(f => f.isDirectory && f.getName.startsWith(stem + "-") &&
              f.getName != target.getFileName.toString)
            .foreach(deleteRecursively)
          // _SUCCESS gates reuse: a crashed half-write never satisfies
          // it, and the write-to-scratch + atomic-move publish means a
          // concurrent process either wins the move or adopts the
          // winner's copy — no process ever reads a directory mid-write
          if (!Files.exists(target.resolve("_SUCCESS"))) {
            deleteRecursively(target.toFile)
            val scratch = Files.createTempDirectory(tmpRoot, stem + "-wip-")
            import org.apache.spark.sql.functions._
            raw.withColumn("ts", unix_micros(col("ts")) * 1000L)
              .write.mode("overwrite").parquet(scratch.toString)
            try Files.move(scratch, target, StandardCopyOption.ATOMIC_MOVE)
            catch { case _: java.nio.file.FileSystemException =>
              deleteRecursively(scratch.toFile) // lost the race; theirs is complete
            }
          }
          target.toString
        })
        s.read.parquet(dest)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  private val normalizedEvents =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Parquet row groups are the atomic unit of scan parallelism —
    * a single-rowgroup file decodes on ONE core no matter how many
    * byte-range splits the scheduler cuts (the other splits read
    * nothing). Read (rowGroups, rows) once per path per JVM from the
    * footers (metadata-only read). Unknown/unreadable ⇒
    * (MaxValue, 0), i.e. "assume splittable", so [[fanout]] degrades
    * to a no-op. */
  private val layoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
  private def layoutOf(spark: SparkSession, path: String): (Int, Long) =
    layoutCache.computeIfAbsent(path, _ => {
      try {
        val conf = spark.sparkContext.hadoopConfiguration
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf)
        val files =
          if (fs.getFileStatus(p).isDirectory)
            fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
          else Array(fs.getFileStatus(p))
        files.map { f =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(f.getPath, conf))
          try (r.getRowGroups.size,
            r.getRowGroups.asScala.map(_.getRowCount).sum)
          finally r.close()
        }.foldLeft((0, 0L)) { case ((g, n), (g2, n2)) => (g + g2, n + n2) }
      } catch { case _: Throwable => (Int.MaxValue, 0L) }
    })

  /** Layout-aware post-scan rebalance (optimization guide §2.5: an
    * unsplittable input serializes the whole pipeline — "repartition
    * immediately after the read"). Wraps a frame whose downstream is
    * row-local compute-heavy (per-cell hashing, text features, codec
    * decode, vector math): when the source table's REAL scan
    * parallelism (row groups across its files) is below half the
    * cores, insert one round-robin exchange so the compute uses the
    * cluster; otherwise return the frame untouched. On a many-file /
    * many-rowgroup production layout this is a no-op — the gate is
    * measured from the data's own footers, not a local-mode constant.
    * Predicate pushdown and column pruning are unaffected (Catalyst
    * pushes filters/projections through Repartition), so call sites
    * project/filter FIRST and fan out the narrow survivors.
    *
    * r16 (verdict task 1): the fanout WIDTH is size-adaptive, not a
    * flat defaultParallelism — `ceil(rows / rowsPerTask)` clamped to
    * [2, cores], rows read from the same footers as the gate.
    * `rowsPerTask` is the call site's measured compute density (rows
    * one core chews through in ~100-200 ms): per-cell hash probes
    * default to 16384 (lineitem keeps its measured 32-wide win at
    * sf0.1, 600k rows; 100k-row events drops to 7 — the r15 driver
    * record showed the flat-32 events/orders fanouts 2.4× FASTER at 8
    * cores, i.e. over-wide); per-doc text/vector sites pass 64-256
    * (5k docs at sf0.1 still earn full width — q187 measured 6× from
    * it). Width grows with the data toward the core cap, so cluster
    * scale gets cluster width from the same formula.
    *
    * The gate+width read the files the frame ACTUALLY scans
    * (df.inputFiles — advice finding: the events loader may serve a
    * normalized ns-long copy whose layout differs from
    * `$d/events.parquet`); the (d, name) path is only the fallback
    * when a non-file-backed frame reports nothing. */
  def fanout(s: SparkSession, d: String, name: String, df: DataFrame,
             rowsPerTask: Long = 16384L): DataFrame = {
    val par = s.sparkContext.defaultParallelism
    val scanned =
      try df.inputFiles.toSeq catch { case _: Throwable => Nil }
    val paths = if (scanned.nonEmpty) scanned else Seq(s"$d/$name.parquet")
    val (rowGroups, rows) = paths.map(layoutOf(s, _))
      .foldLeft((0, 0L)) { case ((g, n), (g2, n2)) =>
        ((g.toLong + g2.toLong).min(Int.MaxValue).toInt, n + n2) }
    if (rowGroups >= math.max(2, par / 2)) df
    else {
      val rpt = math.max(1L, rowsPerTask)
      val width = math.max(2L,
        math.min(par.toLong, (rows + rpt - 1) / rpt)).toInt
      df.repartition(width)
    }
  }

  /** events with `ts` (ns long) plus a derived µs TimestampType column
    * `ts_utc` for window/partition-pruning use. */
  def eventsWithTime(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    events(s, d).withColumn("ts_utc",
      graft.functions.NowFunctions.stampToTs(col("ts")))
  }
  /** documents/embeddings are served RAW. A loader-level [[fanout]]
    * was tried in r15 and measured both ways on one box: single-pass
    * compute-heavy consumers won big (q187 2.5→0.4 s), but the many
    * multi-derivation pipelines (BM25 passes, LSH banding, span
    * families — 10–25 stage plans that re-derive the corpus several
    * times) LOST 1.5–2.5× each: at this corpus size the extra
    * exchange and the 32-task stages it forces on every downstream
    * derivation outweigh the decode parallelism. fanout is applied
    * per call site where a profile shows one dominating serialized
    * stage, never blanket. */
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (used by the SQL front-end and
    * ad-hoc `spark.sql` queries). events goes through [[events]] so the
    * view keeps the ns-long stamp contract. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
