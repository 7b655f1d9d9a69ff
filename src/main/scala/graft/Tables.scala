package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")

  /** events with `ts` (ns long) plus a derived µs TimestampType column
    * `ts_utc` for window/partition-pruning use. */
  def eventsWithTime(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    events(s, d).withColumn("ts_utc",
      graft.functions.NowFunctions.stampToTs(col("ts")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (used by the SQL front-end and
    * ad-hoc `spark.sql` queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
