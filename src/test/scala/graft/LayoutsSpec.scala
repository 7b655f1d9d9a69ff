package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Layouts

/** Partition-pruning proofs for the 100 TB layouts: the plan must
  * show PartitionFilters (storage never listed), not just pushed
  * data filters. */
class LayoutsSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  test("date-partitioned events prune partitions on stamp ranges") {
    val dir = Files.createTempDirectory("events-by-day").toString
    Layouts.writeEventsByDay(Tables.events(spark, TestSpark.sfDir), dir)
    // 2024-01-10 .. 2024-01-12 in ns
    val lo = 1704844800000000000L
    val hi = 1705017600000000000L
    val df = Layouts.readEventsRange(spark, dir, lo, hi)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_date"), plan)
    // correctness: matches an unpartitioned range scan
    val expected = Tables.events(spark, TestSpark.sfDir)
      .filter(col("ts") >= lo && col("ts") < hi).count()
    assert(df.count() == expected)
  }

  test("persisted IVF probes read only nprobe centroid partitions") {
    val dir = Files.createTempDirectory("ivf").toString
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    Layouts.writeIvf(emb, "vec_id", "embedding", nlist = 8, dir)
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .collect()(0).getSeq[Float](0).map(_.toDouble)
    val res = Layouts.searchIvf(spark, dir, q, nprobe = 2, k = 5)
    val plan = res.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") &&
      plan.contains("centroid_id"), plan)
    val rows = res.collect()
    assert(rows.length == 5)
    assert(rows.head.getLong(0) == 0L) // the query vector is its own NN
  }

  test("z-order files cover narrow rectangles on BOTH key columns") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select(col("l_partkey"), col("l_suppkey"))
    val files = 8
    // per-file min-max width of a column, as a fraction of its global
    // range, averaged over files — the quantity row-group skipping
    // depends on
    def avgWidth(path: String, c: String): Double = {
      val df = spark.read.parquet(path)
      val Array(glo) = df.agg((max(col(c)) - min(col(c))).cast("double"))
        .collect().map(_.getDouble(0))
      val per = df.select(col(c), col("_metadata.file_path").as("f"))
        .groupBy("f").agg(((max(col(c)) - min(col(c))) / glo).as("w"))
        .agg(avg(col("w"))).collect()(0).getDouble(0)
      per
    }
    val zdir = Files.createTempDirectory("zorder").toString
    Layouts.writeZOrdered(li, "l_partkey", "l_suppkey", zdir, files)
    val sdir = Files.createTempDirectory("singlesort").toString
    li.repartitionByRange(files, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(sdir)
    // single-column sort: second column's per-file range stays global
    assert(avgWidth(sdir, "l_suppkey") > 0.9)
    // z-order: BOTH columns narrow per file
    assert(avgWidth(zdir, "l_partkey") < 0.6, s"partkey ${avgWidth(zdir, "l_partkey")}")
    assert(avgWidth(zdir, "l_suppkey") < 0.6, s"suppkey ${avgWidth(zdir, "l_suppkey")}")
  }

  test("compaction bin-packs small files and preserves data + stats") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("compact-src").toString
    val outDir = Files.createTempDirectory("compact-out").toString
    // simulate a micro-batch sink's damage: 64 tiny files
    val rows = (1L to 20000L).map(i => (i, i % 97, s"payload-$i"))
      .toDF("id", "k", "s")
    rows.repartition(64).write.mode("overwrite").parquet(srcDir)
    val srcFiles = new java.io.File(srcDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)
    assert(srcFiles.length == 64)
    val bytes = srcFiles.map(_.length()).sum
    val target = bytes / 4 // expect ~4-5 output files
    val (before, after, reported) =
      Layouts.compactSmallFiles(spark, srcDir, outDir, target,
        sortWithinBy = Seq("id"))
    assert(before == 64 && reported == bytes)
    assert(after <= 6, s"expected <=6 packed files, got $after")
    // data survives exactly
    val back = spark.read.parquet(outDir)
    assert(back.count() == 20000)
    assert(back.agg(sum(col("id"))).collect()(0).getLong(0)
      == (20000L * 20001L) / 2)
    // sortWithinBy keeps per-file min/max id ranges narrow: disjoint
    // non-overlapping ranges ⇒ row-group skipping stays selective
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2,
        s"file ranges overlap: $hi1 >= $lo2")
      case _ => ()
    }
  }

  test("same-bucketing tables join with zero exchange") {
    val orders = Tables.orders(spark, TestSpark.sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Layouts.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Layouts.writeBucketed(li, "b_lineitem", "o_orderkey", 4)
    // at toy scale the planner would broadcast (which bypasses
    // bucketing); disable it so the plan shows what a 100 TB
    // fact⋈fact join gets: SMJ over bucketed scans, no shuffle
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Layouts.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // and it is the same join
      assert(joined.count() == orders.join(li, "o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }
}
