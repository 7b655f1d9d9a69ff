package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property checks for the round-10 operators: the oracle gate proves
  * cross-engine equality; these prove the MATH holds — the Bloom
  * filter's no-false-negative law, the rank-based quantiles against
  * Spark's own window formulation, chunk arithmetic against the
  * closed form, and the Spearman matrix against an independent
  * window-rank recompute. */
class Round10OpsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sfDir

  test("q329 Bloom prefilter: no false negatives, consistent counts") {
    val r = SparkEntry.queries("q329_bloom_prefilter")(spark, sf)
      .collect()(0)
    val nBloom = r.getAs[Long]("n_bloom_hits")
    val nTrue = r.getAs[Long]("n_true_hits")
    val nFp = r.getAs[Long]("n_false_pos")
    // a Bloom filter may lie positive, NEVER negative: every exact
    // member must be a bloom hit, so hits = members + false positives
    assert(nBloom == nTrue + nFp,
      s"false negative detected: bloom=$nBloom true=$nTrue fp=$nFp")
    assert(r.getAs[Long]("n_probes") > 0 && nTrue > 0,
      "degenerate corpus: the audit must actually probe members")
  }

  test("q328 exact per-source quantiles match the window formulation") {
    val got = SparkEntry.queries("q328_source_quantiles")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long](3))
      .toMap
    // independent recompute: per-source window ranks (fine at test
    // scale; the operator exists precisely to avoid this at 100 TB)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("v").asc, col("doc_id").asc)
    val ranked = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long").as("v"),
        col("doc_id"))
      .withColumn("lrk", row_number().over(w).cast("long"))
      .withColumn("ns", count(lit(1))
        .over(Window.partitionBy(col("source"))).cast("long"))
    val expect = Seq(50L, 90L, 99L).toDF("p")
      .crossJoin(ranked)
      .filter(col("lrk") === expr("((ns - 1) * p) DIV 100") + 1L)
      .collect()
      .map(r => (r.getString(1), r.getLong(0)) -> r.getLong(2))
      .toMap
    assert(got == expect)
    assert(got.nonEmpty && got.keySet.map(_._2) == Set(50L, 90L, 99L))
  }

  test("q325 chunk counts equal the closed form ((nw-1) DIV 48) + 1") {
    val got = SparkEntry.queries("q325_chunk_stats")(spark, sf)
      .agg(sum("n_chunks"), sum("toks_unique")).collect()(0)
    val base = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("nw"))
      .agg(sum(expr("((nw - 1) DIV 48) + 1")), sum(col("nw")))
      .collect()(0)
    assert(got.getLong(0) == base.getLong(0), "chunk count closed form")
    assert(got.getLong(1) == base.getLong(1), "unique tokens = Σ nw")
  }

  test("q330 repetition profile: shares in [1/nw, 1], fails bounded") {
    val rows = SparkEntry.queries("q330_repetition_profile")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_docs")
      val t1 = r.getAs[Double]("mean_top1_frac")
      val t2 = r.getAs[Double]("mean_top2_frac")
      assert(t1 > 0.0 && t1 <= 1.0 && t2 >= 0.0 && t2 <= 1.0)
      assert(r.getAs[Long]("n_fail_top1") <= nd
        && r.getAs[Long]("n_fail_top2") <= nd)
    }
  }

  test("q331 Spearman matrix matches an independent window-rank " +
    "recompute for the (n_words, n_chars) pair") {
    val row = SparkEntry.queries("q331_feature_spearman")(spark, sf)
      .filter(col("feat_a") === 1L && col("feat_b") === 2L)
      .collect()(0)
    val base = Tables.documents(spark, sf).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("a"),
      length(col("text")).cast("long").as("b"))
    def rk(c: String) = row_number()
      .over(Window.orderBy(col(c).asc, col("doc_id").asc))
      .cast("long")
    val d2 = base.withColumn("ra", rk("a")).withColumn("rb", rk("b"))
      .select(((col("ra") - col("rb")) * (col("ra") - col("rb")))
        .as("d2"))
      .agg(count(lit(1)), sum(col("d2"))).collect()(0)
    val n = d2.getLong(0).toDouble
    val rho = 1.0 - 6.0 * d2.getLong(1).toDouble / (n * (n * n - 1.0))
    assert(row.getAs[Long]("n") == d2.getLong(0))
    assert(math.abs(row.getAs[Double]("spearman_rho")
      - math.rint(rho * 1e6) / 1e6) < 1e-9)
  }

  test("q333 z-order: Morton code bijective vs a bit-string reference; " +
    "layout invariants hold") {
    // independent Morton reference: interleave via bit strings
    def morton(x: Long, y: Long): Long =
      (0 until 10).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    def demorton(z: Long): (Long, Long) = {
      val x = (0 until 10).map(i => ((z >> (2 * i)) & 1L) << i)
        .reduce(_ | _)
      val y = (0 until 10).map(i => ((z >> (2 * i + 1)) & 1L) << i)
        .reduce(_ | _)
      (x, y)
    }
    val rnd = new scala.util.Random(7)
    (0 until 1000).foreach { _ =>
      val (x, y) = (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)
      assert(demorton(morton(x, y)) == ((x, y)), s"bijection at ($x,$y)")
    }
    val rows = SparkEntry.queries("q333_zorder_layout")(spark, sf)
      .collect().map(r => r.getAs[Long]("layout") -> r).toMap
    assert(rows.keySet == Set(0L, 1L))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_files") == 64L)
      val vol = r.getAs[Long]("total_volume")
      val sx = r.getAs[Long]("sum_span_x")
      val sy = r.getAs[Long]("sum_span_y")
      // per-file 1 ≤ span ≤ 1024 ⇒ bounds on sums and volume
      assert(sx >= 64L && sx <= 64L * 1024 && sy >= 64L && sy <= 64L * 1024)
      assert(vol >= 64L && vol <= 64L * 1024L * 1024L)
    }
    // the curve's raison d'être: bounded volume vs the linear layout
    // (x-major sort leaves y zone maps near-useless on this data)
    assert(rows(0L).getAs[Long]("total_volume")
      < rows(1L).getAs[Long]("total_volume"),
      "z-order must beat linear sort on 2-D zone-map volume")
  }

  test("q334 Neyman allocation minimizes the stratified estimator " +
    "variance vs proportional") {
    val rows = SparkEntry.queries("q334_neyman_allocation")(spark, sf)
      .collect()
    assert(rows.length > 1)
    def varOf(alloc: String): Double = rows.map { r =>
      val nh = r.getAs[Long]("n_docs").toDouble
      val s = r.getAs[Double]("sd_chars")
      val a = r.getAs[Double](alloc)
      nh * nh * s * s / a
    }.sum
    // both allocations spend the same 1000-doc budget (to rounding)
    Seq("alloc_prop", "alloc_neyman").foreach { c =>
      val tot = rows.map(_.getAs[Double](c)).sum
      assert(math.abs(tot - 1000.0) < 0.01, s"$c sums to $tot")
    }
    assert(varOf("alloc_neyman") <= varOf("alloc_prop") * (1 + 1e-9),
      "Neyman is the variance-minimizing allocation")
  }

  test("q327 interleave audit: adjacency count is N-1 consistent " +
    "and the ratio is the quotient of its own columns") {
    val r = SparkEntry.queries("q327_interleave_audit")(spark, sf)
      .collect()(0)
    val n = r.getAs[Long]("n_docs")
    val same = r.getAs[Long]("n_same_adjacent")
    assert(n > 1 && same >= 0 && same <= n - 1)
    val exp = r.getAs[Double]("expected_random")
    assert(exp > 0.0, "expectation must be positive on a mixed corpus")
  }

  test("q335 posting compression: bit-cost bounds and self-consistent " +
    "byte arithmetic") {
    val rows = SparkEntry.queries("q335_posting_compression")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      val bits = r.getAs[Long]("bits")
      // every posting costs at least 1 and at most 41 bits (the
      // widthOf fold probes exponents 0..40)
      assert(bits >= df && bits <= df * 41L,
        s"bit cost out of range: df=$df bits=$bits")
      assert(r.getAs[Long]("delta_bytes") == (bits + 7L) / 8L)
      assert(r.getAs[Long]("raw_bytes") == df * 8L)
    }
    // frequent terms must actually compress (deltas are small)
    assert(rows.head.getAs[Double]("compression_ratio") > 1.0)
  }

  test("q336 encoding advisor: runs dominate distincts and the advice " +
    "matches its own rule") {
    val rows = SparkEntry.queries("q336_encoding_advisor")(spark, sf)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val nd = r.getAs[Long]("n_distinct")
      val runs = r.getAs[Long]("n_runs")
      // each distinct value opens at least one run; runs never exceed
      // the row count
      assert(nd <= runs && runs <= n, s"$nd <= $runs <= $n")
      val want =
        if (runs * 4L <= n) "rle"
        else if (nd * 100L <= n) "dict"
        else "plain"
      assert(r.getAs[String]("advice") == want)
    }
  }

  test("q337 table checksum: order-free (matches a group-then-merge " +
    "recompute) and sensitive to a dropped row") {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val m61 = BigInt("2305843009213693951")
    val got = SparkEntry.queries("q337_table_checksum")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent recompute: partial sums per (doc_id % 7) bucket,
    // then merged — equality proves the fingerprint is commutative
    def leg(c: Column) = coalesce(c.cast("string"), lit("∅"))
    val h = operators.Dedup.md5Hash60(concat_ws("|",
      leg(col("doc_id")), leg(col("lang")), leg(col("source")),
      leg(col("n_chars"))))
    val parts = Tables.documents(spark, sf)
      .groupBy(pmod(col("doc_id"), lit(7)))
      .agg(count(lit(1)).as("n"), sum(h.cast(dec38)).as("s"))
      .agg(sum(col("n")).cast("long"), sum(col("s")).cast(dec38))
      .collect()(0)
    assert(parts.getLong(0) == got("documents")._1)
    assert((BigInt(parts.getDecimal(1).toBigInteger) mod m61)
      .toLong == got("documents")._2)
    // drop one row => both the count and the sum must move
    val drop = Tables.documents(spark, sf)
      .filter(col("doc_id") =!= lit(0L))
      .agg(sum(h.cast(dec38)).as("s")).collect()(0)
    assert((BigInt(drop.getDecimal(0).toBigInteger) mod m61).toLong
      != got("documents")._2)
  }

  test("q349 bucket diff: exactly the changed buckets, exact deltas") {
    val rows = SparkEntry.queries("q349_bucket_diff")(spark, sf)
      .collect()
    val ids = Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    // expected differing buckets: those holding a dropped (%97) or
    // touched (%101, surviving) doc
    val expect = ids.filter(i => i % 97 == 0 ||
      (i % 101 == 0 && i % 97 != 0)).map(_ % 64).toSet
    assert(rows.map(_.getAs[Long]("bucket")).toSet == expect)
    // total row delta = -(number of dropped docs)
    assert(rows.map(_.getAs[Long]("delta_rows")).sum
      == -ids.count(_ % 97 == 0).toLong)
    // content_drift flags exactly the equal-count buckets
    rows.foreach { r =>
      assert(r.getAs[Boolean]("content_drift")
        == (r.getAs[Long]("n_v1") == r.getAs[Long]("n_v2")))
    }
  }

  test("q338 SCD2: one open version per user, events conserved, " +
    "version count = 1 + changes") {
    val rows = SparkEntry.queries("q338_scd2_dimension")(spark, sf)
      .collect()
    val ev = Tables.events(spark, sf)
    val nUsers = ev.select(col("user_id")).distinct().count()
    val nEvents = ev.count()
    assert(rows.map(_.getAs[Long]("n_current")).sum == nUsers,
      "exactly one current version per user")
    assert(rows.map(_.getAs[Long]("n_events")).sum == nEvents,
      "every event lands in exactly one version")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_versions") >= r.getAs[Long]("n_current"))
      assert(r.getAs[Long]("dwell_us") >= 0L)
    }
    // independent change count: lag over the same per-user order
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val changes = ev
      .withColumn("p", lag(col("event_type"), 1).over(w))
      .filter(col("p").isNotNull && col("p") =!= col("event_type"))
      .count()
    assert(rows.map(_.getAs[Long]("n_versions")).sum
      == nUsers + changes)
  }
}
