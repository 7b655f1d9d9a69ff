package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Sketches

class SketchesSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("KMV is exact below k") {
    val df = (1 to 100).map(i => ("g", i.toLong)).toDF("g", "v")
    val got = Sketches.approxDistinctByKey(df, Seq("g"), "v", k = 256)
      .collect()(0).getDouble(1)
    assert(got == 100.0)
  }

  test("KMV estimates within 10% at 20x k") {
    val n = 5000
    val df = (1 to n).map(i => ("g", i.toLong)).toDF("g", "v")
    val got = Sketches.approxDistinctByKey(df, Seq("g"), "v", k = 256)
      .collect()(0).getDouble(1)
    assert(math.abs(got - n) / n < 0.10, s"estimate $got for $n")
  }

  test("KMV is deterministic across partitionings") {
    val vals = (1 to 3000).map(i => ("g", i.toLong))
    val a = Sketches.approxDistinctByKey(
      vals.toDF("g", "v").repartition(3), Seq("g"), "v").collect()(0).getDouble(1)
    val b = Sketches.approxDistinctByKey(
      vals.reverse.toDF("g", "v").repartition(17), Seq("g"), "v")
      .collect()(0).getDouble(1)
    assert(a == b)
  }

  test("sketch merge equals sketching the union") {
    val k = 64
    val sk = Sketches.kmvSketchAgg(spark, k)
    val left = (1 to 800).map(i => ("l", i.toLong)).toDF("g", "v")
    val right = (401 to 1200).map(i => ("r", i.toLong)).toDF("g", "v")
    val both = left.unionAll(right)
    val skL = left.agg(sk($"v").as("s")).collect()(0).getSeq[Long](0)
    val skR = right.agg(sk($"v").as("s")).collect()(0).getSeq[Long](0)
    val skU = both.agg(sk($"v").as("s")).collect()(0).getSeq[Long](0)
    val merged = spark.sql(s"SELECT 1").select(
      Sketches.kmvMerge(
        typedLit(skL.toArray), typedLit(skR.toArray), k).as("m"))
      .collect()(0).getSeq[Long](0)
    assert(merged == skU) // exact mergeability, not just close estimates
  }

  test("bottom-k quantile sample is order- and partition-independent") {
    val rows = (1 to 5000).map(i => ("g", i.toLong, (i * 37 % 1000).toDouble))
    val q = (df: org.apache.spark.sql.DataFrame) =>
      Sketches.approxQuantilesByKey(df, Seq("g"), "id", "v",
        Map("p50" -> 0.5, "p90" -> 0.9), k = 100).collect()(0)
    val a = q(rows.toDF("g", "id", "v").repartition(3))
    val b = q(rows.reverse.toDF("g", "id", "v").repartition(13))
    assert(a == b)
  }

  test("bottom-k quantile sample equals ORDER BY (h,v) LIMIT k") {
    val k = 50
    val rows = (1 to 2000).map(i => (i.toLong, (i % 321).toDouble))
    val df = rows.toDF("id", "v")
    val sk = Sketches.quantileSketchAgg(spark, k)
    val got = df.agg(sk($"id", $"v").as("s"))
      .collect()(0).getSeq[Double](0)
    val want = df.select(Sketches.sampleHash($"id").as("h"),
        $"v".cast("double").as("v"))
      .orderBy($"h", $"v").limit(k)
      .collect().map(_.getDouble(1)).sorted.toSeq
    assert(got == want)
  }

  test("quantile estimate tracks the exact percentile within sampling error") {
    // uniform values: p-quantile ≈ p * n; k=200 ⇒ σ ≈ 1/√200 ≈ 7%
    val n = 20000
    val rows = (1 to n).map(i => ("g", i.toLong, i.toDouble))
    val got = Sketches.approxQuantilesByKey(rows.toDF("g", "id", "v"),
      Seq("g"), "id", "v", Map("p50" -> 0.5, "p90" -> 0.9), k = 200)
      .collect()(0)
    assert(math.abs(got.getDouble(1) - 0.5 * n) / n < 0.15)
    assert(math.abs(got.getDouble(2) - 0.9 * n) / n < 0.15)
  }

  test("quantile sample below k is the whole group (exact percentiles)") {
    val rows = (1 to 101).map(i => ("g", i.toLong, i.toDouble))
    val got = Sketches.approxQuantilesByKey(rows.toDF("g", "id", "v"),
      Seq("g"), "id", "v", Map("p50" -> 0.5), k = 200).collect()(0)
    assert(got.getDouble(1) == 51.0) // exact interpolated median
  }

  test("Misra-Gries summary keeps every item above n/c (skewed zipf-ish data)") {
    // 3 heavy items (1000 each) buried in 5000 singletons; c = 50
    val rnd = new scala.util.Random(7)
    val items = rnd.shuffle(
      Seq.fill(1000)("hh1") ++ Seq.fill(1000)("hh2") ++
        Seq.fill(1000)("hh3") ++ (1 to 5000).map(i => s"tail$i"))
    val agg = new Sketches.MisraGriesAggregator(50)
    val sketch = items.foldLeft(agg.zero)(agg.reduce)
    assert(sketch.size <= 50)
    // n/c = 8000/50 = 160 < 1000 ⇒ heavies must survive, estimates
    // within n/c of truth
    Seq("hh1", "hh2", "hh3").foreach { h =>
      assert(sketch.contains(h), s"$h evicted")
      assert(sketch(h) <= 1000 && sketch(h) >= 1000 - 160)
    }
  }

  test("Misra-Gries merge preserves the guarantee across any split") {
    val rnd = new scala.util.Random(11)
    val items = rnd.shuffle(
      Seq.fill(600)("big") ++ (1 to 3000).map(i => s"t$i"))
    val agg = new Sketches.MisraGriesAggregator(40)
    // merge order 1: left-to-right over 7 uneven chunks
    val chunks = items.grouped(523).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val m1 = chunks.reduceLeft(agg.merge)
    // merge order 2: right-to-left
    val m2 = chunks.reverse.reduceLeft(agg.merge)
    // both orders keep the heavy item with bounded undercount
    assert(m1.size <= 40 && m2.size <= 40)
    assert(m1.contains("big") && m2.contains("big"))
    val bound = items.size / 40
    assert(m1("big") >= 600 - bound && m2("big") >= 600 - bound)
  }

  test("joinSizeEstimate is exact below k and tracks the true size above") {
    // domain (75 keys) below k=512: the sample is the whole domain, so
    // the estimate must equal the exact join size: keys 26..50 overlap,
    // each 1×2 ⇒ 50 rows
    val a = (1L to 50L).toDF("ka")
    val b = (26L to 75L).flatMap(x => Seq(x, x)).toDF("kb")
    val r = Sketches.joinSizeEstimate(a, "ka", b, "kb", k = 512).collect()(0)
    assert(r.getLong(0) == 50L && r.getLong(1) == 75L)
    assert(r.getDouble(2) == 50.0)
    // 20k-key full overlap, count 1×1: true size 20000; k=256 KMV
    // sampling error is O(1/√k) ≈ 6% σ — assert a generous 4σ band
    val big = (1L to 20000L).toDF("k")
    val est = Sketches.joinSizeEstimate(big, "k", big, "k", k = 256)
      .collect()(0).getDouble(2)
    assert(est > 15000 && est < 25000, s"est=$est")
    // empty inputs: the KMV sketch is an empty array; θ must go null
    // (not element_at(arr, 0), which throws) and the estimate degrade
    // to (0, 0, 0.0)
    val e = Sketches.joinSizeEstimate(
      a.filter("ka < 0"), "ka", b.filter("kb < 0"), "kb", k = 64)
      .collect()(0)
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L &&
      e.getDouble(2) == 0.0, e.toString)
  }

  test("exactHeavyHitters equals the brute-force count filter") {
    val rnd = new scala.util.Random(3)
    val words = rnd.shuffle(
      Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
        Seq.fill(90)("gamma") ++ (1 to 2000).map(i => s"w$i"))
    val df = words.toDF("w").repartition(7)
    val got = Sketches.exactHeavyHitters(df, "w",
      threshDenom = 20L, cap = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = words.size
    val exp = words.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > n / 20).toMap
    assert(got == exp) // exact despite the approximate candidate pass
  }
}
