package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property checks for the statistics/privacy batch (q351–q357): the
  * oracle gate proves cross-engine equality; these prove the MATH —
  * each statistic against an independent window-rank or driver-side
  * recompute (fine at test scale; the operators exist precisely to
  * avoid these shapes at 100 TB), plus the analytic range laws. */
class StatsOpsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sfDir

  private def docLens() = Tables.documents(spark, sf)
    .select(col("lang"), col("source"), col("n_chars").cast("long").as("v"))
    .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  test("q351 Kruskal-Wallis matches a driver midrank recompute") {
    val r = SparkEntry.queries("q351_kruskal_wallis")(spark, sf)
      .collect()(0)
    val h = r.getAs[Double]("h")
    val rows = docLens()
    val n = rows.length
    // midranks via sorting; groups by lang
    val ranked = rows.map(_._3).sorted.zipWithIndex
      .groupBy(_._1).map { case (v, xs) =>
        v -> xs.map(_._2 + 1.0).sum / xs.length }
    val byLang = rows.groupBy(_._1)
    val t = byLang.map { case (_, xs) =>
      val ri = xs.map(x => ranked(x._3)).sum
      ri * ri / xs.length }.sum
    val tieSum = rows.map(_._3).groupBy(identity)
      .map { case (_, xs) => math.pow(xs.length, 3) - xs.length }.sum
    val hRef = (12.0 / (n.toDouble * (n + 1)) * t - 3.0 * (n + 1)) /
      (1.0 - tieSum / (math.pow(n, 3) - n))
    assert(math.abs(h - hRef) < 1e-3, s"h=$h ref=$hRef")
    assert(r.getAs[Long]("k_groups") == byLang.size)
    assert(h >= 0.0)
  }

  test("q352 Cliff's delta matches exact pair counting; range law") {
    val r = SparkEntry.queries("q352_cliffs_delta")(spark, sf)
      .collect()(0)
    val delta = r.getAs[Double]("delta")
    val rows = docLens().filter(x => x._2 == "src0" || x._2 == "src1")
    val a = rows.filter(_._2 == "src0").map(_._3)
    val b = rows.filter(_._2 == "src1").map(_._3)
    val gt = (for (x <- a; y <- b) yield if (x > y) 1L else 0L).sum
    val lt = (for (x <- a; y <- b) yield if (x < y) 1L else 0L).sum
    val ref = (gt - lt).toDouble / (a.length.toLong * b.length)
    assert(math.abs(delta - ref) < 1e-5, s"delta=$delta ref=$ref")
    assert(delta >= -1.0 && delta <= 1.0)
    assert(r.getAs[Long]("n1") == a.length && r.getAs[Long]("n2") == b.length)
  }

  test("q353 t-closeness TV matches driver recompute; TV in [0,1]") {
    val out = SparkEntry.queries("q353_t_closeness")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("tv"))).toMap
    val rows = docLens()
    val n = rows.length.toDouble
    val langTotals = rows.groupBy(_._1).map { case (l, xs) => l -> xs.length }
    out.foreach { case (src, (ndocs, tv)) =>
      val grp = rows.filter(_._2 == src)
      assert(grp.length == ndocs)
      val ref = langTotals.map { case (l, nl) =>
        math.abs(grp.count(_._1 == l) / grp.length.toDouble - nl / n)
      }.sum / 2.0
      assert(math.abs(tv - ref) < 1e-5, s"$src tv=$tv ref=$ref")
      assert(tv >= 0.0 && tv <= 1.0)
    }
    assert(out.nonEmpty)
  }

  test("q354 clustering coefficient: per-vertex triangles sum to 3T") {
    val out = SparkEntry.queries("q354_clustering_coeff")(spark, sf)
      .collect()
    // independent: triangles of the same top-2000 edge set recomputed
    // on the driver from the q196-family edge definition
    val edges = operators.Graph.commonNeighborPairs(
        Tables.lineitem(spark, sf),
        "l_orderkey", "l_suppkey", 2L)
      .orderBy(col("shared").desc, col("d_a").asc, col("d_b").asc)
      .limit(2000)
      .select(col("d_a").cast("long"), col("d_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val eset = edges.toSet
    val nbrs = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    // each triangle has 3 edges; each edge's endpoints' common
    // neighbors count it once -> sum over edges / 3 = T
    val triSum = out.map(_.getAs[Long]("n_tri")).sum
    val tFromEdges = edges.map { case (a, b) =>
      (nbrs(a) & nbrs(b)).size.toLong }.sum / 3L
    assert(triSum == 3L * tFromEdges, s"sum=$triSum 3T=${3L * tFromEdges}")
    out.foreach { r =>
      val c = r.getAs[Double]("clustering")
      assert(c >= 0.0 && c <= 1.0)
      val deg = r.getAs[Long]("deg")
      val tri = r.getAs[Long]("n_tri")
      assert(tri <= deg * (deg - 1) / 2)
    }
  }

  test("q355 readability: syllable heuristic and identities") {
    // the vowel-group heuristic on known words
    def syl(w: String): Long = math.max(1,
      "[aeiou]+".r.findAllIn(w).length)
    assert(syl("table") == 2 && syl("a") == 1 && syl("zq0") == 1 &&
      syl("window") == 2 && syl("aggregate") == 4)
    val out = SparkEntry.queries("q355_readability")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("source"), lower(col("text"))).collect()
      .map(r => (r.getString(0), r.getString(1)))
    out.foreach { r =>
      val src = r.getString(0)
      val mine = docs.filter(_._1 == src)
      assert(r.getAs[Long]("n_docs") == mine.length)
      val w = mine.map(_._2.split(" ", -1).length.toLong).sum
      assert(r.getAs[Long]("n_words") == w)
      val sy = mine.map(_._2.split(" ", -1).map(syl).sum).sum
      assert(r.getAs[Long]("n_syllables") == sy)
      // sentence-less synthetic corpus: sen = 1 per doc
      assert(r.getAs[Long]("n_sentences") == mine.length)
    }
  }

  test("q356 Hellinger: range law and driver recompute") {
    val out = SparkEntry.queries("q356_hellinger_sources")(spark, sf)
      .collect()
    val rows = Tables.documents(spark, sf)
      .select(col("source"), expr("CAST(n_chars AS BIGINT) DIV 100"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length.toDouble
    val corpus = rows.groupBy(_._2).map { case (b, xs) => b -> xs.length }
    out.foreach { r =>
      val src = r.getString(0)
      val h = r.getAs[Double]("hellinger")
      assert(h >= 0.0 && h <= 1.0)
      val grp = rows.filter(_._1 == src)
      val bc = corpus.map { case (b, nb) =>
        math.sqrt(grp.count(_._2 == b) / grp.length.toDouble * nb / n)
      }.sum
      val ref = math.sqrt(math.max(0.0, 1.0 - bc))
      assert(math.abs(h - ref) < 1e-4, s"$src h=$h ref=$ref")
    }
  }

  test("q358 ANOVA F matches a driver recompute; identities hold") {
    val r = SparkEntry.queries("q358_anova_f")(spark, sf).collect()(0)
    val rows = docLens()
    val groups = rows.groupBy(_._1).values.map(_.map(_._3.toDouble)).toSeq
    val n = rows.length; val k = groups.length
    val mean = rows.map(_._3.toDouble).sum / n
    val ssb = groups.map(g =>
      g.length * math.pow(g.sum / g.length - mean, 2)).sum
    val ssw = groups.map(g => { val m = g.sum / g.length
      g.map(x => math.pow(x - m, 2)).sum }).sum
    val fRef = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(r.getAs[Double]("f") - fRef) < 1e-2,
      s"f=${r.getAs[Double]("f")} ref=$fRef")
    assert(math.abs(r.getAs[Double]("eta2") - ssb / (ssb + ssw)) < 1e-4)
    assert(r.getAs[Double]("ss_between") >= 0.0 &&
      r.getAs[Double]("ss_within") >= 0.0)
  }

  test("q359 Mood's median matches a driver recompute") {
    val r = SparkEntry.queries("q359_mood_median")(spark, sf)
      .collect()(0)
    val rows = docLens()
    val sorted = rows.map(_._3.toDouble).sorted
    val med = if (sorted.length % 2 == 1) sorted(sorted.length / 2)
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
    val n = rows.length.toDouble
    val a = rows.count(_._3 > med).toDouble
    val chiRef = rows.groupBy(_._1).map { case (_, xs) =>
      val ng = xs.length.toDouble
      val ag = xs.count(_._3 > med).toDouble
      val e1 = ng * a / n; val e2 = ng * (n - a) / n
      math.pow(ag - e1, 2) / e1 + math.pow(ng - ag - e2, 2) / e2
    }.sum
    assert(math.abs(r.getAs[Double]("chi2") - chiRef) < 1e-3,
      s"chi2=${r.getAs[Double]("chi2")} ref=$chiRef")
    assert(r.getAs[Double]("chi2") >= 0.0)
  }

  test("q360 Gini matches the O(n^2) mean-difference recompute") {
    val out = SparkEntry.queries("q360_length_gini")(spark, sf)
      .collect()
    val rows = docLens()
    out.foreach { r =>
      val src = r.getString(0)
      val xs = rows.filter(_._2 == src).map(_._3.toDouble)
      val s = xs.sum
      val diff = (for (x <- xs; y <- xs) yield math.abs(x - y)).sum
      val ref = diff / (2.0 * xs.length * s)
      val g = r.getAs[Double]("gini")
      assert(math.abs(g - ref) < 1e-5, s"$src gini=$g ref=$ref")
      assert(g >= 0.0 && g < 1.0)
    }
    assert(out.nonEmpty)
  }

  test("q361 Theil matches a driver recompute; zero iff equal") {
    val out = SparkEntry.queries("q361_theil_index")(spark, sf)
      .collect()
    val rows = docLens()
    out.foreach { r =>
      val src = r.getString(0)
      val xs = rows.filter(_._2 == src).map(_._3.toDouble)
      val mu = xs.sum / xs.length
      val ref = xs.map(x => x / mu * math.log(x / mu)).sum / xs.length
      val t = r.getAs[Double]("theil_t")
      assert(math.abs(t - ref) < 1e-4, s"$src theil=$t ref=$ref")
      assert(t >= -1e-9) // Theil T is non-negative (Jensen)
    }
    assert(out.nonEmpty)
  }

  test("q364 worst-group eval: accuracy identities and worst flag") {
    val out = SparkEntry.queries("q364_worst_group_eval")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val nt = out.map(_.getAs[Long]("n_docs")).sum
    val ct = out.map(_.getAs[Long]("n_correct")).sum
    val overall = out.map(_.getAs[Double]("overall_accuracy")).distinct
    assert(overall.length == 1 &&
      math.abs(overall(0) - ct.toDouble / nt) < 1e-6)
    val minAcc = out.map(_.getAs[Double]("accuracy")).min
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_worst_group") ==
        (r.getAs[Double]("accuracy") == minAcc))
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_docs"))
    }
    // the planted task is separable: every group should be perfect
    // once training converges (q193's curve ends at 0 mistakes)
    assert(out.forall(_.getAs[Double]("accuracy") == 1.0))
  }

  test("q365 Sinkhorn OT matches an unquantized driver recompute") {
    val r = SparkEntry.queries("q365_sinkhorn_ot")(spark, sf)
      .collect()(0)
    val cost = r.getAs[Double]("ot_cost")
    val mass = r.getAs[Double]("mass")
    assert(math.abs(mass - 1.0) < 1e-3, s"mass=$mass")
    // independent double-precision Sinkhorn on the same bounded sides
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(x => (x.getLong(0), x.getInt(1),
        x.getSeq[Float](2).map(_.toDouble).toArray))
    def sideOf(l: Int) = vecs.filter(_._2 == l).sortBy(_._1).take(30)
      .map(v => v._3.map(c => math.round(c * 1e6).toDouble / 1e6))
    val a = sideOf(0); val b = sideOf(1)
    val c = Array.tabulate(a.length, b.length)((i, j) =>
      a(i).zip(b(j)).map { case (x, y) => (x - y) * (x - y) }.sum)
    val cbar = c.flatten.sum / (a.length * b.length)
    val k = c.map(_.map(x => math.exp(-x / cbar)))
    var u = Array.fill(a.length)(1.0)
    var v = Array.fill(b.length)(1.0)
    for (_ <- 1 to 3) {
      u = Array.tabulate(a.length)(i =>
        1.0 / a.length / (0 until b.length).map(j => k(i)(j) * v(j)).sum)
      v = Array.tabulate(b.length)(j =>
        1.0 / b.length / (0 until a.length).map(i => k(i)(j) * u(i)).sum)
    }
    val ref = (for (i <- 0 until a.length; j <- 0 until b.length)
      yield u(i) * k(i)(j) * v(j) * c(i)(j)).sum
    assert(math.abs(cost - ref) < 0.01, s"ot=$cost ref=$ref")
    assert(cost > 0.0)
  }

  test("q366 silhouette: range law and assignment consistency") {
    val out = SparkEntry.queries("q366_silhouette")(spark, sf)
      .collect()
    assert(out.nonEmpty && out.length <= 16)
    out.foreach { r =>
      val sil = r.getAs[Double]("silhouette")
      assert(sil >= -1.0 && sil <= 1.0, s"silhouette out of range: $sil")
      assert(r.getAs[Long]("n_points") > 0)
    }
    // every vector is assigned exactly once
    val total = out.map(_.getAs[Long]("n_points")).sum
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(total == nVecs, s"assigned $total of $nVecs")
  }

  test("q357 Brown-Forsythe matches a driver recompute; W >= 0") {
    val r = SparkEntry.queries("q357_brown_forsythe")(spark, sf)
      .collect()(0)
    val w = r.getAs[Double]("bf_w")
    val rows = docLens()
    val groups = rows.groupBy(_._1).values.map(_.map(_._3.toDouble)).toSeq
    val k = groups.length
    val n = rows.length
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val zs = groups.map { g => val m = median(g); g.map(x => math.abs(x - m)) }
    val zbar = zs.flatten.sum / n
    val num = zs.map(g => g.length * math.pow(g.sum / g.length - zbar, 2)).sum
    val den = zs.map(g => { val m = g.sum / g.length
      g.map(x => math.pow(x - m, 2)).sum }).sum
    val ref = (n - k).toDouble / (k - 1) * num / den
    assert(math.abs(w - ref) < 1e-3, s"w=$w ref=$ref")
    assert(w >= 0.0)
    assert(r.getAs[Long]("k_groups") == k)
  }
}
