package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Property checks for the round-9 statistical operators: the suite's
  * oracle gate proves cross-engine equality; these prove the MATH is
  * the advertised math on corpora where the answer is known in
  * closed form. */
class Round9OpsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("personalized PageRank: mass reaches only the seed's 3-hop " +
    "neighborhood and global rank order follows hop distance") {
    // path graph 0-1-2-3-4-5 (undirected), seed = 0, 3 iterations:
    // teleport replenishes only vertex 0; vertex 4 is 4 hops out so
    // after 3 iterations it must still hold rank 0, vertex 5 too.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("u", "v")
    val seeds = Seq(0L).toDF("u")
    val r = Graph.personalizedPageRankInt(edges, "u", "v", seeds, "u",
        iters = 3)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    // reachable-within-3-hops vertices hold mass (the walk oscillates
    // along a path, so hop order, not magnitude order, is the law)
    assert(r(0L) > 0L && r(1L) > 0L && r(2L) > 0L && r(3L) > 0L)
    assert(r(4L) == 0L && r(5L) == 0L,
      "mass cannot outrun the iteration count")
    // teleport-only-to-seed: total mass stays bounded by scale
    assert(r.values.sum <= 1000000000000L)
  }

  test("personalized PageRank with ALL vertices as seeds equals " +
    "global pageRankInt") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("u", "v")
    val allSeeds = edges.select(col("u")).distinct()
    val ppr = Graph.personalizedPageRankInt(edges, "u", "v",
        allSeeds, "u", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = Graph.pageRankInt(edges, "u", "v", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr == pr,
      "uniform teleport must reduce to the global walk")
  }

  test("Kaplan-Meier (the q292 shape): survival is non-increasing " +
    "and matches the closed form on a hand corpus") {
    // 4 subjects: deaths at day 1 and 2, censored at 2 and 3.
    // S(1) = 1 - 1/4 = 0.75; S(2) = 0.75 * (1 - 1/3) = 0.5;
    // S(3): at risk {censor-3}, no death -> stays 0.5.
    val life = Seq((1L, true), (2L, true), (2L, false), (3L, false))
      .toDF("dur", "died")
    val grid = life.select(col("dur").as("t")).distinct()
    val ar = life.join(broadcast(grid), col("dur") >= col("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n_risk"),
        sum(when(col("died") && col("dur") === col("t"), 1L)
          .otherwise(0L)).as("d"))
    val terms = ar.select(col("t"),
      round(log(greatest(col("n_risk") - col("d"), lit(1L))
          .cast("double") / col("n_risk").cast("double")) * 1e6)
        .cast("long").as("lm"))
    val s = terms.select(col("t").as("tt"))
      .join(broadcast(terms), col("t") <= col("tt"))
      .groupBy(col("tt")).agg(sum(col("lm")).as("cl"))
      .select(col("tt"), round(exp(col("cl").cast("double") / 1e6), 6)
        .as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(s(1L) - 0.75) < 1e-4)
    assert(math.abs(s(2L) - 0.5) < 1e-4)
    assert(math.abs(s(3L) - 0.5) < 1e-4)
    assert(s(1L) >= s(2L) && s(2L) >= s(3L))
  }

  test("greedy coverage gains are non-increasing (submodularity)") {
    val r = operators.CurationQueries
      .queries("q287_greedy_coverage")(spark, "/root/testdata/sf0.001")
      .orderBy(col("step"))
      .select(col("marginal_gain")).collect().map(_.getLong(0))
    assert(r.length >= 2)
    r.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b, s"gain grew: $a -> $b")
    }
  }

  test("Theil-Sen median slope shrugs off an outlier that drags OLS") {
    // 20 points on v = 2t (slope 2/unit) + one wild outlier.
    val base = (0 until 20).map(i => (i.toLong, 2.0 * i))
    val pts = (base :+ (20L, 1000.0)).toDF("t", "v")
    val h = pts.count() / 2
    val a = pts.select(col("t"), col("v"),
      (col("t") + lit(h)).as("pid"))
    val b = pts.select(col("t").as("pid"), col("v").as("v2"))
    val slopes = a.join(b, Seq("pid"))
      .select(((col("v2") - col("v"))
        / (col("pid") - col("t")).cast("double")).as("s"))
    val ts = slopes.agg(median(col("s"))).collect()(0).getDouble(0)
    assert(math.abs(ts - 2.0) < 0.2,
      s"median slope $ts should ignore the outlier")
    val ols = pts.agg(
      ((count(lit(1)) * sum(col("t") * col("v"))
        - sum(col("t")) * sum(col("v"))).cast("double")
        / (count(lit(1)) * sum(col("t") * col("t"))
          - sum(col("t")) * sum(col("t"))).cast("double")).as("b"))
      .collect()(0).getDouble(0)
    assert(ols > 2.5, s"OLS $ols should be dragged by the outlier")
  }

  test("AUC by doubled midranks (the q319 shape) handles ties and " +
    "matches the pair-counting definition") {
    // scores with a tie straddling the classes: AUC = (wins + 0.5 *
    // ties) / (n1 * n0) counted over all (pos, neg) pairs.
    val sc = Seq((10L, 1L), (10L, 0L), (5L, 0L), (20L, 1L), (5L, 1L),
      (1L, 0L)).toDF("m", "y1")
    val pairs = for {
      (sp, yp) <- Seq((10L, 1L), (20L, 1L), (5L, 1L))
      (sn, _) <- Seq((10L, 0L), (5L, 0L), (1L, 0L))
    } yield if (sp > sn) 1.0 else if (sp == sn) 0.5 else 0.0
    val aucRef = pairs.sum / pairs.size
    val vc = sc.groupBy(col("m"))
      .agg(count(lit(1)).as("t"), sum(col("y1")).as("t1"))
    val row = operators.Rank.distributedPrefixSum(vc,
        Seq(col("m").asc), col("t"), spark)
      .select(col("t"), col("t1"),
        (lit(2L) * (col("run") - col("t")) + col("t") + lit(1L))
          .as("mr2"))
      .agg(sum(col("t")).as("n"), sum(col("t1")).as("np"),
        sum(col("t1") * col("mr2")).as("r1x2"))
      .collect()(0)
    val (n, np, r1x2) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val auc = (r1x2 - np * (np + 1)).toDouble / (2.0 * np * (n - np))
    assert(math.abs(auc - aucRef) < 1e-12,
      s"rank-sum AUC $auc != pair-counting AUC $aucRef")
  }

  test("Brier decomposition (the q318 shape): REL - RES + UNC equals " +
    "the binned Brier score recomputed directly") {
    // hand forecasts already in [0, 9999] micro-prob units, two bins
    val rows = Seq((100L, 0L), (900L, 0L), (1200L, 1L), (9000L, 1L),
      (8000L, 1L), (7000L, 0L), (200L, 0L), (9900L, 1L))
    val n = rows.size
    val bins = rows.groupBy { case (pq, _) => pq / 5000L }
    val ybar = rows.map(_._2).sum.toDouble / n
    // direct: binned Brier with the bin-mean forecast pbar_k
    var direct = 0.0
    var rel = 0.0; var res = 0.0
    bins.values.foreach { b =>
      val nk = b.size
      val pbar = b.map(_._1).sum.toDouble / nk / 10000.0
      val ybk = b.map(_._2).sum.toDouble / nk
      direct += b.map { case (_, y) => (pbar - y) * (pbar - y) }.sum
      rel += nk * (pbar - ybk) * (pbar - ybk)
      res += nk * (ybk - ybar) * (ybk - ybar)
    }
    direct /= n; rel /= n; res /= n
    val unc = ybar * (1 - ybar)
    assert(math.abs((rel - res + unc) - direct) < 1e-12,
      "Murphy identity must hold exactly for bin-mean forecasts")
    // and the query's integer-floor version agrees to bin-floor noise
    val df = rows.toDF("pq", "y")
      .select(expr("pq DIV 5000").as("bin"), col("pq"), col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pq")).as("p"),
        sum(col("y")).as("yb"))
    val tots = df.agg(sum(col("n")).as("nt"), sum(col("yb")).as("yt"))
    val r = df.crossJoin(broadcast(tots))
      .agg(sum(expr("((p - 10000 * yb) * (p - 10000 * yb)) DIV n"))
          .as("relnum"),
        sum(expr("((yb * nt - n * yt) * (yb * nt - n * yt)) DIV n"))
          .as("resnum"))
      .collect()(0)
    val relQ = r.getLong(0).toDouble / (n * 1e8)
    val resQ = r.getLong(1).toDouble / (n.toDouble * n * n)
    assert(math.abs(relQ - rel) < 1e-6 && math.abs(resQ - res) < 1e-6,
      s"integer decomposition ($relQ, $resQ) != direct ($rel, $res)")
  }

  test("integer power iteration (the q321 shape) finds the dominant " +
    "axis of an anisotropic cloud") {
    // 6 points stretched 10x along dim 0, slight dim-1 noise: the
    // top principal direction must load ~fully on dim 0.
    val pts = Seq((0L, 0L, 1000L), (0L, 1L, 30L), (1L, 0L, -980L),
      (1L, 1L, 20L), (2L, 0L, 950L), (2L, 1L, -40L),
      (3L, 0L, -990L), (3L, 1L, -10L), (4L, 0L, 970L), (4L, 1L, 25L),
      (5L, 0L, -960L), (5L, 1L, 15L)).toDF("vec_id", "i", "xq")
    def step(v: org.apache.spark.sql.DataFrame) = {
      val dot = pts.join(broadcast(v), Seq("i"))
        .groupBy(col("vec_id")).agg(sum(col("xq") * col("vv")).as("dt"))
      val w = pts.join(dot, Seq("vec_id"))
        .groupBy(col("i")).agg(sum(col("xq") * col("dt")).as("wi"))
      val m = w.agg(max(abs(col("wi"))).as("mx"))
      w.crossJoin(broadcast(m)).select(col("i"),
        when(col("wi") < 0, -expr("abs(wi) DIV ((mx DIV 1000000) + 1)"))
          .otherwise(expr("wi DIV ((mx DIV 1000000) + 1)")).as("vv"))
    }
    val v0 = pts.select(col("i")).distinct()
      .withColumn("vv", lit(1000000L))
    val v2 = step(step(v0)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(v2(0L)) > 900000L,
      s"dominant axis loading ${v2(0L)} should be near ±1e6")
    assert(math.abs(v2(1L)) < 100000L,
      s"noise axis loading ${v2(1L)} should be near 0")
  }

  test("TextRank shape: an adjacency hub word outranks leaf words") {
    // star: 'data' adjacent to 4 distinct words; leaves only touch
    // the hub. PageRank on the symmetric graph must put the hub first.
    val e = Seq(("data", "lake"), ("data", "mesh"), ("data", "card"),
      ("data", "silo")).toDF("a", "b")
    val sym = e.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
    val top = Graph.pageRankInt(sym, "u", "v", iters = 3)
      .orderBy(col("rank").desc, col("v").asc).limit(1)
      .collect()(0).getString(0)
    assert(top == "data", s"hub word should rank first, got $top")
  }
}
