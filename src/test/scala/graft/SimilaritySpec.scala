package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {

  test("jlProject matches an independent scala recompute of the md5-sign definition") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 8).map(i =>
      (i.toLong, Seq.fill(12)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val k = 4
    def sign(i: Long, j: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${i}_$j".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xF) < 8) 1 else -1
    }
    val expected = vecs.flatMap { case (id, v) =>
      (0 until k).map { j =>
        val s = v.zipWithIndex.map { case (x, i) =>
          // mirror the DECIMAL(18,9) element rounding
          BigDecimal(x.toDouble).setScale(9, BigDecimal.RoundingMode.HALF_UP) *
            sign(i.toLong, j.toLong)
        }.sum
        (id, j.toLong) ->
          (BigDecimal(s.toDouble / math.sqrt(k.toDouble) * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6)
      }
    }.toMap
    val got = Similarity.jlProject(df, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got.keySet == expected.keySet)
    // tolerance 2e-6: covers half-tie divergence between the two
    // double→decimal conversion routes at the final round(6); a wrong
    // sign or normalization would miss by ~element magnitude (1e-1)
    got.foreach { case (key, p) =>
      assert(math.abs(p - expected(key)) < 2e-6, s"$key: $p vs ${expected(key)}")
    }
  }

  test("hardNegatives returns only other-label vectors, ranked by cosine") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0L until 30L).map(i =>
      (i, Seq.fill(16)((rnd.nextDouble() * 2 - 1).toFloat), (i % 3).toInt))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df, df.filter($"vec_id" < 2),
      "vec_id", "embedding", "label", k = 4).collect()
    assert(got.length == 8) // 2 queries × 4
    got.foreach { r =>
      val (q, v) = (r.getLong(0), r.getLong(1))
      assert(rows(v.toInt)._3 != rows(q.toInt)._3, s"same-label $q->$v")
    }
    // per query: ranks 1..4 with non-increasing cosine
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(4))
      assert(sorted.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L, 4L))
      val cs = sorted.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("labelNoiseByCentroid flags a planted mislabel") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    // two tight clusters around orthogonal directions; vec 20 sits in
    // cluster 0's direction but carries label 1 → must be the one
    // suspect; everything else agrees with its own centroid
    val rnd = new scala.util.Random(3)
    def near(base: Int) = Seq.tabulate(8)(i =>
      (if (i == base) 1.0 else 0.0) + rnd.nextDouble() * 0.01)
      .map(_.toFloat)
    val rows = (0L until 10L).map(i => (i, near(0), 0)) ++
      (10L until 20L).map(i => (i, near(4), 1)) :+
      ((20L, near(0), 1))
    val got = Similarity.labelNoiseByCentroid(
        rows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(0) == (10L, 0L)) // label 0: clean
    assert(got(1) == (11L, 1L)) // label 1: exactly the planted suspect
  }

  test("codegen CosineSim is bit-identical to the HOF fold") {
    import graft.functions.VectorOps
    import org.apache.spark.sql.functions._
    val spark0 = TestSpark.spark
    import spark0.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextDouble() * 2 - 1),
        Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("id", "a", "b")
    val cos = VectorOps.nativeCosine(spark0)
    val out = rows.select(VectorOps.cosine($"a", $"b").as("hof"),
      cos($"a", $"b").as("native")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }
  test("CosineSim matches the HOF fold on nulls and ragged lengths") {
    import graft.functions.VectorOps
    val spark0 = TestSpark.spark
    import spark0.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Double](1.0, null, 3.0),
        Seq[java.lang.Double](1.0, 2.0, 3.0)),  // null element
      (2L, Seq[java.lang.Double](1.0, 2.0),
        Seq[java.lang.Double](1.0, 2.0, 3.0)),  // ragged lengths
      (3L, Seq[java.lang.Double](1.0, 2.0, 3.0),
        Seq[java.lang.Double](1.0, 2.0, 3.0))   // clean
    ).toDF("id", "a", "b")
    val cos = VectorOps.nativeCosine(spark0)
    val out = rows
      .select($"id", VectorOps.cosine($"a", $"b").as("hof"),
        cos($"a", $"b").as("native"))
      .orderBy($"id").collect()
    out.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch: $r")
      if (!r.isNullAt(1))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)))
    }
    assert(out(0).isNullAt(2) && out(1).isNullAt(2) && !out(2).isNullAt(2))
  }

  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 well-separated directions + noise vectors near each
  private val emb = Seq(
    (0L, Array(1.0, 0.0, 0.0, 0.0)),
    (1L, Array(0.0, 1.0, 0.0, 0.0)),
    (2L, Array(0.0, 0.0, 1.0, 0.0)),
    (10L, Array(0.9, 0.1, 0.0, 0.0)),  // near 0
    (11L, Array(0.95, 0.05, 0.1, 0.0)), // near 0
    (20L, Array(0.1, 0.9, 0.05, 0.0)), // near 1
    (30L, Array(0.0, 0.1, 0.9, 0.1))   // near 2
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val got = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0, 0.0), k = 3)
      .collect().map(_.getLong(0))
    assert(got(0) == 0L) // exact match first
    assert(got.toSet == Set(0L, 10L, 11L))
  }

  test("batch top-k returns per-query ranks") {
    val qs = emb.filter($"vec_id" < 3)
    val got = Similarity.bruteForceTopKJoin(emb, qs, "vec_id",
      "embedding", "vec_id", "embedding", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 10L) // cos=0.9/√0.82≈0.9939 beats 0.95/√0.915≈0.9931
    assert(got(1L) == 20L)
    assert(got(2L) == 30L)
  }

  test("IVF probe finds neighbors in probed buckets only") {
    // centroids = first 3 by id (the axis vectors)
    val got = Similarity.ivfTopK(emb, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0, 0.0), nlist = 3, nprobe = 1, k = 10)
      .collect().map(_.getLong(0)).toSet
    // probe bucket of centroid 0 only → axis-0 cluster, not 20/30
    assert(got.contains(0L) && got.contains(10L) && got.contains(11L))
    assert(!got.contains(20L) && !got.contains(30L))
  }

  test("IVF assignment puts every vector in exactly one bucket") {
    val cents = Similarity.centroids(emb, "vec_id", "embedding", 3)
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
    assert(assigned.count() == 7)
    assert(assigned.select("vec_id").distinct().count() == 7)
  }

  test("batch IVF probe matches single-query searches (minus self)") {
    val emb2 = Tables.embeddings(TestSpark.spark, TestSpark.sfDir)
    val cents = Similarity.centroids(emb2, "vec_id", "embedding", 8)
    val assigned = Similarity.ivfAssign(emb2, "vec_id", "embedding",
      cents)
    val queries = emb2.filter(col("vec_id") < 3L)
    val batch = Similarity.ivfSearchBatch(assigned, cents, queries,
      "vec_id", "embedding", nprobe = 2, k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSet)
      .toMap
    queries.select("vec_id", "embedding").collect().foreach { qr =>
      val qid = qr.getLong(0)
      val qv = qr.getSeq[Float](1).map(_.toDouble)
      val single = Similarity.ivfSearch(
          assigned.filter(col("vec_id") =!= qid), cents, qv,
          nprobe = 2, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch(qid) == single, s"query $qid")
    }
  }

  test("quantizedTopK: exact integer dots, partition-independent, near-float ranks") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val qs = emb.filter(col("vec_id") < 3L)
    val got = Similarity.quantizedTopK(emb, qs, "vec_id", "embedding",
      "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent scala recompute of the int8 dots for one query
    val vecs = emb.filter(col("vec_id") < 50L)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def q8(v: Array[Double]): Array[Long] = {
      val mx = v.map(math.abs).max
      v.map(x => math.round(127.0 * x / mx))
    }
    val q0 = q8(vecs(0L))
    got.filter(t => t._1 == 0L && vecs.contains(t._2)).foreach {
      case (_, id, dot, _) =>
        val exp = (q8(vecs(id)), q0).zipped.map(_ * _).sum
        assert(dot == exp, s"vec $id: $dot vs $exp")
    }
    // partitioning must not change a single output bit
    val got2 = Similarity.quantizedTopK(emb.repartition(13), qs,
      "vec_id", "embedding", "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sortBy(t => (t._1, t._4)).sameElements(
      got2.sortBy(t => (t._1, t._4))))
    // sanity: quantized top-1 overlaps the float top-5 for each query
    val brute = Similarity.bruteForceTopKJoin(emb, qs, "vec_id",
      "embedding", "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    got.filter(_._4 == 1L).foreach { case (qid, id, _, _) =>
      assert(brute(qid).contains(id), s"query $qid: top-1 $id not in float top-5")
    }
  }

  test("classCentroids computes exact per-dimension means per label") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 4.0f)),
      (1, Seq(10.0f, -2.0f))
    ).toDF("label", "embedding")
    val got = Similarity.classCentroids(df, "label", "embedding")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(got == Map((0, 0L) -> 2.0, (0, 1L) -> 3.0,
      (1, 0L) -> 10.0, (1, 1L) -> -2.0))
  }

  test("classCentroids mean is partition-order independent") {
    val spark = TestSpark.spark
    import spark.implicits._
    // values chosen so a double sum would depend on add order
    val rows = (1 to 2000).map(i =>
      (0, Seq((if (i % 2 == 0) 1e8f else 1e-8f) * (i % 7 - 3))))
    val run = (s: Seq[(Int, Seq[Float])], p: Int) =>
      Similarity.classCentroids(s.toDF("label", "embedding")
          .repartition(p), "label", "embedding")
        .collect()(0).getDouble(2)
    assert(run(rows, 3) == run(rows.reverse, 17))
  }

  test("kmeansRefine improves the quantization objective; deterministic") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val cos = graft.functions.VectorOps.nativeCosine(spark)
    // the k-means objective: mean cosine of each vector to its
    // assigned centroid (what Lloyd ascends; recall at a fixed nprobe
    // is downstream of this and noisy on a tiny corpus)
    def objective(cents: org.apache.spark.sql.DataFrame): Double =
      Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
        .join(broadcast(cents), "centroid_id")
        .agg(avg(cos(col("v"), col("cv")))).collect()(0).getDouble(0)
    val firstN = Similarity.centroids(emb, "vec_id", "embedding", 16)
    val refined = Similarity.kmeansRefine(emb, "vec_id", "embedding",
      firstN, iters = 2)
    val (o0, o1) = (objective(firstN), objective(refined))
    assert(o1 > o0, s"refined objective $o1 did not beat first-n $o0")
    // determinism: a second refine run under a different partitioning
    // yields bit-identical centroid vectors (exact decimal means)
    val refined2 = Similarity.kmeansRefine(
      emb.repartition(7), "vec_id", "embedding", firstN, iters = 2)
    val a = refined.orderBy("centroid_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val b = refined2.orderBy("centroid_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(a.sameElements(b))
  }

  test("kmeansRefineMicro ascends the objective and is partition-invariant") {
    // the engine-exact variant (integer micro-unit means) the IVF
    // query pack runs on: same ascent property as kmeansRefine, and
    // the micro-quantized means must also be bit-identical across
    // partitionings (they are sums of longs)
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val cos = graft.functions.VectorOps.nativeCosine(spark)
    def objective(cents: org.apache.spark.sql.DataFrame): Double =
      Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
        .join(broadcast(cents), "centroid_id")
        .agg(avg(cos(col("v"), col("cv")))).collect()(0).getDouble(0)
    val firstN = Similarity.centroids(emb, "vec_id", "embedding", 16)
    val refined = Similarity.kmeansRefineMicro(emb, "vec_id",
      "embedding", firstN, iters = 1)
    assert(objective(refined) > objective(firstN))
    val refined2 = Similarity.kmeansRefineMicro(
      emb.repartition(7), "vec_id", "embedding", firstN, iters = 1)
    val a = refined.orderBy("centroid_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val b = refined2.orderBy("centroid_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(a.sameElements(b))
  }

  test("kCenterCoreset matches a brute-force greedy recompute; radius shrinks with k") {
    val spark0 = TestSpark.spark
    val emb = Tables.embeddings(spark0, TestSpark.sfDir)
    // independent scala recompute of the farthest-first traversal on
    // the same fixed-point integer coordinates
    val pts = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(x => BigDecimal(x.toDouble * 1000000) // HALF_UP = Spark round()
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def greedy(k: Int): Seq[Long] = {
      val centers = scala.collection.mutable.ArrayBuffer(pts.head._1)
      while (centers.length < k) {
        val cvs = centers.map(c => pts.find(_._1 == c).get._2)
        val far = pts.map { case (id, v) => (id, cvs.map(d2(v, _)).min) }
          .maxBy { case (id, d) => (d, -id) }
        centers += far._1
      }
      centers.toSeq
    }
    def radius(rows: Array[org.apache.spark.sql.Row]): Long =
      rows.map(_.getAs[Long]("max_d2")).max
    val out4 = Similarity.kCenterCoreset(emb, "vec_id", "embedding", 4)
      .collect()
    assert(out4.sortBy(_.getAs[Long]("center_rank"))
      .map(_.getAs[Long]("center_vec_id")).toSeq == greedy(4),
      "selection diverges from the brute-force greedy order")
    assert(out4.map(_.getAs[Long]("n_points")).sum == pts.length,
      "every point assigned exactly once")
    val out2 = Similarity.kCenterCoreset(emb, "vec_id", "embedding", 2)
      .collect()
    assert(radius(out4) <= radius(out2),
      "coverage radius must not grow with more centers")
  }
}
