package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — bounded-state
  * cardinality estimation for the 100 TB regime (Bar-Yossef et al.,
  * RANDOM'02 — public algorithm).
  *
  * Keep the k smallest distinct 64-bit hashes of a column; the k-th
  * smallest hash h₍ₖ₎ mapped into (0,1) estimates
  * distinct ≈ (k−1)/h₍ₖ₎. Compared with HLL++ the state is a sorted
  * long array: order-independent (a set of minima), EXACTLY mergeable
  * (merge = k smallest of the union — no estimate drift when daily
  * sketches roll up to monthly), and deterministic across cluster
  * sizes and partitionings, so reruns reproduce bit-identical
  * estimates. Memory is k·8 bytes per group, fixed.
  */
object Sketches {

  /** Typed bounded-buffer aggregator over pre-hashed values. Buffer is
    * a sorted distinct Array[Long] of at most k elements; reduce is an
    * O(log k) search + (rare) O(k) insert, merge is a bounded union —
    * both associative and commutative, so Spark applies map-side
    * partial aggregation. */
  class KmvAggregator(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], h: Long): Array[Long] = insert(b, h)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var out = a
      var i = 0
      while (i < b.length) { out = insert(out, b(i)); i += 1 }
      out
    }
    def finish(r: Array[Long]): Array[Long] = r
    private def insert(b: Array[Long], h: Long): Array[Long] = {
      val i = java.util.Arrays.binarySearch(b, h)
      if (i >= 0) b // already present
      else {
        val ins = -i - 1
        if (ins >= k) b // not among the k smallest
        else {
          val n = math.min(b.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Register the k-sized KMV UDAF in the session under
    * `kmv_sketch_<k>` and return an agg-column builder over an
    * arbitrary input column (hashed here with xxhash64 shifted into
    * the non-negative 63-bit space). */
  def kmvSketchAgg(spark: org.apache.spark.sql.SparkSession,
                   k: Int): Column => Column = {
    val name = s"kmv_sketch_$k"
    spark.udf.register(name, udaf(new KmvAggregator(k)))
    c => call_udf(name, shiftrightunsigned(xxhash64(c), 1).cast("long"))
  }

  /** [[kmvSketchAgg]] over the oracle-reproducible arithmetic
    * [[sampleHash]] instead of xxhash64 — an external engine (DuckDB,
    * Python) can then recompute the k minima and the estimate exactly,
    * making the sketch differentially testable. Input must be a
    * non-negative integer id; estimates from this family use
    * `space = sampleHashSpace`. */
  def kmvSketchAggArith(spark: org.apache.spark.sql.SparkSession,
                        k: Int): Column => Column = {
    val name = s"kmv_sketch_arith_$k"
    spark.udf.register(name, udaf(new KmvAggregator(k)))
    c => call_udf(name, sampleHash(c))
  }

  /** Hash-space modulus of [[sampleHash]]. */
  val sampleHashSpace: Double = 999999999989.0

  /** Merge two sketch arrays outside aggregation (e.g. rolling daily
    * sketch tables up to months): k smallest of the union. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(sort_array(array_distinct(concat(a, b))), 1, k)

  /** Distinct-count estimate from a sketch array: exact (= array size)
    * below k values; else (k−1)/h₍ₖ₎ scaled from `space` (the hash
    * family's modulus — 2⁶³ for the xxhash64 family, `sampleHashSpace`
    * for the arithmetic one). */
  def kmvEstimate(sketch: Column, k: Int,
                  space: Double = 9.223372036854776e18): Column = {
    val n = size(sketch)
    val kth = element_at(sketch, k).cast("double")
    when(n < k, n.cast("double"))
      .otherwise(round(lit((k - 1).toDouble) / (kth / lit(space)), 2))
  }

  /** One-call per-group approximate distinct: one shuffle on the keys,
    * map-side partial sketches, k·8 bytes of state per group.
    * `arithHash = true` selects the [[sampleHash]] family (integer ids
    * only) so the estimate is reproducible by an external engine. */
  def approxDistinctByKey(df: DataFrame, keys: Seq[String],
                          valueCol: String, k: Int = 256,
                          arithHash: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val (sk, space) =
      if (arithHash) (kmvSketchAggArith(spark, k), sampleHashSpace)
      else (kmvSketchAgg(spark, k), 9.223372036854776e18)
    df.groupBy(keys.map(col): _*)
      .agg(kmvEstimate(sk(col(valueCol)), k, space).as("approx_distinct"))
  }

  // ---- approximate quantiles: bottom-k-by-hash sample sketch ----

  /** Bounded-state quantile sketch: keep the k (hash, value) pairs with
    * the lexicographically smallest keys — a deterministic uniform
    * sample (the hash makes inclusion independent of value order).
    * Compared with GK/KLL summaries this bottom-k design is
    * ORDER-INDEPENDENT: the bottom-k of a multiset does not depend on
    * partitioning or merge order, so estimates are bit-identical
    * across cluster sizes and reruns (KLL's compaction path depends on
    * merge order, which Spark does not fix), and — when the hash is a
    * plain arithmetic formula — an external engine can reproduce the
    * sample exactly, making the sketch differentially testable.
    * Quantile error is the sampling error O(1/√k). State: ≤ k pairs,
    * exactly mergeable (merge = bottom-k of the union). */
  class BottomKSampleAggregator(k: Int)
      extends Aggregator[(Long, Double), Array[(Long, Double)],
        Array[Double]] {
    private val ord = Ordering.Tuple2[Long, Double]
    def zero: Array[(Long, Double)] = Array.empty
    def reduce(b: Array[(Long, Double)],
               p: (Long, Double)): Array[(Long, Double)] = insert(b, p)
    def merge(a: Array[(Long, Double)],
              b: Array[(Long, Double)]): Array[(Long, Double)] = {
      var out = a
      var i = 0
      while (i < b.length) { out = insert(out, b(i)); i += 1 }
      out
    }
    /** Sample values in ascending order (the estimation-ready form). */
    def finish(r: Array[(Long, Double)]): Array[Double] =
      r.map(_._2).sorted
    // multiset bottom-k: duplicates kept, so the result is exactly
    // "ORDER BY (h, v) LIMIT k" over the whole input
    private def insert(b: Array[(Long, Double)],
                       p: (Long, Double)): Array[(Long, Double)] = {
      if (b.length >= k && ord.compare(p, b(b.length - 1)) >= 0) b
      else {
        var lo = 0
        var hi = b.length
        while (lo < hi) { // first index with b(idx) > p (upper bound)
          val mid = (lo + hi) >>> 1
          if (ord.compare(b(mid), p) <= 0) lo = mid + 1 else hi = mid
        }
        val n = math.min(b.length + 1, k)
        val out = new Array[(Long, Double)](n)
        System.arraycopy(b, 0, out, 0, lo)
        out(lo) = p
        System.arraycopy(b, lo, out, lo + 1, n - lo - 1)
        out
      }
    }
    def bufferEncoder: Encoder[Array[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[(Long, Double)]]()
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Double]]()
  }

  /** Oracle-reproducible sampling hash over a non-negative id: Knuth
    * multiplicative over a reduced residue, all intermediates < 2⁶³ so
    * ANSI long arithmetic (and DuckDB BIGINT) never overflows. */
  def sampleHash(id: Column): Column =
    pmod(pmod(id, lit(1000000007L)) * lit(2654435761L),
      lit(999999999989L))

  /** Register the k-sized quantile-sample UDAF as
    * `bottomk_sample_<k>` and return (idCol, valueCol) => agg column
    * producing the sorted sample array. */
  def quantileSketchAgg(spark: org.apache.spark.sql.SparkSession,
                        k: Int): (Column, Column) => Column = {
    val name = s"bottomk_sample_$k"
    spark.udf.register(name, udaf(new BottomKSampleAggregator(k)))
    (id, v) => call_udf(name, sampleHash(id), v.cast("double"))
  }

  /** Linear-interpolated quantile over a sorted sample array — the
    * same arithmetic as SQL percentile_cont: h = p(n−1), result =
    * v[⌊h⌋] + (h−⌊h⌋)·(v[⌊h⌋+1]−v[⌊h⌋]). Pure double ops in a fixed
    * order, so an oracle spelling out the identical formula matches
    * bit-for-bit. */
  def sampleQuantile(sample: Column, p: Double): Column = {
    val n = size(sample)
    val h = lit(p) * (n - 1).cast("double")
    val lo = floor(h).cast("int")
    val frac = h - lo.cast("double")
    val vlo = element_at(sample, lo + 1)
    val vhi = element_at(sample, least(lo + lit(2), n))
    vlo + frac * (vhi - vlo)
  }

  /** Per-group approximate quantiles in ONE streaming pass: one
    * shuffle on the group keys, ≤ k (hash, value) pairs of state per
    * group on the map side — the 100 TB shape (an exact per-group
    * percentile must materialize and sort every value). */
  def approxQuantilesByKey(df: DataFrame, keys: Seq[String],
                           idCol: String, valueCol: String,
                           probs: Map[String, Double],
                           k: Int = 200): DataFrame = {
    val sk = quantileSketchAgg(df.sparkSession, k)
    val qs = probs.toSeq.sortBy(_._1).map { case (name, p) =>
      round(sampleQuantile(col("sample"), p), 6).as(name)
    }
    df.groupBy(keys.map(col): _*)
      .agg(sk(col(idCol), col(valueCol)).as("sample"))
      .select(keys.map(col) ++ qs: _*)
  }

  // ---- heavy hitters: Misra–Gries mergeable summary ----

  /** Misra–Gries frequent-items summary (Misra & Gries '82; mergeable
    * form Agarwal et al., PODS'12 — public algorithms). State: at most
    * `c` (item, count) entries. Guarantee: every item with true
    * frequency > n/c survives with estimate within n/c of truth,
    * REGARDLESS of partitioning or merge order — so a downstream
    * exact count of the ≤ c candidates turns the approximate sketch
    * into an exact heavy-hitters answer (see
    * SketchQueries q130: the full-vocabulary shuffle of a naive
    * word count is replaced by c-bounded partial summaries).
    *
    * reduce: increment a resident item O(1); admit below capacity;
    * else the MG decrement-all step (amortized O(1) per input — each
    * decrement event cancels c+1 total count). merge: pointwise sum,
    * then subtract the (c+1)-th largest count and drop non-positives
    * (the PODS'12 merge that preserves the n/c error bound). */
  class MisraGriesAggregator(c: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], w: String): Map[String, Long] =
      b.get(w) match {
        case Some(n) => b.updated(w, n + 1)
        case None if b.size < c => b.updated(w, 1L)
        case None => // decrement-all, drop zeros (w itself cancels out)
          b.iterator.flatMap { case (k, n) =>
            if (n > 1) Iterator((k, n - 1)) else Iterator.empty
          }.toMap
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (k, n)) =>
        m.updated(k, m.getOrElse(k, 0L) + n)
      }
      if (sum.size <= c) sum
      else {
        val d = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(c)
        sum.iterator.flatMap { case (k, n) =>
          if (n - d > 0) Iterator((k, n - d)) else Iterator.empty
        }.toMap
      }
    }
    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Long]]()
  }

  /** Register the c-capacity Misra–Gries UDAF as `mg_sketch_<c>` and
    * return an agg-column builder (input: the item column). */
  def mgSketchAgg(spark: org.apache.spark.sql.SparkSession,
                  c: Int): Column => Column = {
    val name = s"mg_sketch_$c"
    spark.udf.register(name, udaf(new MisraGriesAggregator(c)))
    col => call_udf(name, col)
  }

  /** Exact heavy hitters (count > n/`threshDenom`) in the two-pass
    * sketch-then-verify shape: pass 1 reduces the corpus to ONE
    * ≤ `cap`-entry summary (map-side partial MG, no full-vocabulary
    * shuffle); pass 2 exact-counts only the candidates (broadcast
    * membership filter prunes the item stream before its shuffle).
    * Correct for any `cap ≥ threshDenom` by the MG guarantee; the
    * result is exact and partitioning-independent even though the
    * intermediate sketch is neither. The ≤ cap candidate collect is
    * driver-bounded by construction. */
  def exactHeavyHitters(items: DataFrame, itemCol: String,
                        threshDenom: Long, cap: Int): DataFrame = {
    require(cap >= threshDenom,
      s"cap $cap must be >= threshold denominator $threshDenom")
    val spark = items.sparkSession
    val mg = mgSketchAgg(spark, cap)
    // one pass for sketch + total: a single job over the item stream
    val row = items
      .agg(mg(col(itemCol)).as("mg"), count(lit(1)).as("n"))
      .select(map_keys(col("mg")).as("cands"), col("n"))
      .collect()(0)
    val summary = row.getSeq[String](0)
    val n = row.getLong(1)
    items.filter(col(itemCol).isInCollection(summary))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(n / threshDenom))
  }

  // ---- join-size estimation: KMV key-domain sampling ----

  /** Estimate |A ⨝ B| on an integer key WITHOUT executing the join —
    * the cardinality statistic a planner needs before committing to a
    * shuffle strategy at 100 TB (broadcast vs SMJ vs pre-partition),
    * and exactly what a per-key frequency join would cost too much to
    * answer. Method (KMV domain sampling — the join-size analog of
    * Bar-Yossef et al.'s distinct-count KMV): the bottom-k sketch of
    * the UNION key domain picks a uniform k-key sample; both sides
    * are counted ONLY on sampled keys (a θ-threshold filter BEFORE
    * any shuffle, so the aggregate state is ≤ k keys however large
    * the inputs); the sampled frequency product Σ cntA·cntB is scaled
    * by D̂_union/k. Below k distinct keys the sample is the whole
    * domain and the estimate is exact. The [[sampleHash]] family
    * makes every step — kth-smallest hash, θ-filter, scale factor —
    * recomputable bit-for-bit by an external engine (q197's oracle).
    * One row: (j_samp, n_sample_keys, est_join_rows). Accuracy is the
    * usual KMV O(1/√k) *for the sampled mass*; heavy-key skew
    * concentrates variance, so planners should read it as an
    * order-of-magnitude signal (and k up if it matters). */
  def joinSizeEstimate(a: DataFrame, aKey: String,
                       b: DataFrame, bKey: String, k: Int): DataFrame = {
    val spark = a.sparkSession
    val sk = kmvSketchAggArith(spark, k)
    val keys = a.select(col(aKey).as("key"))
      .unionAll(b.select(col(bKey).as("key")))
    // 1-row sketch summary: sample size + inclusion threshold θ
    // empty inputs ⇒ empty sketch array; element_at(arr, 0) is a
    // runtime error ("SQL array indices start at 1"), so θ goes null
    // on n_sk=0 — the null θ filters every row out of sideCounts and
    // the final estimate degrades to (0, 0, 0.0) instead of throwing
    val skRow = keys.agg(sk(col("key")).as("sk"))
      .select(size(col("sk")).as("n_sk"),
        when(size(col("sk")) > 0,
          element_at(col("sk"), size(col("sk")))).as("theta"))
    // per-side counts restricted to sampled keys: the θ filter runs
    // map-side against a broadcast scalar, so the groupBy shuffles
    // ≤ k keys regardless of input size
    def sideCounts(df: DataFrame, key: String, out: String) =
      df.crossJoin(broadcast(skRow.select(col("theta"))))
        .filter(sampleHash(col(key)) <= col("theta"))
        .groupBy(col(key).as("key"))
        .agg(count(lit(1)).as(out))
    val j = sideCounts(a, aKey, "ca")
      .join(sideCounts(b, bKey, "cb"), "key")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("j_samp"))
    j.crossJoin(broadcast(skRow))
      .select(col("j_samp"),
        col("n_sk").cast("long").as("n_sample_keys"),
        when(col("n_sk") < k, col("j_samp").cast("double"))
          .otherwise(round(
            col("j_samp") *
              (lit((k - 1).toDouble) /
                (col("theta").cast("double") / lit(sampleHashSpace)))
              / lit(k.toDouble), 2))
          .as("est_join_rows"))
  }
}
