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

  /** Merge two sketch arrays outside aggregation (e.g. rolling daily
    * sketch tables up to months): k smallest of the union. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(sort_array(array_distinct(concat(a, b))), 1, k)

  /** Distinct-count estimate from a sketch array: exact (= array size)
    * below k values; else (k−1)/h₍ₖ₎ scaled from the 63-bit space. */
  def kmvEstimate(sketch: Column, k: Int): Column = {
    val n = size(sketch)
    val kth = element_at(sketch, k).cast("double")
    when(n < k, n.cast("double"))
      .otherwise(round(lit((k - 1).toDouble) /
        (kth / lit(9.223372036854776e18)), 2))
  }

  /** One-call per-group approximate distinct: one shuffle on the keys,
    * map-side partial sketches, k·8 bytes of state per group. */
  def approxDistinctByKey(df: DataFrame, keys: Seq[String],
                          valueCol: String, k: Int = 256): DataFrame = {
    val sk = kmvSketchAgg(df.sparkSession, k)
    df.groupBy(keys.map(col): _*)
      .agg(kmvEstimate(sk(col(valueCol)), k).as("approx_distinct"))
  }
}
