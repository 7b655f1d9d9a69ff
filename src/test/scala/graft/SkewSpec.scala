package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // hot key 1L carries 10k rows; keys 2-50 one row each
  private lazy val skewed = (Seq.fill(10000)(1L) ++ (2L to 50L))
    .zipWithIndex.map { case (k, i) => (k, i.toDouble) }
    .toDF("k", "v").repartition(8)

  test("salted two-phase aggregation matches plain groupBy") {
    val plain = skewed.groupBy($"k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedSumCount(skewed, "k", "v", salts = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted == plain)
  }

  test("salted join matches plain join row-for-row") {
    val dim = (1L to 50L).map(k => (k, s"name$k")).toDF("dk", "name")
    val plain = skewed.join(dim, $"k" === $"dk")
      .groupBy($"k").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk", salts = 8)
      .groupBy($"k").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}
