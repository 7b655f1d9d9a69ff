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
}
