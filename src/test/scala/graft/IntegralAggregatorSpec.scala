package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.IntegralAggregator

class IntegralAggregatorSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("trapezoid integral over unordered distributed input") {
    // y = t (in seconds) from 0..10 → area = 50; feed out of order
    val pts = Seq((10L, 10.0), (0L, 0.0), (5L, 5.0), (2L, 2.0))
      .map { case (t, y) => (1L, t * 1000000000L, y) }
    val df = pts.toDF("g", "t", "y").repartition(3)
    spark.udf.register("t_integral", udaf(new IntegralAggregator))
    val r = df.groupBy($"g").agg(call_udf("t_integral", $"t", $"y").as("a"))
      .collect()(0).getDouble(1)
    assert(math.abs(r - 50.0) < 1e-9)
  }

  test("fewer than two points yields 0 (NoWDB empty-agg parity)") {
    val df = Seq((1L, 1000000000L, 5.0)).toDF("g", "t", "y")
    spark.udf.register("t_integral2", udaf(new IntegralAggregator))
    val r = df.groupBy($"g").agg(call_udf("t_integral2", $"t", $"y"))
      .collect()(0).getDouble(1)
    assert(r == 0.0)
  }
}
