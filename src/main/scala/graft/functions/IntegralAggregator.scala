package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Trapezoid integral as a typed `Aggregator` (NoWDB `integral`,
  * reference fun/fun.h:35 — MANY-class aggregate, documented semantics
  * doc/manual/sql.tex:1360-1378: area under the (t, y) curve).
  *
  * Input: (stamp ns, value); result: area in seconds·value units.
  * Points buffer per group and sort at reduce time — same shape as the
  * reference's MANY-class block buffering (fun.c:485-556), but
  * distributed: partial buffers merge associatively, so map-side
  * combine still applies. For very large groups prefer the window
  * formulation in [[NowAggregates.integralExactUs]].
  */
class IntegralAggregator
    extends Aggregator[(Long, Double), List[(Long, Double)], Double] {
  def zero: List[(Long, Double)] = Nil
  def reduce(b: List[(Long, Double)], a: (Long, Double)) = a :: b
  def merge(b1: List[(Long, Double)], b2: List[(Long, Double)]) = b1 ::: b2
  def finish(b: List[(Long, Double)]): Double = {
    val pts = b.sortBy(_._1)
    if (pts.length < 2) 0.0
    else pts.sliding(2).map { case List((t0, y0), (t1, y1)) =>
      (t1 - t0).toDouble / 1e9 * (y0 + y1) / 2.0
    }.sum
  }
  def bufferEncoder: Encoder[List[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Double)]]()
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
