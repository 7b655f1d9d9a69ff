package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{NowFunctions => F, NowAggregates => A}

class NowFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")

  test("wday is C tm_wday: Sun=0..Sat=6") {
    // 2020-01-02 was a Thursday; 2026-08-09 a Sunday
    assert(one[Long](F.wday(to_timestamp(lit("2020-01-02 03:04:05")))) == 4L)
    assert(one[Long](F.wday(to_timestamp(lit("2026-08-09 00:00:00")))) == 0L)
  }

  test("yday is 0-based like tm_yday") {
    assert(one[Long](F.yday(to_timestamp(lit("2020-01-01 00:00:00")))) == 0L)
    assert(one[Long](F.yday(to_timestamp(lit("2020-12-31 00:00:00")))) == 365L) // leap
  }

  test("sub-second parts are cumulative within the second") {
    val ns = lit(1577934245123456789L) // 2020-01-02T03:04:05.123456789
    assert(one[Long](F.milli(ns)) == 123L)
    assert(one[Long](F.micro(ns)) == 123456L)
    assert(one[Long](F.nano(ns)) == 123456789L)
  }

  test("stamp↔timestamp round trip at µs precision") {
    val ns = 1577934245123456000L
    assert(one[Long](F.tsToStamp(F.stampToTs(lit(ns)))) == ns)
    assert(one[Long](F.yearOfNs(lit(ns))) == 2020L)
    assert(one[Long](F.hourOfNs(lit(ns))) == 3L)
  }

  test("dawn/dusk/epoch constants") {
    assert(one[Long](F.dawn) == Long.MinValue)
    assert(one[Long](F.dusk) == Long.MaxValue)
    assert(one[Long](F.epochNs) == 0L)
  }

  test("intDiv truncates toward zero like C") {
    assert(one[Long](F.intDiv(lit(17L), lit(5L))) == 3L)
    assert(one[Long](F.intDiv(lit(-17L), lit(5L))) == -3L)
    assert(one[Long](F.rem(lit(-17L), lit(5L))) == -2L)
  }

  test("integral computes trapezoid area per group") {
    val df = Seq((1L, 0.0, 0.0), (1L, 1.0, 2.0), (1L, 2.0, 4.0),
      (2L, 0.0, 10.0), (2L, 2.0, 10.0)).toDF("g", "t", "y")
    val got = A.integral(df, Seq("g"), col("t"), col("y"), "area")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 4.0)  // 1*(0+2)/2 + 1*(2+4)/2
    assert(got(2L) == 20.0) // 2*(10+10)/2
  }

  test("empty-input aggregates yield 0, not NULL (NoWDB parity)") {
    val df = Seq(1.0, 2.0).toDF("x").filter(col("x") > 100)
    val r = df.agg(A.avg0(col("x")), A.median0(col("x")),
      A.stddev0(col("x"))).collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0
      && r.getDouble(2) == 0.0)
    // and stddev of a single row is 0 too (n<2 ⇒ 0, fun.c:607-647)
    val r1 = Seq(5.0).toDF("x").agg(A.stddev0(col("x"))).collect()(0)
    assert(r1.getDouble(0) == 0.0)
  }

  test("spread and product") {
    val df = Seq(2.0, 4.0, 8.0).toDF("x")
    val r = df.agg(A.spread(col("x")), A.prod(col("x"))).collect()(0)
    assert(r.getDouble(0) == 6.0)
    assert(r.getDouble(1) == 64.0)
  }
}
