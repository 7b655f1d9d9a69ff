package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin picks the latest right row at or before each left row") {
    val quotes = Seq( // (sym, t, px) — unique (key, t)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)
    ).toDF("sym", "t", "px")
    val trades = Seq(
      ("A", 25L, 100L), // between quotes 20 and 30 → px 2.0
      ("A", 20L, 101L), // exactly at a quote → that quote (≤)
      ("A", 5L, 102L),  // before any quote → dropped (inner)
      ("B", 99L, 103L), // latest B quote
      ("C", 50L, 104L)  // no key match → dropped
    ).toDF("sym", "t", "trade_id")
    val got = TemporalJoins.asofJoin(trades, quotes, "sym", "t", "t", "q_")
      .select($"trade_id", $"q_px").as[(Long, Double)].collect().toMap
    assert(got == Map(100L -> 2.0, 101L -> 2.0, 103L -> 9.0))
  }

  test("asofJoin tolerance bounds the lag") {
    val quotes = Seq(("A", 10L, 1.0), ("A", 100L, 2.0)).toDF("sym", "t", "px")
    val trades = Seq(("A", 12L, 1L), ("A", 90L, 2L)).toDF("sym", "t", "id")
    val got = TemporalJoins.asofJoin(trades, quotes, "sym", "t", "t", "q_",
        tolerance = Some(lit(5L)))
      .select($"id").as[Long].collect().toSet
    assert(got == Set(1L)) // trade at 90 is 80 ticks past quote 10 → dropped
  }

  test("rangeJoinBinned matches the theta join on overlapping intervals") {
    val points = Seq(0.0, 4499.9, 4500.0, 6999.9, 7000.0, 8999.9, 9000.0)
      .zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "x")
    val ivs = Seq((0L, 0.0, 7000.0), (1L, 4500.0, 11500.0))
      .toDF("iv", "lo", "hi")
    val got = TemporalJoins
      .rangeJoinBinned(points, "x", ivs, "lo", "hi", binWidth = 7000.0)
      .select($"id", $"i_iv").as[(Long, Long)].collect().toSet
    val want = (for {
      (i, x) <- Seq(0.0, 4499.9, 4500.0, 6999.9, 7000.0, 8999.9, 9000.0)
        .zipWithIndex.map { case (x, i) => (i.toLong, x) }
      (iv, lo, hi) <- Seq((0L, 0.0, 7000.0), (1L, 4500.0, 11500.0))
      if x >= lo && x < hi
    } yield (i, iv)).toSet
    assert(got == want)
    // boundary semantics spot checks: hi is exclusive, lo inclusive
    assert(!got.contains((4L, 0L)) && got.contains((2L, 0L)))
  }
}
