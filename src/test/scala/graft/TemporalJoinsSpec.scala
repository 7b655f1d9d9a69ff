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

  test("asofNearest picks the closer side, backward on ties, bounded") {
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 100L, 2.0),
      ("B", 500L, 9.0)
    ).toDF("sym", "t", "px")
    val trades = Seq(
      ("A", 12L, 200L),  // b=10 (d2) vs f=100 (d88) → backward 1.0
      ("A", 60L, 201L),  // b=10 (d50) vs f=100 (d40) → forward 2.0
      ("A", 55L, 202L),  // d45/d45 tie → backward 1.0
      ("A", 9L, 203L),   // no backward → forward 10 (d1) → 1.0
      ("A", 10L, 204L),  // exact hit → dist 0 backward
      ("B", 900L, 205L), // b=500 d400 > tol 300 → dropped
      ("C", 1L, 206L)    // no key match → dropped
    ).toDF("sym", "t", "trade_id")
    val got = TemporalJoins.asofNearest(trades, quotes, "sym", "t", "t",
        tolerance = lit(300L), rightPrefix = "q_")
      .select($"trade_id", $"q_px", $"q_t").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got == Map(
      200L -> (1.0, 10L), 201L -> (2.0, 100L), 202L -> (1.0, 10L),
      203L -> (1.0, 10L), 204L -> (1.0, 10L)))
  }

  test("asofJoin matches a naive per-row reference on 500 random rows") {
    val rnd = new scala.util.Random(1234)
    val quotes = (0 until 200).map { i =>
      (s"K${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i.toLong)
    }.groupBy(q => (q._1, q._2)) // unique (key, t): keep max id
      .map { case ((k, t), vs) => (k, t, vs.map(_._3).max) }.toSeq
    val trades = (0 until 300).map { i =>
      (s"K${rnd.nextInt(10)}", rnd.nextInt(1100).toLong, (1000 + i).toLong)
    }
    val got = TemporalJoins.asofJoin(
        trades.toDF("k", "t", "id"), quotes.toDF("k", "t", "qid"),
        "k", "t", "t", "q_")
      .select($"id", $"q_qid").as[(Long, Long)].collect().toMap
    val want = trades.flatMap { case (k, t, id) =>
      val eligible = quotes.filter(q => q._1 == k && q._2 <= t)
      if (eligible.isEmpty) None
      else {
        val tMax = eligible.map(_._2).max
        Some(id -> eligible.filter(_._2 == tMax).map(_._3).max)
      }
    }.toMap
    assert(got == want)
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
