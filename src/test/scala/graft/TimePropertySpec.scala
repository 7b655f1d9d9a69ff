package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.NowFunctions

/** Differential property tests for the ns-stamp time functions:
  * random stamps across the full representable range (1677..2262,
  * including pre-epoch negatives) must agree with an independent
  * java.time recomputation — the reference's C struct-tm semantics
  * (UTC, wday Sun=0, yday 0-based, cumulative sub-second parts). */
class TimePropertySpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // full NoWDB range minus one day of slack on each end
  private val genNs: Gen[Long] =
    Gen.choose(-9223285636854775807L + 86400000000000L,
      9223372036854775807L - 86400000000000L)

  test("calendar + sub-second parts match java.time over 300 stamps") {
    val params = Gen.Parameters.default
    val stamps = (0 until 300).map(i =>
      genNs.pureApply(params, Seed(7L + i))) :+ 0L :+ -1L :+
      1000000000L :+ -1000000000L
    val df = stamps.toDF("ns").select(col("ns"),
      NowFunctions.yearOfNs(col("ns")).as("y"),
      NowFunctions.monthOfNs(col("ns")).as("mo"),
      NowFunctions.mdayNs(col("ns")).as("md"),
      NowFunctions.wdayNs(col("ns")).as("wd"),
      NowFunctions.ydayNs(col("ns")).as("yd"),
      NowFunctions.hourOfNs(col("ns")).as("h"),
      NowFunctions.minuteOf(NowFunctions.stampToTs(col("ns"))).as("mi"),
      NowFunctions.secondOf(NowFunctions.stampToTs(col("ns"))).as("se"),
      NowFunctions.milli(col("ns")).as("ms"),
      NowFunctions.micro(col("ns")).as("us"),
      NowFunctions.nano(col("ns")).as("nns"))
    df.collect().foreach { r =>
      val ns = r.getLong(0)
      // independent recompute: floor-div to seconds, nonneg remainder
      val sec = Math.floorDiv(ns, 1000000000L)
      val inSec = Math.floorMod(ns, 1000000000L)
      val t = java.time.Instant.ofEpochSecond(sec)
        .atOffset(java.time.ZoneOffset.UTC)
      assert(r.getLong(1) == t.getYear.toLong, s"year of $ns")
      assert(r.getLong(2) == t.getMonthValue.toLong, s"month of $ns")
      assert(r.getLong(3) == t.getDayOfMonth.toLong, s"mday of $ns")
      // C tm_wday: Sunday=0; java DayOfWeek: Monday=1..Sunday=7
      assert(r.getLong(4) == t.getDayOfWeek.getValue % 7, s"wday of $ns")
      assert(r.getLong(5) == t.getDayOfYear.toLong - 1, s"yday of $ns")
      assert(r.getLong(6) == t.getHour.toLong, s"hour of $ns")
      assert(r.getLong(7) == t.getMinute.toLong, s"minute of $ns")
      assert(r.getLong(8) == t.getSecond.toLong, s"second of $ns")
      assert(r.getLong(9) == inSec / 1000000L, s"milli of $ns")
      assert(r.getLong(10) == inSec / 1000L, s"micro of $ns")
      assert(r.getLong(11) == inSec, s"nano of $ns")
    }
  }

  test("stamp↔timestamp round trip truncates toward minus infinity") {
    val stamps = Seq(-1L, -999999999L, -1000000001L, 1L, 999L, 1000L)
    val df = stamps.toDF("ns").select(col("ns"),
      NowFunctions.tsToStamp(NowFunctions.stampToTs(col("ns"))).as("rt"))
    df.collect().foreach { r =>
      val ns = r.getLong(0)
      assert(r.getLong(1) == Math.floorDiv(ns, 1000L) * 1000L, s"ns=$ns")
    }
  }
}
