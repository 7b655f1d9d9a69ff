package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeriesQueries

/** Differential checks for the time-series resampling queries:
  * straight-line Scala recomputes over the same parquet, independent
  * of both Catalyst and DuckDB (the reference's pysmoke strategy,
  * SURVEY §5). */
class TimeSeriesSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  private val d = TestSpark.sfDir

  // (event_id, us, user_id, event_type, value)
  private lazy val events: Seq[(Long, Long, Long, String, Double)] =
    Tables.events(spark, d)
      .selectExpr("event_id", "ts div 1000 as us", "user_id",
        "event_type", "value")
      .as[(Long, Long, Long, String, Double)].collect().toSeq

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q125 LOCF gap fill matches a scala scan") {
    val got = TimeSeriesQueries.queries("q125_gap_fill")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    val binUs = 21600000000L
    val exp = events.groupBy(_._3).flatMap { case (user, evs) =>
      val byBin = evs.groupBy(_._2 / binUs).map { case (b, es) =>
        b -> round6(es.map(_._5).sum / es.size)
      }
      val (lo, hi) = (byBin.keys.min, byBin.keys.max)
      var lastV = Double.NaN
      (lo to hi).map { b =>
        val filled = !byBin.contains(b)
        if (!filled) lastV = byBin(b)
        (user, b) -> ((lastV, filled))
      }
    }
    assert(got.size == exp.size)
    exp.foreach { case (k, (v, filled)) =>
      val (gv, gf) = got(k)
      assert(gf == filled && math.abs(gv - v) < 1e-9, s"$k: $gv vs $v")
    }
  }

  test("q126 truncated EWMA matches a scala recompute") {
    val got = TimeSeriesQueries.queries("q126_ewma")(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    val exp = events.groupBy(_._3).map { case (user, evs) =>
      val last20 = evs.sortBy(e => (-e._2, -e._1)).take(20).map(_._5)
      val wts = last20.indices.map(j => math.pow(0.7, j))
      val ewma = (last20, wts).zipped.map(_ * _).sum / wts.sum
      user -> ((round6(ewma), last20.size.toLong))
    }
    assert(got.keySet == exp.keySet)
    exp.foreach { case (u, (v, n)) =>
      assert(got(u)._2 == n)
      assert(math.abs(got(u)._1 - v) < 1e-6, s"user $u: ${got(u)._1} vs $v")
    }
  }

  test("q127 outlier counts match a scala recompute") {
    val got = TimeSeriesQueries.queries("q127_anomaly_zscore")(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    val exp = events.groupBy(_._4).map { case (tpe, evs) =>
      val xs = evs.map(_._5)
      val n = xs.size
      val mu = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
      val muR = round6(mu); val sdR = round6(sd)
      val out = xs.count(x => math.abs(x - muR) > 2.0 * sdR)
      tpe -> ((n.toLong, muR, sdR, out.toLong))
    }
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, (n, mu, sd, out)) =>
      val (gn, gmu, gsd, gout) = got(t)
      assert(gn == n && gout == out, s"$t: $gout vs $out")
      assert(math.abs(gmu - mu) < 1e-6 && math.abs(gsd - sd) < 1e-6)
    }
  }

  test("q131 interpolation matches a scala recompute in micro-units") {
    val got = TimeSeriesQueries.queries("q131_interpolate")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    val binUs = 21600000000L
    val exp = events.groupBy(_._3).flatMap { case (user, evs) =>
      val byBin = evs.groupBy(_._2 / binUs).map { case (b, es) =>
        b -> round6(es.map(_._5).sum / es.size)
      }
      val bins = byBin.keys.toSeq.sorted
      (bins.min to bins.max).map { b =>
        val v = byBin.get(b) match {
          case Some(x) => x
          case None =>
            val pb = bins.filter(_ < b).max
            val nb = bins.filter(_ > b).min
            val pv6 = math.round(byBin(pb) * 1e6)
            val nv6 = math.round(byBin(nb) * 1e6)
            val num = (nv6 - pv6) * (b - pb)
            val den = nb - pb
            (pv6 + math.floorDiv(num, den)).toDouble / 1e6
        }
        (user, b) -> ((v, byBin.contains(b)))
      }
    }
    assert(got.size == exp.size)
    exp.foreach { case (k, (v, obs)) =>
      val (gv, gobs) = got(k)
      assert(gobs == obs && gv == v, s"$k: $gv vs $v") // exact, no eps
    }
  }

  test("q137 running-min CUSUM equals the sequential max(0, S+d) recursion") {
    val got = TimeSeriesQueries.queries("q137_cusum")(spark, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val exp = events.groupBy(_._3).map { case (user, evs) =>
      val xs = evs.sortBy(e => (e._2, e._1)).map(_._5)
      val n = xs.size
      val rawMu = xs.sum / n
      val mu = round6(rawMu)
      // sd from the RAW mean (stddev_samp semantics), rounded after
      val sd = round6(math.sqrt(
        xs.map(x => (x - rawMu) * (x - rawMu)).sum / math.max(n - 1, 1)))
      val mu6 = math.round(mu * 1e6); val thresh = 3 * math.round(sd * 1e6)
      var s = 0L; var alarms = 0L; var maxS = Long.MinValue
      xs.foreach { x =>
        val dlt = math.round(x * 1e6) - mu6
        s = math.max(0L, s + dlt)
        if (s > thresh) alarms += 1
        maxS = math.max(maxS, s)
      }
      user -> ((n.toLong, alarms, maxS))
    }
    assert(got.keySet == exp.keySet)
    exp.foreach { case (u, (n, a, m)) =>
      assert(got(u)._1 == n && got(u)._2 == a && got(u)._3 == m,
        s"user $u: ${got(u)} vs ($n, $a, $m)")
    }
  }

  test("q125 marks every observed bin unfilled and fills only gaps forward") {
    val rows = TimeSeriesQueries.queries("q125_gap_fill")(spark, d)
      .collect()
    // filled rows must carry the value of the nearest earlier
    // unfilled bin for the same user
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      var last = Option.empty[Double]
      sorted.foreach { r =>
        if (!r.getBoolean(3)) last = Some(r.getDouble(2))
        else assert(last.contains(r.getDouble(2)))
      }
      assert(!sorted.head.getBoolean(3)) // grid starts at first observation
    }
  }
}
