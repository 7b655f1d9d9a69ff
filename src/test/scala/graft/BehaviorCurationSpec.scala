package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BehaviorQueries, CurationQueries}

/** Differential checks for the round-4 behavioral/curation queries:
  * recompute each result with straight-line Scala over the same
  * parquet and compare — the same strategy as the reference's pysmoke
  * (SURVEY §5), independent of both Catalyst and DuckDB. */
class BehaviorCurationSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  private val d = TestSpark.sfDir

  private def events: Seq[(Long, Long, Long)] = // (event_id, us, user_id)
    Tables.events(spark, d)
      .selectExpr("event_id", "ts div 1000 as us", "user_id")
      .as[(Long, Long, Long)].collect().toSeq

  test("q102 concurrency matches a scala sweep line") {
    val got = BehaviorQueries.queries("q102_concurrency")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pts = events.flatMap { case (_, t, _) =>
      Seq((t, 1), (t + 300000000L, -1)) }
      .sortBy { case (t, delta) => (t, delta) }
    var conc = 0L
    val peak = collection.mutable.Map.empty[Long, Long]
    pts.foreach { case (t, delta) =>
      conc += delta
      val day = t / 86400000000L
      peak(day) = math.max(peak.getOrElse(day, Long.MinValue), conc)
    }
    assert(got == peak.toMap)
  }

  test("q103 gap islands matches a scala scan") {
    val got = BehaviorQueries.queries("q103_gap_islands")(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val exp = events.groupBy(_._3).map { case (user, evs) =>
      val ts = evs.sortBy(e => (e._2, e._1)).map(_._2)
      val islands = collection.mutable.ArrayBuffer(
        collection.mutable.ArrayBuffer(ts.head))
      ts.tail.foreach { t =>
        if (t - islands.last.last > 1800000000L)
          islands += collection.mutable.ArrayBuffer(t)
        else islands.last += t
      }
      user -> ((islands.size.toLong, islands.map(_.size).max.toLong))
    }
    assert(got == exp)
  }

  test("q107 bloom decontamination equals the exact scala overlap") {
    val docs = Tables.documents(spark, d)
      .selectExpr("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    def grams(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 5) Set.empty
      else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val bench = docs.filter(_._1 % 20 == 7).flatMap(d => grams(d._3)).toSet
    val corpus = docs.filterNot(_._1 % 20 == 7)
    val exp = corpus.groupBy(_._2).map { case (src, ds) =>
      val contaminated = ds.count(d => grams(d._3).exists(bench))
      src -> ((ds.size.toLong, contaminated.toLong,
        (ds.size - contaminated).toLong))
    }
    val got = CurationQueries.queries("q107_bloom_decontaminate")(spark, d)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == exp)
  }

  test("q110 vocab coverage matches scala word counts") {
    val counts = Tables.documents(spark, d).select("text").as[String]
      .collect().flatMap(_.split(" ")).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val total = counts.values.sum
    val thr = total / 1000L
    val vocab = counts.filter(_._2 >= thr)
    val r = CurationQueries.queries("q110_vocab_coverage")(spark, d)
      .collect().head
    assert(r.getLong(0) == vocab.size.toLong)
    assert(r.getLong(1) == counts.size.toLong)
    assert(r.getLong(2) == total)
    assert(r.getLong(3) == vocab.values.sum)
  }

  test("q112 weighted sample is deterministic and weight-monotone") {
    val q = CurationQueries.queries("q112_weighted_sample")
    val a = q(spark, d).collect().map(r => (r.getLong(0), r.getDouble(2)))
    val b = q(spark, d).collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(a.sameElements(b)) // stable across plans/retries
    assert(a.length == 20)
    // keys are the sort order itself: descending
    assert(a.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
  }
}
