package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class EventStreamsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, tsSec: Long, user: Long, typ: String = "click",
                 v: Double = 1.0): Event =
    Event(id, tsSec * 1000000000L, user, typ, v, "{}")

  test("curation screens run unchanged under readStream (batch parity)") {
    // the round-7 screens (PII scrub, repetition profile, blocklist)
    // are STATELESS projections, so the ingest pipeline can run them
    // on the live stream with zero code changes — prove it on a real
    // memory stream against the batch result, including that the
    // streaming plan needs no watermark/state
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = Seq(
      (1L, "mail a.b@ex.org or c@d.io from 10.0.0.7"),
      (2L, "call +1-555-013-4567 twice +1-555-013-4567"),
      (3L, "the the the cat cat sat"),
      (4L, "nothing to redact here"))
    val streamed = graft.operators.TextAnalysis.piiScrub(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = streamed.writeStream.format("memory").queryName("scrub_par")
      .outputMode("append").start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("scrub_par").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toSet
      val want = graft.operators.TextAnalysis.piiScrub(
          docs.toDF("doc_id", "text"), "doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toSet
      assert(got == want)
      assert(got.exists(_._5.contains("<PHONE> twice <PHONE>")))
    } finally q.stop()
  }

  test("CDC upsert: foreachBatch MERGE converges to last-writer-wins " +
    "under out-of-order delivery") {
    implicit val sq = spark.sqlContext
    import java.nio.file.Files
    val eng = new graft.engine.Engine(spark,
      Files.createTempDirectory("cdc-scope").toString)
    eng.sql("create scope cdc"); eng.sql("use cdc")
    eng.sql("create type st (uid uint pk, eid uint, v text)")
    // (user, event_id, value): user 1 gets 3 versions delivered OUT
    // of order (newest first), user 2 two versions split across
    // batches, user 3 arrives late
    val input = MemoryStream[(Long, Long, String)]
    val q = input.toDF().toDF("u", "e", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val compact = batch.groupBy(col("u"))
          .agg(max(struct(col("e"), col("v"))).as("m"))
          .select(col("u"), col("m.e").as("e"), col("m.v").as("v"))
        eng.attachTable("b", compact)
        val r = eng.sql("merge into st using b on st.uid = b.u " +
          "when matched then update set " +
          "v = case when b.e > st.eid then b.v else st.v end, " +
          "eid = case when b.e > st.eid then b.e else st.eid end " +
          "when not matched then insert (uid, eid, v) " +
          "values (b.u, b.e, b.v)")
        assert(r.isInstanceOf[graft.engine.Status]
          && r.asInstanceOf[graft.engine.Status].ok, r.toString)
        ()
      }.start()
    try {
      input.addData((1L, 30L, "newest"), (2L, 10L, "old2"))
      q.processAllAvailable()
      input.addData((1L, 10L, "stale"), (1L, 20L, "stale2"),
        (2L, 20L, "new2"))
      q.processAllAvailable()
      input.addData((3L, 5L, "late3"))
      q.processAllAvailable()
      val got = eng.sql("select uid, eid, v from st order by uid") match {
        case graft.engine.Rows(df) => df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
        case other => fail(s"$other")
      }
      // last-writer-wins despite the newest change arriving FIRST
      assert(got == Seq((1L, 30L, "newest"), (2L, 20L, "new2"),
        (3L, 5L, "late3")))
    } finally q.stop()
  }

  test("streaming tumbling agg emits finalized windows after watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = EventStreams.tumblingAgg(
      EventStreams.withEventTime(input.toDF()), "1 hour", Some("10 minutes"))
    val q = agg.writeStream.format("memory").queryName("tumbling_test")
      .outputMode("append").start()
    try {
      // two events in hour 0, one far later to advance the watermark
      input.addData(ev(1, 100, 1), ev(2, 200, 1, "view"))
      q.processAllAvailable()
      input.addData(ev(3, 100000, 1))
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .select("w_start", "event_type", "n").collect()
      // hour-0 windows are final once watermark passed; the late bucket
      // (t=100000s) is still open and unemitted
      assert(rows.length == 2)
      assert(rows.map(_.getLong(2)).sum == 2L)
    } finally q.stop()
  }

  test("q149 disorder depth prescribes the watermark: sized keeps late rows, undersized drops") {
    implicit val sq = spark.sqlContext
    // arrival order (event_id): 1000s, 4000s, then 1500s — the last
    // row lags the event-time high-water mark by 2500s. q149's batch
    // stat computes exactly that depth...
    val early = Seq(ev(1, 1000, 1), ev(2, 4000, 1))
    val late = ev(3, 1500, 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val depthSec = (early :+ late).toDF()
      .withColumn("d", max($"ts").over(w) - $"ts")
      .agg(max($"d")).collect()(0).getLong(0) / 1000000000L
    assert(depthSec == 2500L)
    // ...so a watermark above 2500s must keep the late row and one
    // below must drop it from the streaming aggregate.
    def totalCounted(watermark: String): Long = {
      val input = MemoryStream[Event]
      val agg = EventStreams.tumblingAgg(
        EventStreams.withEventTime(input.toDF()), "1 hour", Some(watermark))
      val name = s"disorder_${watermark.replaceAll("\\W", "_")}"
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(early: _*)
        q.processAllAvailable() // watermark advances to 4000s − delay
        input.addData(late)
        q.processAllAvailable()
        input.addData(ev(4, 100000, 1)) // flush: finalize hours 0 and 1
        q.processAllAvailable()
        spark.table(name).agg(sum($"n")).collect()(0).getLong(0)
      } finally q.stop()
    }
    assert(totalCounted("1 hour") == 3L) // 3600s ≥ 2500s: late row kept
    assert(totalCounted("5 minutes") == 2L) // 300s < 2500s: dropped
  }

  test("stateful sessionizer closes sessions via event-time timeout") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionizeStateful(
      EventStreams.withEventTime(input.toDF())
        .withWatermark("ts_utc", "1 minute").as[Event],
      gapMinutes = 30, emitOpen = false)
    val q = sessions.writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    try {
      // t=1000s and t=1600s: one session, 10 min apart (times kept off
      // epoch zero — the initial watermark 0 drops a t=0 row as late)
      input.addData(ev(1, 1000, 7), ev(2, 1600, 7))
      q.processAllAvailable()
      // 3 hours later: watermark passes 1600s+30min → session closes
      input.addData(ev(3, 12000, 7))
      q.processAllAvailable()
      val rows = spark.table("session_test").as[EventStreams.Session].collect()
      assert(rows.exists(s => s.user_id == 7 && s.n_events == 2
        && s.start_us == 1000000000L && s.end_us == 1600000000L))
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = EventStreams.dedupEvents(
      EventStreams.withEventTime(input.toDF()), "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 1000, 1), ev(2, 1010, 1))
      q.processAllAvailable()
      input.addData(ev(1, 1000, 1), ev(3, 1020, 1)) // event 1 re-delivered
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join matches views to clicks within lag") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val joined = EventStreams.intervalJoin(
      EventStreams.withEventTime(clicks.toDF())
        .filter($"event_type" === "click")
        .withWatermark("ts_utc", "10 minutes"),
      EventStreams.withEventTime(views.toDF())
        .filter($"event_type" === "view")
        .withWatermark("ts_utc", "10 minutes"),
      key = "user_id", timeCol = "ts_utc", maxLag = "5 minutes")
    val q = joined.select($"event_id", $"r_event_id")
      .writeStream.format("memory").queryName("ivj_test")
      .outputMode("append").start()
    try {
      views.addData(ev(10, 1000, 1, "view"), ev(11, 2000, 1, "view"),
        ev(12, 1100, 2, "view"))
      clicks.addData(ev(20, 1200, 1), // 200s after view 10 → match
        ev(21, 2900, 1),              // 900s after view 11 → outside lag
        ev(22, 1150, 2))              // user 2 → view 12
      q.processAllAvailable()
      val got = spark.table("ivj_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((20L, 10L), (22L, 12L)))
    } finally q.stop()
  }

  test("batch sessionize with emitOpen matches naive gap sessionization") {
    val evs = Seq(ev(1, 0, 1), ev(2, 100, 1), ev(3, 10000, 1),
      ev(4, 50, 2)).toDS()
    val out = EventStreams.sessionizeStateful(evs, gapMinutes = 30,
      emitOpen = true).collect().sortBy(s => (s.user_id, s.start_us))
    assert(out.length == 3)
    assert(out(0) == EventStreams.Session(1, 0L, 100000000L, 2))
    assert(out(1) == EventStreams.Session(1, 10000000000L, 10000000000L, 1))
    assert(out(2) == EventStreams.Session(2, 50000000L, 50000000L, 1))
  }

  test("stateful peak rate equals the batch RANGE-window plan on testdata") {
    val evs = Tables.events(spark, TestSpark.sfDir).as[Event]
    val got = EventStreams.peakRateStateful(evs, windowMinutes = 5)
      .collect().map(p => p.user_id -> ((p.peak_5min, p.n_events))).toMap
    val exp = operators.StreamingQueries
      .queries("q133_peak_rate")(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == exp && got.nonEmpty)
  }

  test("streaming peak rate converges to the batch answer across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.peakRateStateful(input.toDS(), windowMinutes = 5)
      .writeStream.format("memory").queryName("peak_test")
      .outputMode("update").start()
    try {
      // burst of 3 inside 5 min, then a lone event far away — split
      // across micro-batches so state eviction + monotone peak run
      input.addData(ev(1, 1000, 7), ev(2, 1100, 7))
      q.processAllAvailable()
      input.addData(ev(3, 1200, 7)) // completes the 3-burst
      q.processAllAvailable()
      input.addData(ev(4, 90000, 7)) // horizon evicts the burst
      q.processAllAvailable()
      val last = spark.table("peak_test")
        .as[EventStreams.PeakRate].collect()
        .filter(_.user_id == 7).maxBy(_.n_events)
      assert(last.peak_5min == 3 && last.n_events == 4)
    } finally q.stop()
  }

  test("file-source stream equals the batch plan on the same parquet") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    Tables.events(spark, TestSpark.sfDir).write.mode("overwrite")
      .parquet(dir)
    val stream = EventStreams.readEventStream(spark, dir)
    val q = EventStreams.tumblingAgg(stream, "1 day")
      .writeStream.trigger(Trigger.AvailableNow())
      .format("memory").queryName("file_stream_test")
      .outputMode("complete").start()
    q.awaitTermination(60000)
    val streamed = spark.table("file_stream_test")
      .collect().map(r => (r.get(0).toString, r.getString(1),
        r.getLong(2))).toSet
    val batch = EventStreams.tumblingAgg(
      EventStreams.withEventTime(Tables.events(spark, TestSpark.sfDir)),
      "1 day").collect().map(r => (r.get(0).toString, r.getString(1),
        r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stream-static enrichment broadcasts the dim into micro-batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStreams.enrichStream(
        EventStreams.withEventTime(input.toDF()), dim,
        "user_id", "user_id")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 100, 1), ev(2, 200, 2), ev(3, 300, 9))
      q.processAllAvailable()
      val rows = spark.table("enrich_test")
        .select("event_id", "d_tier").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows == Map(1L -> "gold", 2L -> "basic", 3L -> null))
    } finally q.stop()
  }

  test("batch session_window agg ends sessions at last event + gap") {
    val df = EventStreams.withEventTime(
      Seq(ev(1, 0, 1), ev(2, 60, 1), ev(3, 7200, 1)).toDF())
    val out = EventStreams.sessionAgg(df, "30 minutes")
      .orderBy("session_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2L)
    // end = last event (60s) + 30 min gap
    assert(out(0).getAs[java.sql.Timestamp]("session_end").getTime ==
      (60 + 1800) * 1000L)
  }

  test("windowed MG sketch streams incrementally; heavy hitters exact") {
    implicit val sq = spark.sqlContext
    // user 7 dominates hour 0 (12 of 20 events > 20/4); user 8's 4
    // events don't clear the threshold; hour 1 has no dominant user
    val events = (1 to 12).map(i => ev(i, 60L * i, 7)) ++
      (13 to 16).map(i => ev(i, 60L * i, 8)) ++
      (17 to 20).map(i => ev(i, 60L * i, 100 + i)) ++
      (21 to 24).map(i => ev(i, 3600 + 60L * i, 200 + i))
    val batchDf = EventStreams.withEventTime(events.toDF())
    val got = EventStreams.windowHeavyHitters(batchDf, "1 hour",
        threshDenom = 4L, cap = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((7L, 12L, 20L)))
    // the sketch PASS (the stateful part) runs as a real incremental
    // stream: same candidates + totals as the batch plan, fed in two
    // out-of-order micro-batches
    val mg = graft.functions.Sketches.mgSketchAgg(spark, 8)
    def sketchOf(df: org.apache.spark.sql.DataFrame) =
      df.select(window($"ts_utc", "1 hour").as("w"),
          $"user_id".cast("string").as("item"))
        .groupBy($"w").agg(mg($"item").as("mg"), count(lit(1)).as("n"))
        .select($"w.start".as("ws"), map_keys($"mg").as("cands"), $"n")
    val input = MemoryStream[Event]
    val q = sketchOf(EventStreams.withEventTime(input.toDF()))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    try {
      input.addData(events.take(10): _*)
      q.processAllAvailable()
      input.addData(events.drop(10): _*)
      q.processAllAvailable()
      val stream = spark.table("mg_stream").collect()
        .map(r => (r.getTimestamp(0), r.getSeq[String](1).toSet,
          r.getLong(2))).toSet
      val batch = sketchOf(batchDf).collect()
        .map(r => (r.getTimestamp(0), r.getSeq[String](1).toSet,
          r.getLong(2))).toSet
      // window totals agree exactly; candidate sets both honor the MG
      // survival guarantee (count > n/cap ⇒ survives, regardless of
      // micro-batch slicing / merge order) — which is all the exact
      // verify pass consumes
      assert(stream.map(t => (t._1, t._3)) == batch.map(t => (t._1, t._3)))
      val hour0 = stream.find(_._3 == 20L).get
      assert(hour0._2.contains("7") && hour0._2.contains("8"),
        s"MG survival violated in stream sketch: ${hour0._2}")
      val batch0 = batch.find(_._3 == 20L).get
      assert(batch0._2.contains("7") && batch0._2.contains("8"),
        s"MG survival violated in batch sketch: ${batch0._2}")
    } finally q.stop()
  }
}
