package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-query pressure meter (r8 verdict ask #6): accumulates shuffle/
  * agg spill bytes and peak execution memory across the stages of the
  * current query window, so a driver-vs-clean-box wall-time divergence
  * is diagnosable from the bench record alone (is the late-suite 2×
  * an operator regression or executor-memory pressure?). Stage-level
  * aggregates only — no per-task state. */
private final class PressureListener extends SparkListener {
  private val spillB = new java.util.concurrent.atomic.AtomicLong(0)
  private val peakB = new java.util.concurrent.atomic.AtomicLong(0)
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      spillB.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      peakB.updateAndGet(p => math.max(p, m.peakExecutionMemory))
    }
  }
  /** Drain the window: returns (spillBytes, peakExecMemBytes), zeroed
    * for the next query. */
  def drain(): (Long, Long) = (spillB.getAndSet(0), peakB.getAndSet(0))
}

/** Benchmark main: runs every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR`, forcing FULL evaluation through the noop
  * sink (`.count()` would let Catalyst prune projections and
  * undercount the real work), and prints one JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  */
object Bench {
  /** 1/5/15-min system load from /proc/loadavg — the one env fact that
    * separates a real plan regression from a loaded-box artifact (r10
    * verdict: a 2.9× phantom regression traced to recorded load). A
    * record whose load₁ at start is ≳ 4 on this 32-cpu box is
    * non-citable for cross-round comparisons. */
  private def loadavg: String =
    try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg"))
      .split(" ").take(3).mkString(",")
    catch { case _: Throwable => "unavailable" }

  /** load₁ out of the comma-joined loadavg string; NaN when the
    * proc read failed (treated as citable — no evidence of load). */
  private[graft] def load1Of(loadStr: String): Double =
    try loadStr.split(",")(0).toDouble
    catch { case _: Throwable => Double.NaN }

  /** The citability bar (r11 verdict rule): start load₁ above this on
    * the 32-cpu box marks the record non-citable. */
  private[graft] val CitableLoadBar = 4.0

  /** r12 verdict task 8: a loaded run must NOT overwrite the citable
    * BENCH_FULL_LATEST record (the r11 driver rerun clobbered the
    * working-tree copy and only git history preserved it). A
    * non-citable run writes the sibling BENCH_ASMEASURED.json
    * instead; explicit non-default out paths are left alone. */
  private[graft] def outPathFor(requested: String,
                                load1: Double): String = {
    val p = java.nio.file.Paths.get(requested)
    val isLatest = Option(p.getFileName)
      .exists(_.toString == "BENCH_FULL_LATEST.json")
    if (isLatest && !load1.isNaN && load1 > CitableLoadBar)
      Option(p.getParent).map(_.resolve("BENCH_ASMEASURED.json"))
        .getOrElse(java.nio.file.Paths.get("BENCH_ASMEASURED.json"))
        .toString
    else requested
  }

  /** Lower median of the successful rep walls (odd count → the true
    * median; even → the faster middle, biasing against counting a
    * one-off stall). reps=1 → the value itself. */
  private[graft] def medianWall(walls: Seq[Double]): Double = {
    val s = walls.sorted
    s((s.size - 1) / 2)
  }

  /** Parse the per-query wall map out of a prior bench record — the
    * flat `"queries":{"name":sec,…}` object our own writer emits (no
    * JSON lib on the unmanaged classpath; the format is ours). */
  private[graft] def parsePriorWalls(json: String): Map[String, Double] = {
    val start = json.indexOf("\"queries\":{")
    if (start < 0) Map.empty
    else {
      val body = json.substring(start + 11,
        json.indexOf('}', start + 11).max(start + 11))
      "\"([^\"]+)\":([0-9.]+)".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  }

  def main(args: Array[String]): Unit = {
    val loadStart = loadavg
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE decouples shuffle parallelism from executor
    // threads for the scale decades (SCALING §11: partition count must
    // scale WITH the data, the way a real cluster would be sized)
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Long-lived-driver hygiene (SCALING §15.1: the in-memory app
      // status store retains 1000 jobs/stages/executions by default
      // and its bookkeeping grows per-round cost measurably — capping
      // it cut a 360-round recursion's wall ~22%). A 422-query suite
      // at reps 2-3 runs thousands of executions through ONE driver;
      // the same caps are standard practice for any long-running
      // production driver, nothing local-mode about them. Timing
      // methodology (noop sink, per-query windows) is unchanged.
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.sql.ui.retainedExecutions", "50")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Bench consumes every query exactly once (the noop write), so the
    // dedup operators' eager seal (persist + count + unpersist legs)
    // would only add a second full materialization per query — opt out
    // and let the single write drive the persisted legs directly.
    spark.conf.set("spark.graft.sealResults", "false")

    // warm up session machinery (codegen, shuffle, parquet readers)
    // with a real scan+aggregate so the first measured query doesn't
    // pay one-time JVM costs
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).schema)

    // local-iteration knobs (unset in driver runs): SPARK_GRAFT_ONLY
    // is a comma-separated substring filter, SPARK_GRAFT_REPS forces a
    // uniform rep count for every query (overrides the top-60 policy).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq).getOrElse(Nil)
    val forcedReps = sys.env.get("SPARK_GRAFT_REPS")
      .map(r => math.max(1, r.toInt))
    // r12 verdict task 1: reps=1 manufactures ±50% phantom per-query
    // moves between idle runs (q168 3.1–4.9 s across four citable
    // records with no code change). Policy: the TOP-60 queries of the
    // prior citable record — the ones every regression verdict reads —
    // run at reps=3 and report the median; the long tail (and queries
    // with no prior, which are cheap until measured once) stays reps=1.
    val priorPath = sys.env.getOrElse("SPARK_GRAFT_PRIOR",
      "/root/repo/BENCH_FULL_LATEST.json")
    val priorWalls: Map[String, Double] =
      try parsePriorWalls(java.nio.file.Files.readString(
        java.nio.file.Paths.get(priorPath)))
      catch { case _: Throwable => Map.empty }
    val topN = sys.env.getOrElse("SPARK_GRAFT_TOPN", "60").toInt
    // r13 (verdict task 3): the reps=3 net widens from the top-N to
    // EVERY query whose prior citable wall is ≥1.0 s — an 18-query
    // tail of >1.5× movers sat under the reps=1 noise floor in the
    // r17-vs-r15 comparison, where a real small-query regression
    // could hide. Sub-second queries stay reps=1: their wall is
    // fixed-overhead dominated and the isolated re-measure (below,
    // now uncapped) catches any genuine mover among them.
    val topSet: Set[String] = priorWalls.toSeq.sortBy(-_._2)
      .take(topN).map(_._1).toSet ++
      priorWalls.collect { case (n, w) if w >= 1.0 => n }
    // r14 (verdict task 5): the tail floor rises from reps=1 to
    // reps=2 — ten refuted suite movers >2× in the r18 record all
    // traced to reps=1 tail variance; the lower-median of two reps
    // retires that noise source for ~+6 min of wall
    def repsFor(name: String): Int =
      forcedReps.getOrElse(if (topSet(name)) 3 else 2)
    // Suite order: the heaviest shuffle-spill queries run FIRST, the
    // rest alphabetically. The r8 driver record showed late-running
    // heavy queries paying 1.6–2.3× under accumulated bench-process
    // pressure that a clean box doesn't show (q140 8.0 s driver vs
    // 4.3–5.2 s clean); fronting them decouples their grade from
    // suite position. Timing is still per-query (cache cleared + GC
    // between queries), so order changes WHEN a query runs, not what
    // it does.
    val fronted = Seq("q140_", "q168_", "q113_", "q134_", "q226_",
      "q195_", "q44_", "q290_", "q196_", "q267_")
    val selected = SparkEntry.queries.toSeq.sortBy { case (name, _) =>
      val p = fronted.indexWhere(name.startsWith)
      (if (p >= 0) p else fronted.length, name)
    }.filter {
      case (name, _) => only.isEmpty || only.exists(name.contains)
    }
    val pressure = new PressureListener
    spark.sparkContext.addSparkListener(pressure)
    // listener events are posted async; drain only after the bus
    // settles so spill attribution lands on the right query (private
    // API via reflection, best-effort — a miss skews attribution by
    // at most one stage, never the wall time)
    val busWait: () => Unit = {
      try {
        val busM = spark.sparkContext.getClass.getMethod("listenerBus")
        val bus = busM.invoke(spark.sparkContext)
        val wM = bus.getClass.getMethods
          .find(m => m.getName == "waitUntilEmpty"
            && m.getParameterCount == 0)
        () => wM.foreach(_.invoke(bus))
      } catch { case _: Throwable => () => () }
    }
    // Per-query warmup at a smaller scale factor (disable with
    // SPARK_GRAFT_WARM=0): each query's first execution pays seconds of
    // Janino whole-stage-codegen compilation and JIT that a C engine —
    // or the 1000-executor deployment this models, where codegen
    // compiles once per executor lifetime — never re-pays per query.
    // sf0.01 (not the smallest) so the size-adaptive operators (dense⇄
    // prefix-filter Jaccard, union-find⇄distributed clustering) pick
    // the SAME physical path they take at the timed scale and its
    // generated classes get compiled. Skipped entirely if the sf
    // substitution doesn't apply (never warm at full scale).
    if (sys.env.getOrElse("SPARK_GRAFT_WARM", "1") != "0") {
      val base = sfDir.replaceAll("/+$", "")
      val warmDir = base.replaceAll("sf[0-9.]+$", "sf0.01")
      if (warmDir != base) selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    // r14 (verdict task 6): memoized shared artifacts (span sets, LSH
    // pair/cluster sets, IVF assignments, the standard perceptron,
    // co-occurrence edges) are built HERE and billed as their own
    // named rows — suite rows then measure steady-state query cost
    // instead of whichever consumer runs first absorbing a
    // multi-second build (q377's suite wall swung 0.36→5.88 s with
    // suite order). Name-sorted so layered artifacts (pairs →
    // clusters) each bill their own increment.
    // Subset runs (SPARK_GRAFT_ONLY) pre-build too — only the packs
    // the selection touches (advice finding: skipping prebuilds under
    // `only` re-absorbed builds into the first consumer's wall, the
    // exact q377-style swing this pass was built to remove). A failed
    // build is recorded with a NEGATIVE wall so the JSON shows its
    // cost silently moved back onto a suite row, instead of billing a
    // clean-looking row for an artifact that doesn't exist.
    val builds: Seq[(String, Double)] = {
      val pb =
        if (only.isEmpty) SparkEntry.prebuilds
        else SparkEntry.prebuildsFor(selected.map(_._1).toSet)
      pb.toSeq.sortBy(_._1).map { case (n, fn) =>
        val t0 = System.nanoTime()
        val failed =
          try { fn(spark, sfDir); false }
          catch { case e: Throwable =>
            System.err.println(
              s"[bench] prebuild $n failed: ${e.getMessage}")
            true
          }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        n -> (if (failed) -dt else dt)
      }
    }

    // settle the warmup's + prebuilds' listener traffic so the first
    // timed query's pressure window starts clean
    busWait(); pressure.drain()
    // per-rep (wall, spill, peak); the reported tuple is the one FROM
    // the median rep, so the pressure record belongs to the run that
    // produced the recorded wall (review finding: mixing metrics from
    // different reps). Median, not min (r12 task 1): min hides real
    // cost; median absorbs a one-off GC/JIT stall without hiding a
    // plan regression.
    def measure(name: String, fn: (SparkSession, String) => org.apache
        .spark.sql.DataFrame, reps: Int): (Double, Long, Long) = {
      val repRuns = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        val failed =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            false
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            true
          }
        // a failure must not be selectable as the recorded wall
        val dt = if (failed) 1e9 else (System.nanoTime() - t0) / 1e9
        busWait()
        val (sp, pk) = pressure.drain()
        // operators persist reused intermediates for the duration of
        // their query; drop them (plus any leftover checkpoint RDD
        // blocks) and let the JVM settle so late queries aren't taxed
        // for earlier queries' garbage — all outside the timed window
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        (dt, sp, pk)
      }
      val ok = repRuns.filter(_._1 < 1e9)
      if (ok.isEmpty) repRuns.head
      else {
        val mw = medianWall(ok.map(_._1))
        ok.find(_._1 == mw).get
      }
    }
    val results = selected.map {
      case (name, fn) =>
        val m = measure(name, fn, repsFor(name))
        val rt = Runtime.getRuntime
        val heapMb = (rt.totalMemory() - rt.freeMemory()) / 1048576
        name -> ((m._1, m._2 / 1048576, m._3 / 1048576, heapMb))
    }
    // r12 task 1, second half: any query whose suite number moved
    // >1.5× vs the prior citable record in EITHER direction gets an
    // ISOLATED reps=3 re-measure after the suite (fresh caches, box
    // already settled), and the record carries BOTH numbers — a real
    // regression reproduces isolated, a suite-environment artifact
    // does not. Tiny walls (<0.3 s prior) are fixed-overhead noise and
    // skipped. r13 (verdict task 3): the list is NO LONGER capped —
    // every >1.5× mover gets an isolated number, so a regression
    // can't hide behind eleven larger noise movers.
    val movers: Seq[(String, Double, Double)] =
      if (forcedReps.isDefined || only.nonEmpty) Seq.empty
      else results.flatMap { case (name, (wall, _, _, _)) =>
        priorWalls.get(name).collect {
          case prior if prior >= 0.3 && wall < 1e8 &&
            (wall > prior * 1.5 || wall < prior / 1.5) =>
            (name, prior, wall)
        }
      }.sortBy { case (_, p, w) => -math.max(w / p, p / w) }
    val isolated: Map[String, Double] = movers.map {
      case (name, _, _) =>
        name -> measure(name, SparkEntry.queries(name), 3)._1
    }.toMap
    val qs = results.map { case (k, v) => "\"" + k + f"\":${v._1}%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    // Verbose record first (full query names, for humans and
    // BENCH_LOCAL archives). "per_query_*" metric names (not a
    // "total" prefix): exactly ONE line in the whole output carries
    // metric=total — the final total-only line — so any consumer
    // keying or substring-matching on it can never double-count.
    val fullLine =
      f"""{"metric":"per_query_full","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(fullLine)
    // The driver keeps only a ~2000-char tail of stdout, which at 200+
    // queries truncates every per-query map (r7 verdict: 67 queries
    // unregressable). Durable channel: land the FULL record plus the
    // run environment (disk free / heap / cpus — suite-order artifacts
    // like r7's spill cascade are diagnosable only with these) as a
    // file in the repo working tree, where the next round commits it.
    try {
      val rt = Runtime.getRuntime
      val disk = new java.io.File(
        System.getProperty("java.io.tmpdir", "/tmp"))
      val env = f"""{"cpus":${rt.availableProcessors()},""" +
        f""""max_heap_mb":${rt.maxMemory() / 1048576},""" +
        f""""tmp_free_gb":${disk.getFreeSpace / 1e9}%.1f,""" +
        f""""tmp_total_gb":${disk.getTotalSpace / 1e9}%.1f,""" +
        f""""reps":"${forcedReps.map(_.toString)
          .getOrElse(s"top$topN=3,tail=2")}",""" +
        f""""top_n":$topN,"prior":"${if (priorWalls.isEmpty) "none"
          else priorPath}",""" +
        f""""warm":"${sys.env.getOrElse("SPARK_GRAFT_WARM", "1")}",""" +
        f""""loadavg_start":"$loadStart","loadavg_end":"$loadavg"}"""
      // >1.5× movers vs the prior citable record, each with its
      // post-suite isolated reps=3 median — the record refutes or
      // confirms its own outliers. r15 (verdict task 2): an isolated
      // number that CONFIRMS the move (still >1.5× prior) is flagged
      // `confirmed` and the record names the fresh-JVM chase command
      // — the post-suite isolated re-measure runs on a box that just
      // absorbed 400+ queries, and the r19 trio (q127/q232/q185) was
      // refuted exactly by a fresh-idle re-run (SCALING §15), so a
      // confirmed flag means "adjudicate in a fresh JVM", never
      // "regression proven".
      val moverJson = movers.map { case (name, prior, wall) =>
        val iso = isolated(name)
        val confirmed = iso > prior * 1.5 || iso < prior / 1.5
        "\"" + name + f"""\":{"prior":$prior%.3f,"suite":$wall%.3f,""" +
          f""""isolated":$iso%.3f,"confirmed":$confirmed}"""
      }.mkString("{", ",", "}")
      val confirmedMovers = movers.collect {
        case (name, prior, _)
          if isolated(name) > prior * 1.5 || isolated(name) < prior / 1.5
          => name
      }
      if (confirmedMovers.nonEmpty)
        System.err.println("[bench] isolated-confirmed movers — " +
          "adjudicate in a fresh idle JVM with: SPARK_GRAFT_ONLY=" +
          confirmedMovers.mkString(",") + " SPARK_GRAFT_REPS=3 " +
          "sbt \"runMain graft.Bench\"")
      // separately billed memoized-artifact builds (r14 task 6)
      val buildJson = builds.map { case (n, w) =>
        "\"" + n + f"\":$w%.3f" }.mkString("{", ",", "}")
      val outReq = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "/root/repo/BENCH_FULL_LATEST.json")
      // r12 task 8: a loaded run never clobbers the citable record
      val out = outPathFor(outReq, load1Of(loadStart))
      if (out != outReq)
        System.err.println(s"[bench] loadavg_start $loadStart exceeds " +
          s"the citable bar $CitableLoadBar — writing $out instead " +
          s"of $outReq")
      // per-query pressure map (r8 verdict ask #6): wall sec, spill MB
      // (memory+disk, all stages in the query window), peak execution
      // memory MB (max stage aggregate), driver heap MB after the
      // post-query GC — the four numbers that separate "this plan
      // regressed" from "the suite environment squeezed this query"
      val press = results.map { case (k, (w, sp, pk, hp)) =>
        "\"" + k + f"""\":{"wall":$w%.3f,"spill_mb":$sp,""" +
          f""""peak_exec_mb":$pk,"heap_after_mb":$hp}"""
      }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        fullLine.dropRight(1) +
          s""","env":$env,"movers":$moverJson,"builds":$buildJson,""" +
          s""""pressure":$press}\n""")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] full-record write skipped: $e")
    }
    // … then a COMPACT line (qNN keys) as the final stdout line: the
    // driver keeps only the last ~2000 chars of output, and the
    // verbose line with ~90 full names (~2700 chars) gets its head cut
    // off there, so its JSON never parses. The compact line stays
    // ~1200 chars — whole line inside the tail window — and is the
    // last "{"-prefixed line, so either first- or last-match parsing
    // finds a complete JSON object.
    val shortQs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + f"\":${v._1}%.3f"
    }.mkString("{", ",", "}")
    println(f"""{"metric":"per_query_compact","value":$total%.3f,"unit":"sec","queries":$shortQs,"sf":"$sfDir"}""")
    // At 170+ queries even the compact line outgrew the driver's
    // ~2000-char tail window (r5 recorded parsed:null). The total-only
    // line is always a complete object inside the tail.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"sf":"$sfDir"}""")
    // … and a SLOWEST-40 line last (~600 chars, fits the tail window
    // together with the total line): with the full maps overflowing
    // the tail window, driver-side regressions in the heavy queries
    // were invisible (r6 finding) — 40 entries reach below the 1 s
    // mark, so every query that could regress past 2 s is always in
    // the driver record (the complete map lands in
    // BENCH_FULL_LATEST.json). `value` repeats the total so a
    // last-line JSON consumer still reads the headline number.
    val top = results.sortBy(-_._2._1).take(40).map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + f"\":${v._1}%.3f"
    }.mkString("{", ",", "}")
    println(f"""{"metric":"slowest","value":$total%.3f,"unit":"sec","top":$top,"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
