package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests of graft.Bench's record-hygiene logic (r12 verdict
  * tasks 1 + 8): the citable-record write guard, the median-rep
  * selection, and the prior-record wall parser that drives the
  * top-60 reps policy and the >1.5× mover re-measure. Pure-function
  * tests — no SparkSession. */
class BenchSpec extends AnyFunSuite {

  test("outPathFor: a loaded run is diverted from BENCH_FULL_LATEST " +
    "to BENCH_ASMEASURED; idle and explicit paths pass through") {
    val latest = "/root/repo/BENCH_FULL_LATEST.json"
    // idle → citable → requested path kept
    assert(Bench.outPathFor(latest, 0.24) == latest)
    // at the bar is still citable; strictly above is not
    assert(Bench.outPathFor(latest, Bench.CitableLoadBar) == latest)
    assert(Bench.outPathFor(latest, 5.01)
      == "/root/repo/BENCH_ASMEASURED.json")
    // unreadable loadavg gives no evidence of load → kept
    assert(Bench.outPathFor(latest, Double.NaN) == latest)
    // an explicitly chosen non-default out path is never diverted
    // (local SPARK_GRAFT_BENCH_OUT iterations aren't the record)
    assert(Bench.outPathFor("/tmp/b371.json", 9.0) == "/tmp/b371.json")
    // bare filename (no parent directory) still diverts cleanly
    assert(Bench.outPathFor("BENCH_FULL_LATEST.json", 9.0)
      == "BENCH_ASMEASURED.json")
  }

  test("load1Of parses the comma-joined loadavg; garbage is NaN") {
    assert(Bench.load1Of("0.24,0.31,0.40") == 0.24)
    assert(Bench.load1Of("5.01,4.2,3.9") == 5.01)
    assert(Bench.load1Of("unavailable").isNaN)
  }

  test("medianWall: lower median — absorbs a one-off stall without " +
    "hiding a real regression") {
    assert(Bench.medianWall(Seq(2.0)) == 2.0)
    // three reps, one stalled: the median is the honest middle
    assert(Bench.medianWall(Seq(1.1, 9.9, 1.2)) == 1.2)
    // even count takes the faster middle (documented lower median)
    assert(Bench.medianWall(Seq(4.0, 1.0, 2.0, 3.0)) == 2.0)
  }

  test("parsePriorWalls reads the flat queries map of our own record " +
    "format and ignores the nested pressure object") {
    val rec = """{"metric":"per_query_full","value":10.0,"unit":"sec",""" +
      """"queries":{"q01_pricing_summary":1.25,"q140_containment":4.51},""" +
      """"sf":"/root/testdata/sf0.1","env":{"cpus":32},""" +
      """"movers":{},"pressure":{"q01_pricing_summary":{"wall":1.25,""" +
      """"spill_mb":0,"peak_exec_mb":12,"heap_after_mb":900}}}"""
    val walls = Bench.parsePriorWalls(rec)
    assert(walls == Map("q01_pricing_summary" -> 1.25,
      "q140_containment" -> 4.51))
    // a record without a queries map (or not a record at all) → empty
    assert(Bench.parsePriorWalls("""{"metric":"total"}""").isEmpty)
    assert(Bench.parsePriorWalls("not json").isEmpty)
  }

  test("the real prior record at HEAD parses and ranks a plausible " +
    "top-60 (the reps policy's actual input)") {
    val p = java.nio.file.Paths.get("/root/repo/BENCH_FULL_LATEST.json")
    assume(java.nio.file.Files.exists(p))
    val walls = Bench.parsePriorWalls(java.nio.file.Files.readString(p))
    assert(walls.size > 100, s"only ${walls.size} walls parsed")
    val top = walls.toSeq.sortBy(-_._2).take(60)
    assert(top.head._2 >= top.last._2)
    // the known heavy family must rank inside the top-60
    assert(top.exists(_._1.startsWith("q140_")), top.take(5).toString)
  }
}
