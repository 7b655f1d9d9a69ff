package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Engine, Rows}

/** Depth stress for the recursive-CTE fixpoint (r15 verdict task 8).
  * What "holds at depth" means here, each asserted separately:
  *  - correctness: a 150-round single-successor ring closes exactly
  *    (one new node per round — the worst case for the seen-set;
  *    q409's doubling frontier closes in ~log rounds by contrast);
  *  - MEMORY flat: the loop retires superseded seen/frontier blocks
  *    every round, so the persisted-RDD census after 150 rounds is a
  *    small constant, not O(rounds) snapshots;
  *  - plan width constant: per-round planning does not re-widen with
  *    the accumulated set (the pre-r15 except-against-union-of-legs
  *    re-analyzed a D-leg union every round). The absolute per-round
  *    wall still creeps with depth from driver bookkeeping (measured
  *    ~240→900 ms across 500 rounds in one JVM — SCALING §15), so
  *    the wall bound below is generous; the structural claims are
  *    the block census and the round count, not milliseconds;
  *  - the depth cap fails by name and names the knob.
  */
class DeepRecursionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshEngine(): Engine = new Engine(spark,
    java.nio.file.Files.createTempDirectory("graft-deeprec").toString)

  test("150-round ring closes exactly with a constant persisted-block " +
    "census (UNION-distinct, frontier size 1 every round)") {
    val eng = freshEngine()
    eng.script("create scope deepring; use deepring")
    val n = 150  // the 999-round evidence lives in SCALING §15 (RingProbe)
    eng.attachTable("ring", spark.range(0, n).toDF("v")
      .select(col("v").cast("long").as("v")))
    val before = spark.sparkContext.getPersistentRDDs.size
    val t0 = System.nanoTime()
    val df = eng.sql(
      "with recursive reach as (" +
        "  select v from ring where v = 0 " +
        "  union " +
        s"  select r2.v from reach r join ring r2 " +
        s"    on r2.v = (r.v + 1) % $n) " +
        "select count(*) as cnt, sum(v) as s from reach") match {
      case Rows(d) => d
      case other => fail(s"deep ring failed: $other")
    }
    val row = df.collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    assert(row.getLong(0) == n.toLong, s"cnt=${row.getLong(0)}")
    assert(row.getLong(1) == n.toLong * (n - 1) / 2, s"s=${row.getLong(1)}")
    // memory-flat: every round created 2 checkpointed RDDs and
    // retired 2; only the final seen frame + last frontier (and
    // whatever the surrounding session already held) may remain
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 4,
      s"persisted-RDD census grew $before -> $after — the loop is " +
        "leaking round snapshots")
    assert(secs < 600.0, f"$n rounds took $secs%.1f s")
    info(f"$n-round ring closed in $secs%.1f s " +
      f"(${secs * 1000 / n}%.0f ms/round), persisted RDDs " +
      f"$before -> $after")
  }

  // r16: the fixpoint has two executions — driver-resident below the
  // broadcastSeenBytes gate (one job/round) and the distributed
  // anti-join above it — plus a mid-loop handover when the gate
  // overflows. All three must produce identical multisets.
  test("driver-resident, distributed, and mid-loop-overflow recursion " +
    "paths agree exactly (UNION and UNION ALL)") {
    val eng = freshEngine()
    eng.script("create scope modering; use modering")
    val n = 40
    eng.attachTable("ring", spark.range(0, n).toDF("v")
      .select(col("v").cast("long").as("v")))
    def run(q: String): Seq[Seq[Any]] = eng.sql(q) match {
      case Rows(d) => d.collect().toSeq.map(_.toSeq)
        .sortBy(_.mkString("|"))
      case other => fail(s"recursion failed: $other")
    }
    val distinctQ =
      "with recursive reach as (" +
        "  select v from ring where v = 0 " +
        "  union " +
        s"  select r2.v from reach r join ring r2 " +
        s"    on r2.v = (r.v + 1) % $n) " +
        "select v from reach"
    val allQ =
      "with recursive steps(v, d) as (" +
        "  select v, 0 from ring where v < 3 " +
        "  union all " +
        "  select v + 1, d + 1 from steps where d < 5) " +
        "select v, d from steps"
    def inMode(bytes: String)(q: String): Seq[Seq[Any]] = {
      spark.conf.set("graft.recursion.broadcastSeenBytes", bytes)
      try run(q)
      finally spark.conf.unset("graft.recursion.broadcastSeenBytes")
    }
    val driver = run(distinctQ)             // default gate: driver-resident
    val dist = inMode("0")(distinctQ)       // gate 0: distributed anti-join
    val mid = inMode("600")(distinctQ)      // overflows after ~some rounds
    assert(driver == dist, "driver vs distributed mismatch")
    assert(driver == mid, "driver vs mid-loop-overflow mismatch")
    assert(driver.length == n)
    val driverAll = run(allQ)
    val distAll = inMode("0")(allQ)
    val midAll = inMode("600")(allQ)
    assert(driverAll == distAll, "UNION ALL driver vs distributed")
    assert(driverAll == midAll, "UNION ALL driver vs overflow")
    assert(driverAll.length == 3 * 6)
  }

  test("depth cap fails by name and names the knob") {
    val eng = freshEngine()
    eng.script("create scope capring; use capring")
    eng.attachTable("ring", spark.range(0, 60).toDF("v"))
    spark.conf.set("graft.recursion.maxRounds", "50")
    try {
      // the fixpoint runs eagerly inside sql(); the engine surfaces
      // the cap as a failed Status carrying the named message
      eng.sql(
        "with recursive reach as (" +
          "  select v from ring where v = 0 " +
          "  union " +
          "  select r2.v from reach r join ring r2 " +
          "    on r2.v = (r.v + 1) % 60) " +
          "select count(*) as cnt from reach") match {
        case graft.engine.Status(false, msg) =>
          assert(msg.contains("graft.recursion.maxRounds"), msg)
          assert(msg.contains("50"), msg)
        case other => fail(s"expected the depth-cap failure, got $other")
      }
    } finally spark.conf.unset("graft.recursion.maxRounds")
  }
}
