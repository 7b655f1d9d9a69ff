package graft

import org.apache.spark.sql.SparkSession

/** Depth probe for the recursive-CTE fixpoint (r15 verdict task 8):
  * drives an N-node single-successor ring — one new node per round,
  * the worst case for UNION-distinct recursion — through the engine
  * and reports wall clock per round. The per-round series (printed
  * every 30 rounds via `graft.recursion.debugRounds`) is the SCALING
  * §15 evidence: plan width and persisted-block census stay constant
  * with depth, while absolute per-round wall creeps from driver
  * bookkeeping accumulation in a long-lived context.
  *
  * Usage: `sbt "runMain graft.RingProbe 999"`. Env knobs: WSCG/AQE
  * ("false" to disable codegen / adaptive execution), ABJT (auto
  * broadcast threshold) — used to attribute the per-round floor.
  */
object RingProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("WSCG", "true"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("AQE", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("ABJT", "10485760"))
      .config("spark.ui.retainedJobs",
        sys.env.getOrElse("RETJ", "1000"))
      .config("spark.ui.retainedStages",
        sys.env.getOrElse("RETS", "1000"))
      .config("spark.sql.ui.retainedExecutions",
        sys.env.getOrElse("RETE", "1000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eng = new graft.engine.Engine(spark,
      java.nio.file.Files.createTempDirectory("ringprobe").toString)
    eng.script("create scope rp; use rp")
    spark.conf.set("graft.recursion.debugRounds", "true")
    val n = args.headOption.map(_.toInt).getOrElse(120)
    eng.attachTable("ring", spark.range(0, n).toDF("v"))
    val t0 = System.nanoTime()
    eng.sql(
      s"with recursive reach as (select v from ring where v = 0 union " +
        s"select r2.v from reach r join ring r2 on r2.v = (r.v + 1) % $n) " +
        "select count(*) as c from reach") match {
      case graft.engine.Rows(df) =>
        val c = df.collect().head.getLong(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"RINGPROBE n=$n count=$c wall=$dt%.1f s " +
          f"perRound=${dt * 1000 / n}%.0f ms persistedRdds=" +
          s"${spark.sparkContext.getPersistentRDDs.size}")
      case other => println(s"fail $other")
    }
    spark.stop()
  }
}
