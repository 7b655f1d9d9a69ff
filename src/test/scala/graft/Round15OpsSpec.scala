package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import org.apache.spark.sql.Row
import graft.engine._

/** Round-15 dialect features (r14 verdict tasks 4, 6, 7 + advice):
  * SAMPLE/TABLESAMPLE (deterministic hash-mod sampling with named
  * rejections), window partition/order keys as full expressions (the
  * TPC-DS q36 rank-by-ratio shape), uniform derived-alias collision
  * handling across join spellings, and the hidden-recursion-through-
  * a-view rejection. */
class Round15OpsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  lazy val root = Files.createTempDirectory("graft-r15").toString
  lazy val eng: Engine = {
    val e = new Engine(spark, root)
    e.script("create scope r15; use r15").foreach {
      case Status(false, m) => fail(s"ddl failed: $m")
      case _ =>
    }
    val rows = (0L until 200L).map(k => (k, s"s${k % 7}", k * 3 % 11))
      .toDF("id", "tag", "x")
    e.attachTable("rows", rows)
    // non-integer-first-column table for the default-key rejection
    e.attachTable("srows", rows.select($"tag", $"id"))
    e
  }

  private def run(sql: String): Seq[Row] = eng.sql(sql) match {
    case Rows(df) => df.collect().toSeq
    case other => fail(s"engine failed on [$sql]: $other")
  }
  private def failMsg(sql: String): String = {
    val e = intercept[Exception](eng.sql(sql) match {
      case Rows(df) => df.collect()
      case Status(false, m) => throw new IllegalArgumentException(m)
      case other => fail(s"unexpected: $other")
    })
    e.getMessage
  }

  test("SAMPLE keeps exactly the hash-mod rows, deterministically, " +
    "across both spellings and the default key") {
    val expect = (0L until 200L)
      .filter(k => math.floorMod(k * 2654435761L, 100L) < 10)
    def ids(rs: Seq[Row]): Seq[Long] = rs.map(_.getLong(0)).sorted
    val s1 = ids(run("select id from rows sample 10 on id"))
    assert(s1 == expect, s"sample 10: $s1")
    // PERCENT noise word + default key (first column, integral)
    val s2 = ids(run("select id from rows sample 10 percent"))
    assert(s2 == expect)
    // ANSI spelling
    val s3 = ids(run(
      "select id from rows tablesample (10 percent) on id"))
    assert(s3 == expect)
    // run-to-run determinism (the REASON this is hash-mod, not
    // .sample): same rows every time
    assert(ids(run("select id from rows sample 10 on id")) == expect)
    // composes with WHERE (sample applies to the scan, filter after)
    val s4 = ids(run("select id from rows sample 10 on id where id > 50"))
    assert(s4 == expect.filter(_ > 50))
  }

  test("SAMPLE rejections are named: out-of-range pct, non-integer " +
    "default key, unknown/foreign key column") {
    assert(failMsg("select id from rows sample 0").contains("between"))
    assert(failMsg("select id from rows sample 100").contains("between"))
    assert(failMsg("select id from rows tablesample (0 percent)")
      .contains("between"))
    val m1 = failMsg("select tag from srows sample 10")
    assert(m1.contains("integer key"), m1)
    val m2 = failMsg("select id from rows sample 10 on nosuch")
    assert(m2.contains("no such column"), m2)
    val m3 = failMsg(
      "select id from rows r sample 10 on q.id where r.id > 0")
    assert(m3.contains("base FROM table"), m3)
  }

  test("window partition/order keys take full expressions " +
    "(rank over a computed ratio — the TPC-DS q36 shape)") {
    val text =
      "with g as (select tag, x % 2 as par, sum(id) as s, " +
        "count(*) as c from rows group by tag, x % 2) " +
        "select tag, par, rank() over (partition by par * 1 " +
        "order by %RATIO% desc, tag) as rk from g"
    val got = run(text.replace("%RATIO%", "tofloat(s) / c"))
    // cross-check with Spark SQL — an independent evaluator of the
    // same window semantics on the same data
    eng.tableDf("rows").createOrReplaceTempView("r15_rows")
    val want = spark.sql(
      ("with g as (select tag, x % 2 as par, sum(id) as s, " +
        "count(*) as c from r15_rows group by tag, x % 2) " +
        "select tag, par, cast(rank() over (partition by par * 1 " +
        "order by cast(s as double) / c desc, tag) as long) as rk " +
        "from g")).collect().toSeq
    assert(got.map(_.toString).sorted == want.map(_.toString).sorted)
  }

  test("derived-alias collision is uniform across join spellings: " +
    "comma-list reuse of a derived alias works like JOIN; a real " +
    "collision rejects in both") {
    // both desugar to the same inner join — before r15 the comma
    // spelling was rejected as a collision while JOIN was allowed
    val viaJoin = run(
      "select count(*) as n from (select id from rows where id < 5) d " +
        "join d e on e.id = d.id")
    val viaComma = run(
      "select count(*) as n from (select id from rows where id < 5) d, " +
        "d e where e.id = d.id")
    assert(viaJoin.head.getLong(0) == 5L)
    assert(viaComma.head.getLong(0) == 5L)
    // a REAL collision (derived alias equal to a real table's ALIAS)
    // still rejects — in both spellings
    val mJoin = failMsg(
      "select count(*) as n from (select id from rows) d " +
        "join rows d on d.id = d.id")
    assert(mJoin.contains("collides"), mJoin)
    val mComma = failMsg(
      "select count(*) as n from (select id from rows) d, rows d " +
        "where d.id = d.id")
    assert(mComma.contains("collides"), mComma)
    // an UNALIASED reuse re-exposes the derived name itself
    // (duplicate exposed correlation name) — rejected in BOTH
    // spellings, completing the uniformity the advice asked for
    val mU1 = failMsg(
      "select count(*) as n from (select id from rows) d " +
        "join d on d.id = d.id")
    assert(mU1.contains("collides"), mU1)
    val mU2 = failMsg(
      "select count(*) as n from (select id from rows) d, d " +
        "where d.id = d.id")
    assert(mU2.contains("collides"), mU2)
  }

  test("hidden recursion through a stored view is rejected by name") {
    // CREATE VIEW validates its body eagerly, so give it a REAL
    // table named `deep` to resolve against — the recursive CTE of
    // the same name then SHADOWS it through cteBindings at build
    // time, which is precisely the hidden-recursion hazard: the view
    // would silently read the frontier instead of the table
    eng.attachTable("deep", Seq(0L).toDF("v"))
    eng.sql("create view vhid as select v + 1 as v from deep")
    // a view whose body reads the recursive CTE name: the syntactic
    // linearity scan can't see it — the transitive view walk must
    val m = failMsg(
      "with recursive deep as (" +
        "  select id as v from rows where id = 0 " +
        "  union all " +
        "  select d.v + 1 as v from deep d " +
        "  join vhid h on h.v = d.v + 1 where d.v < 5) " +
        "select count(*) as n from deep")
    assert(m.contains("view") && m.contains("hidden recursion"), m)
  }
}
