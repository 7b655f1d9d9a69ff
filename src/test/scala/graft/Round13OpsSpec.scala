package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import org.apache.spark.sql.Row
import graft.engine._

/** Round-13 dialect features (r12 verdict tasks 1, 2, 5): comma FROM
  * lists, derived tables, expression-wrapped correlated scalar
  * aggregates, joins + GROUP BY inside correlated scalars (TPC-H q2's
  * shape), nested IN/EXISTS inside correlated subqueries (TPC-H
  * q20's shape), window frame specs, and ANSI substring FROM/FOR.
  * Every positive case cross-checks against the equivalent Spark SQL
  * over the same data — an independent evaluator of the same ANSI
  * semantics. */
class Round13OpsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  lazy val root = Files.createTempDirectory("graft-r13").toString
  lazy val eng: Engine = {
    val e = new Engine(spark, root)
    e.script("create scope r13; use r13").foreach {
      case Status(false, m) => fail(s"ddl failed: $m")
      case _ =>
    }
    // deterministic mini-TPC-H: 3 suppliers x 4 parts x lineitems
    val li = Seq(
      // (l_ok, l_pk, l_sk, l_qty, l_price)
      (1L, 10L, 100L, 5.0, 50.0), (1L, 11L, 101L, 30.0, 300.0),
      (2L, 10L, 100L, 40.0, 400.0), (2L, 12L, 102L, 8.0, 80.0),
      (3L, 11L, 101L, 2.0, 20.0), (3L, 11L, 102L, 45.0, 450.0),
      (4L, 12L, 100L, 9.0, 90.0), (4L, 13L, 101L, 50.0, 500.0),
      (5L, 10L, 102L, 3.0, 30.0), (5L, 13L, 100L, 44.0, 440.0))
      .toDF("l_ok", "l_pk", "l_sk", "l_qty", "l_price")
    val ord = Seq(
      (1L, "F", "1-URGENT"), (2L, "O", "2-HIGH"), (3L, "F", "3-MEDIUM"),
      (4L, "P", "2-HIGH"), (5L, "F", "1-URGENT"))
      .toDF("o_ok", "o_stat", "o_pri")
    val part = Seq(
      (10L, "Brand#1", 3, "small ring"), (11L, "Brand#2", 7, "red bolt"),
      (12L, "Brand#1", 3, "red widget"), (13L, "Brand#3", 9, "blue nut"))
      .toDF("p_pk", "p_brand", "p_size", "p_name")
    val supp = Seq((100L, 0), (101L, 1), (102L, 0))
      .toDF("s_sk", "s_nk")
    val nat = Seq((0, 0, "ALPHA"), (1, 1, "BETA"))
      .toDF("n_nk", "n_rk", "n_name")
    val reg = Seq((0, "EAST"), (1, "WEST")).toDF("r_rk", "r_name")
    Seq("li" -> li, "ord" -> ord, "part" -> part, "supp" -> supp,
      "nat" -> nat, "reg" -> reg).foreach { case (n, df) =>
      e.attachTable(n, df)
      df.createOrReplaceTempView(s"r13_$n")
    }
    e
  }

  private def run(sql: String): Seq[Row] = eng.sql(sql) match {
    case Rows(df) => df.collect().toSeq
    case other => fail(s"engine failed on [$sql]: $other")
  }
  private def sorted(rs: Seq[Row]): Seq[String] =
    rs.map(_.toString).sorted
  private def check(graftSql: String, sparkSql: String): Unit = {
    val g = sorted(run(graftSql))
    val s = sorted(spark.sql(sparkSql).collect().toSeq)
    assert(g == s, s"\nengine: $g\nspark : $s\nfor [$graftSql]")
  }
  private def failsWith(sql: String, needle: String): Unit =
    eng.sql(sql) match {
      case Status(false, m) =>
        assert(m.toLowerCase.contains(needle.toLowerCase),
          s"error [$m] should mention [$needle]")
      case other => fail(s"expected failure containing [$needle], " +
        s"got $other for [$sql]")
    }

  test("comma FROM list desugars to keyed inner joins") {
    check(
      "select o_pri, sum(l_qty) as q from ord, li " +
        "where o_ok = l_ok and o_stat = 'F' group by o_pri",
      "select o_pri, sum(l_qty) as q from r13_ord, r13_li " +
        "where o_ok = l_ok and o_stat = 'F' group by o_pri")
    // three tables with aliases, join predicates across all
    check(
      "select n_name, count(*) as n from supp s, nat n, reg r " +
        "where s.s_nk = n.n_nk and n.n_rk = r.r_rk and r.r_name = 'EAST' " +
        "group by n_name",
      "select n_name, count(*) as n from r13_supp s, r13_nat n, " +
        "r13_reg r where s.s_nk = n.n_nk and n.n_rk = r.r_rk " +
        "and r.r_name = 'EAST' group by n_name")
  }

  test("derived table in FROM binds as a transient table") {
    check(
      "select stat, count(*) as n, sum(q) as tq from " +
        "(select o_stat as stat, o_ok, " +
        "  (select sum(l_qty) from li where l_ok = o_ok) as q " +
        " from ord) t group by stat",
      "select stat, count(*) as n, sum(q) as tq from " +
        "(select o_stat as stat, o_ok, " +
        "  (select sum(l_qty) from r13_li where l_ok = o_ok) as q " +
        " from r13_ord) t group by stat")
    failsWith("select * from (select o_ok from ord)",
      "derived table needs an alias")
  }

  test("expression-wrapped correlated scalar aggregate (q17 shape)") {
    check(
      "select sum(l_price) / 7.0 as avg_yearly from li, part " +
        "where p_pk = l_pk and p_brand = 'Brand#1' and " +
        "l_qty < (select 0.5 * avg(l_qty) from li l2 " +
        "  where l2.l_pk = p_pk)",
      "select sum(l_price) / 7.0 as avg_yearly from r13_li, r13_part " +
        "where p_pk = l_pk and p_brand = 'Brand#1' and " +
        "l_qty < (select 0.5 * avg(l_qty) from r13_li l2 " +
        "  where l2.l_pk = p_pk)")
    // wrapper referencing a column is rejected by name
    failsWith(
      "select o_ok from ord where " +
        "1 < (select o_ok * avg(l_qty) from li where l_ok = o_ok)",
      "constants")
  }

  test("correlated scalar with comma-joined inner tables (q2 shape)") {
    check(
      "select s.s_sk as sk, l.l_pk as pk, l.l_price as cost " +
        "from li l, supp s, nat n where l.l_sk = s.s_sk " +
        "and s.s_nk = n.n_nk and n.n_name = 'ALPHA' and " +
        "l.l_price = (select min(l2.l_price) from li l2, supp s2, nat n2 " +
        "  where l2.l_pk = l.l_pk and l2.l_sk = s2.s_sk " +
        "  and s2.s_nk = n2.n_nk and n2.n_name = 'ALPHA')",
      "select s.s_sk as sk, l.l_pk as pk, l.l_price as cost " +
        "from r13_li l, r13_supp s, r13_nat n where l.l_sk = s.s_sk " +
        "and s.s_nk = n.n_nk and n.n_name = 'ALPHA' and " +
        "l.l_price = (select min(l2.l_price) from r13_li l2, " +
        "  r13_supp s2, r13_nat n2 " +
        "  where l2.l_pk = l.l_pk and l2.l_sk = s2.s_sk " +
        "  and s2.s_nk = n2.n_nk and n2.n_name = 'ALPHA')")
  }

  test("GROUP BY inside a correlated scalar: keys ok, others named") {
    check(
      "select o_ok from ord where " +
        "3 < (select count(*) from li where l_ok = o_ok group by l_ok)",
      "select o_ok from r13_ord where " +
        "3 < (select count(*) from r13_li where l_ok = o_ok " +
        "group by l_ok)")
    failsWith(
      "select o_ok from ord where " +
        "3 < (select count(*) from li where l_ok = o_ok group by l_pk)",
      "correlation keys")
  }

  test("nested IN/EXISTS inside a correlated subquery (q20 shape)") {
    // uncorrelated IN nested in a correlated EXISTS
    check(
      "select o_ok from ord o where exists (select 1 from li " +
        "where li.l_ok = o.o_ok and li.l_pk in " +
        "  (select p_pk from part where p_brand = 'Brand#1'))",
      "select o_ok from r13_ord o where exists (select 1 from r13_li " +
        "where r13_li.l_ok = o.o_ok and r13_li.l_pk in " +
        "  (select p_pk from r13_part where p_brand = 'Brand#1'))")
    // correlated-to-own-scope EXISTS nested inside a correlated IN
    check(
      "select o_ok from ord o where o_ok in (select l_ok from li " +
        "where li.l_qty > 40 and exists (select 1 from li l2 " +
        "  where l2.l_ok = li.l_ok and l2.l_qty < 5))",
      "select o_ok from r13_ord o where o_ok in (select l_ok from " +
        "r13_li where r13_li.l_qty > 40 and exists (select 1 from " +
        "r13_li l2 where l2.l_ok = r13_li.l_ok and l2.l_qty < 5))")
    // reaching the outermost scope from the nested level stays a
    // named rejection
    failsWith(
      "select o_ok from ord o where exists (select 1 from li " +
        "where li.l_ok = o.o_ok and li.l_pk in " +
        "  (select p_pk from part where p_size = o.o_ok))",
      "outermost")
  }

  test("window frames: ROWS/RANGE BETWEEN map to Spark frames") {
    check(
      "select l_ok, l_pk, avg(l_qty) over (partition by l_sk " +
        "order by l_pk, l_ok rows between 2 preceding and current row) " +
        "as ma from li",
      "select l_ok, l_pk, avg(l_qty) over (partition by l_sk " +
        "order by l_pk, l_ok rows between 2 preceding and current row) " +
        "as ma from r13_li")
    check(
      "select l_ok, sum(l_qty) over (partition by l_sk order by l_pk " +
        "range between 1 preceding and 1 following) as s from li",
      "select l_ok, sum(l_qty) over (partition by l_sk order by l_pk " +
        "range between 1 preceding and 1 following) as s from r13_li")
    // single-bound shorthand == BETWEEN n PRECEDING AND CURRENT ROW
    check(
      "select l_ok, sum(l_qty) over (partition by l_sk order by l_pk, " +
        "l_ok rows 1 preceding) as s from li",
      "select l_ok, sum(l_qty) over (partition by l_sk order by l_pk, " +
        "l_ok rows between 1 preceding and current row) as s " +
        "from r13_li")
    // unbounded both ways
    check(
      "select l_ok, sum(l_qty) over (partition by l_sk order by l_pk " +
        "rows between unbounded preceding and unbounded following) " +
        "as s from li",
      "select l_ok, sum(l_qty) over (partition by l_sk) as s " +
        "from r13_li")
    failsWith(
      "select rank() over (order by l_pk rows between 1 preceding " +
        "and current row) from li",
      "does not accept an explicit window frame")
    failsWith(
      "select sum(l_qty) over (partition by l_sk rows between " +
        "1 preceding and current row) from li",
      "requires ORDER BY")
  }

  test("GROUP BY expressions, select aliases and expression ordinals") {
    // expression key matching a select item (named by that item)
    check(
      "select l_pk % 3 as kk, count(*) as n from li group by l_pk % 3",
      "select l_pk % 3 as kk, count(*) as n from r13_li " +
        "group by l_pk % 3")
    // select-ALIAS as the group key
    check(
      "select l_pk % 3 as kk, sum(l_qty) as q from li group by kk",
      "select l_pk % 3 as kk, sum(l_qty) as q from r13_li group by kk")
    // TPC-H q22's official spelling: the substring directly in both
    // the select list and GROUP BY
    check(
      "select substring(p_name from 1 for 3) as pre, count(*) as n " +
        "from part group by substring(p_name from 1 for 3) " +
        "order by pre",
      "select substring(p_name from 1 for 3) as pre, count(*) as n " +
        "from r13_part group by substring(p_name from 1 for 3) " +
        "order by pre")
    // grouped-but-unprojected expression key
    check(
      "select count(*) as n from li group by l_pk % 4",
      "select count(*) as n from r13_li group by l_pk % 4")
    // ordinal resolving to an expression item
    check(
      "select l_pk % 3 as kk, count(*) as n from li group by 1",
      "select l_pk % 3 as kk, count(*) as n from r13_li group by 1")
    // group-no-agg distinct fast path over an expression key
    check(
      "select l_pk % 3 as kk from li group by l_pk % 3",
      "select distinct l_pk % 3 as kk from r13_li")
    // grouping by an alias of an aggregate is rejected by name
    failsWith("select count(*) as n from li group by n", "aggregate")
  }

  test("ANSI substring FROM/FOR and the substring alias") {
    check(
      "select p_pk, substring(p_name from 1 for 3) as pre from part",
      "select p_pk, substring(p_name from 1 for 3) as pre " +
        "from r13_part")
    check("select substring('abcdef' from 3) as t",
      "select 'cdef' as t")
    check("select substring('abcdef', 2, 3) as t",
      "select 'bcd' as t")
  }
}
