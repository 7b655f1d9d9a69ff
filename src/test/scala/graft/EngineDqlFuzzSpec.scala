package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Engine, Rows}

/** Statement-level differential fuzzing: random SELECTs (projection,
  * WHERE, GROUP BY, HAVING, ORDER BY, LIMIT compositions) run through
  * the FULL NowDB-dialect path (Parser → Engine.buildSelect →
  * Catalyst) and through Spark SQL's own parser on the same data —
  * two independent front-ends, one expected answer. Complements
  * FormulaPropertySpec (expression-level) with clause-composition
  * coverage: alias scoping, HAVING over aliased aggregates, ORDER/
  * LIMIT interaction. Restricted to the subset where dialect
  * semantics equal ANSI (always GROUP BY — nowdb's empty-global-agg
  * conventions differ by design; no int/int division — QUOT differs
  * by design and is covered by q75/FormulaPropertySpec).
  */
class EngineDqlFuzzSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("150 random DQL clause compositions: dialect engine == Spark SQL") {
    val rnd = new scala.util.Random(4242)
    val data = (0 until 400).map { i =>
      (i.toLong % 11, rnd.nextInt(100).toLong,
        math.rint(rnd.nextDouble() * 10000) / 100.0, "s" + (i % 7))
    }
    val df = data.toDF("k", "a", "b", "s")
    val eng = new Engine(spark,
      java.nio.file.Files.createTempDirectory("dql-fuzz").toString)
    eng.attachTable("fz", df)
    df.createOrReplaceTempView("fz_v")

    val aggPool = Seq("sum(a)", "min(b)", "max(a)", "count(*)",
      "sum(b)", "min(a)", "max(b)", "count(a)", "avg(a)",
      "case when count(*) > 3 then 1 else 0 end")
    val wherePool = Seq("a > 50", "b <= 42.5", "s = 's3'",
      "a >= 10 and b < 90.0", "k <> 4", "s in ('s1', 's2', 's5')",
      "not (a < 20)", "b > 10.0 or a > 80")
    val havingPool = Seq("count(*) > 2", "sum(a) >= 100",
      "min(b) < 50.0", "max(a) > 10", "g0 >= 10", "not (g0 < 10)",
      "count(*) > 1 and max(a) >= 50")

    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

    for (i <- 0 until 150) {
      // nAgg = 0 exercises the group-no-agg distinct fast path, which
      // historically dropped HAVING and ORDER BY
      val nAgg = rnd.nextInt(4)
      val aggs = rnd.shuffle(aggPool).take(nAgg).zipWithIndex
        .map { case (a, j) => s"$a as g$j" }
      // occasionally project an expression of the grouping key too
      val keyExpr = if (rnd.nextInt(4) == 0) Seq("k + 1 as kk") else Nil
      val items = aggs ++ keyExpr
      val where = if (rnd.nextBoolean()) s" where ${pick(wherePool)}" else ""
      val havingChoices =
        if (nAgg == 0) havingPool.filterNot(_.contains("g0"))
        else havingPool
      val having = if (rnd.nextInt(3) == 0)
        s" having ${pick(havingChoices)}"
      else ""
      // ORDER BY keeps LIMIT prefixes deterministic in both engines:
      // either the unique grouping key, or an agg alias with the key
      // as tiebreak
      val tail = rnd.nextInt(5) match {
        case 0 => s" order by k limit ${1 + rnd.nextInt(8)}"
        case 1 => " order by k desc"
        case 2 if nAgg > 0 => s" order by g0 desc, k limit ${1 + rnd.nextInt(8)}"
        case _ => ""
      }
      val selList = ("k" +: items).mkString(", ")
      def q(t: String) =
        s"select $selList from $t$where group by k$having$tail"
      val got = eng.sql(q("fz")) match {
        case Rows(r) => r.collect()
        case other => fail(s"${q("fz")} -> $other")
      }
      val want = spark.sql(q("fz_v")).collect()
      def canon(rows: Array[org.apache.spark.sql.Row]): Seq[Seq[String]] =
        rows.map(_.toSeq.map {
          case d: Double => f"$d%.9f"
          case v => String.valueOf(v)
        }).toSeq.sortBy(_.mkString("|"))
      assert(canon(got) == canon(want),
        s"#$i diverged:\n${q("fz")}\nengine: ${canon(got).take(3)}\n" +
          s"spark:  ${canon(want).take(3)}")
    }
  }

  test("100 random non-grouped selects: dialect engine == Spark SQL") {
    val rnd = new scala.util.Random(777)
    val data = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(50).toLong,
        math.rint(rnd.nextDouble() * 1000) / 100.0, "t" + (i % 5))
    }
    val df = data.toDF("id", "a", "b", "s")
    val eng = new Engine(spark,
      java.nio.file.Files.createTempDirectory("dql-fuzz2").toString)
    eng.attachTable("fp", df)
    df.createOrReplaceTempView("fp_v")
    val itemPool = Seq("id", "a", "b", "s", "a + 1 as a1",
      "b * 2.0 as b2", "abs(a - 25) as d25",
      "case when a > 25 then 'hi' else 'lo' end as band")
    val wherePool = Seq("", " where a > 25", " where s = 't2'",
      " where b < 500.0 and a >= 5", " where a in (1, 2, 3, 42)",
      " where not (a <= 10)")
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
    for (i <- 0 until 100) {
      val items = rnd.shuffle(itemPool).take(1 + rnd.nextInt(4))
      val where = pick(wherePool)
      // id is a unique key, so ordering by it (projected or not — the
      // not-projected case exercises the sort-before-project branch)
      // keeps LIMIT prefixes deterministic
      val tail = rnd.nextInt(3) match {
        case 0 => s" order by id limit ${1 + rnd.nextInt(10)}"
        case 1 => " order by id desc"
        case _ => ""
      }
      def q(t: String) = s"select ${items.mkString(", ")} from $t$where$tail"
      val got = eng.sql(q("fp")) match {
        case Rows(r) => r.collect()
        case other => fail(s"${q("fp")} -> $other")
      }
      val want = spark.sql(q("fp_v")).collect()
      def canon(rows: Array[org.apache.spark.sql.Row]): Seq[Seq[String]] =
        rows.map(_.toSeq.map {
          case d: Double => f"$d%.9f"
          case v => String.valueOf(v)
        }).toSeq.sortBy(_.mkString("|"))
      assert(canon(got) == canon(want),
        s"#$i diverged:\n${q("fp")}\nengine: ${canon(got).take(3)}\n" +
          s"spark:  ${canon(want).take(3)}")
    }
  }
}
