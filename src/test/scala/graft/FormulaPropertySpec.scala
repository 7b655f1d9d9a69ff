package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sql.{Ast, ExprBuilder, Parser}
import graft.sql.Ast._

/** Differential formula fuzzing, the Spark-side analog of the
  * reference's test/pysmoke/formulas.py: generate random arithmetic
  * formulas in the NoWDB dialect, (1) round-trip them through the
  * parser, (2) evaluate via ExprBuilder→Catalyst and compare against
  * an independent Scala interpreter implementing the same semantics
  * (uint=long arithmetic, QUOT `/`: int/int takes the integer
  * quotient, otherwise float division — fun/expr.c:2228-2233, ^ =
  * pow, floor/ceil → long, NULL propagation). */
class FormulaPropertySpec extends AnyFunSuite {
  val spark = TestSpark.spark

  private val genLit: Gen[Expr] = Gen.oneOf(
    Gen.choose(0L, 50L).map(v => Lit(v, "uint")),
    Gen.choose(0, 40).map(k => Lit(k / 4.0, "float")))

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth == 0) genLit
    else Gen.frequency(
      3 -> genLit,
      4 -> (for {
        op <- Gen.oneOf("+", "-", "*")
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield BinOp(op, l, r)),
      2 -> (for { // nonzero literal divisors keep ANSI mode happy
        op <- Gen.oneOf("/", "%", "^")
        l <- genExpr(depth - 1); r <- Gen.choose(1L, 9L)
      } yield BinOp(op, l, Lit(r, "uint"))),
      2 -> (for {
        f <- Gen.oneOf("abs", "floor", "ceil", "sin", "cos")
        a <- genExpr(depth - 1)
      } yield FnCall(f, Seq(a))),
      1 -> (for { // root(|x|, n) keeps the domain real
        a <- genExpr(depth - 1)
        n <- Gen.choose(2L, 4L)
      } yield FnCall("root", Seq(FnCall("abs", Seq(a)), Lit(n, "uint")))),
      1 -> genExpr(depth - 1).map(x => UnOp("-", x)))

  private def render(e: Expr): String = e match {
    case Lit(v: Long, _) => v.toString
    case Lit(v: Double, _) => v.toString
    case Lit(null, _) => "null"
    case UnOp("-", x) => s"(- ${render(x)})"
    case BinOp(op, l, r) => s"(${render(l)} $op ${render(r)})"
    case FnCall(f, args) => s"$f(${args.map(render).mkString(", ")})"
    case other => fail(s"unrenderable $other")
  }

  // ── independent interpreter (no Spark, no ExprBuilder code) ───────
  private def toD(v: Any): Double = v match {
    case l: Long => l.toDouble
    case d: Double => d
  }
  private def ev(e: Expr): Any = e match {
    case Lit(v, _) => v
    case UnOp("-", x) => ev(x) match {
      case null => null
      case l: Long => -l
      case d: Double => -d
    }
    case BinOp(op, a, b) => (ev(a), ev(b)) match {
      case (null, _) | (_, null) => null
      case (l: Long, r: Long) => op match {
        case "+" => l + r
        case "-" => l - r
        case "*" => l * r
        case "/" => l / r // QUOT: integer quotient, truncating like C
        case "%" => l % r
        case "^" => StrictMath.pow(l.toDouble, r.toDouble) // Spark Pow codegen uses StrictMath
      }
      case (x, y) =>
        val (l, r) = (toD(x), toD(y))
        op match {
          case "+" => l + r
          case "-" => l - r
          case "*" => l * r
          case "/" => l / r
          case "%" => l % r
          case "^" => StrictMath.pow(l, r)
        }
    }
    case FnCall(f, Seq(a)) => ev(a) match {
      case null => null
      case v => f match {
        case "abs" => v match {
          case l: Long => math.abs(l)
          case d: Double => math.abs(d)
        }
        case "floor" => v match {
          case l: Long => l
          case d: Double => math.floor(d).toLong
        }
        case "ceil" => v match {
          case l: Long => l
          case d: Double => math.ceil(d).toLong
        }
        case "sin" => math.sin(toD(v))
        case "cos" => math.cos(toD(v))
      }
    }
    case FnCall("root", Seq(a, Lit(n: Long, _))) => ev(a) match {
      case null => null
      case v => StrictMath.pow(toD(v), 1.0 / n.toDouble)
    }
    case other => fail(s"uninterpretable $other")
  }

  private def samples(n: Int, depth: Int): Seq[Expr] = {
    val params = Gen.Parameters.default
    (0 until n).map(i =>
      genExpr(depth).pureApply(params, Seed(42L + i)))
  }

  test("parser round-trips 200 random formulas") {
    samples(200, 3).foreach { e =>
      val sql = s"select ${render(e)}"
      Parser.parse(sql) match {
        case s @ SelectStmt(Seq(SelectItem(parsed, None)), None,
            _, _, _, _, _, _, _, _, _, _, _, _, _) if s.derived.isEmpty =>
          assert(parsed == e, s"\n$sql\nparsed: $parsed\nwanted: $e")
        case other => fail(s"$sql parsed to $other")
      }
    }
  }

  test("150 random formulas: Catalyst == independent interpreter") {
    val es = samples(150, 3)
    val cols = es.zipWithIndex.map { case (e, i) =>
      ExprBuilder.build(e).as(s"c$i")
    }
    val row = spark.range(1).select(cols: _*).collect()(0)
    es.zipWithIndex.foreach { case (e, i) =>
      val got = row.get(i)
      val want = ev(e)
      val same = (got, want) match {
        case (null, null) => true
        case (g: Double, w: Double) =>
          (g.isNaN && w.isNaN) || g == w
        case (g, w) => g == w
      }
      assert(same, s"\n${render(e)}\nspark: $got  interp: $want")
    }
  }

  test("200 random formulas agree via the FULL engine path (sql text)") {
    // Unlike the ExprBuilder test above, this rides the whole stack a
    // session uses — Parser → Engine.buildSelect → Catalyst — so
    // parser/coercion drift between the engine path and ExprBuilder
    // cannot hide (the reference's differential method,
    // test/pysmoke/formulas.py).
    val eng = new graft.engine.Engine(spark,
      java.nio.file.Files.createTempDirectory("fuzz-scope").toString)
    samples(200, 3).grouped(25).foreach { grp =>
      val sql = "select " + grp.map(render).mkString(", ")
      val row = eng.sql(sql) match {
        case graft.engine.Rows(df) => df.collect()(0)
        case other => fail(s"$sql -> $other")
      }
      grp.zipWithIndex.foreach { case (e, i) =>
        val got = row.get(i)
        val want = ev(e)
        val same = (got, want) match {
          case (null, null) => true
          case (g: Double, w: Double) => (g.isNaN && w.isNaN) || g == w
          case (g, w) => g == w
        }
        assert(same, s"\n${render(e)}\nengine: $got  interp: $want")
      }
    }
  }

  test("NULL propagates through arithmetic and functions") {
    val nulls = Seq[Expr](
      BinOp("+", Lit(null, "null"), Lit(1L, "uint")),
      BinOp("*", Lit(2.5, "float"), Lit(null, "null")),
      FnCall("abs", Seq(Lit(null, "null"))),
      UnOp("-", Lit(null, "null")),
      FnCall("coalesce", Seq(Lit(null, "null"), Lit(7L, "uint"))))
    val cols = nulls.zipWithIndex.map { case (e, i) =>
      ExprBuilder.build(e).as(s"n$i") }
    val row = spark.range(1).select(cols: _*).collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2)
      && row.isNullAt(3))
    assert(row.getLong(4) == 7L)
  }
}
