package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.engine._
import graft.engine.Lua._

/** The embedded Lua proc layer: interpreter semantics first (the
  * subset doc/manual/luaemb.tex's examples use), then end-to-end
  * `CREATE PROCEDURE ... LANGUAGE lua` + `EXEC` against an Engine
  * session — including the doc's own trapezoid-integral cursor loop
  * (luaemb.tex:585-620) and the bracket/lock idiom
  * (luaemb.tex:396-404). */
class LuaSpec extends AnyFunSuite {

  private def run1(src: String): V = {
    val env = Lua.Interp.stdEnv()
    Lua.run(src, env).headOption.getOrElse(LNil)
  }

  test("arithmetic keeps integer/float subtypes (ns stamps stay exact)") {
    assert(run1("return 2 + 3 * 4") == LInt(14))
    assert(run1("return 7 // 2") == LInt(3))
    assert(run1("return -7 // 2") == LInt(-4)) // floor, not trunc
    assert(run1("return 7 % 3") == LInt(1))
    assert(run1("return -1 % 3") == LInt(2)) // Lua floored mod
    assert(run1("return 7 / 2") == LFlt(3.5)) // / is always float
    assert(run1("return 2^10") == LFlt(1024.0)) // ^ is always float
    assert(run1("return -2^2") == LFlt(-4.0)) // unary binds looser than ^
    assert(run1("return 2^3^2") == LFlt(512.0)) // ^ right-assoc
    // ns-scale integers stay exact beyond double precision (2^53)
    val ns = run1(
      "local hour = 3600 * 1000000000\nreturn 1700000000 * 1000000000 + hour")
    assert(ns == LInt(1700000000000000000L + 3600000000000L))
  }

  test("comparisons are exact above 2^53 (ns stamps order correctly)") {
    // two ns stamps 1 apart near 1.7e18 — a double collapses them
    assert(run1("return 1700000000000000001 > 1700000000000000000") == LBool(true))
    assert(run1("return 1700000000000000000 < 1700000000000000001") == LBool(true))
    assert(run1("return 1700000000000000000 >= 1700000000000000001") == LBool(false))
    assert(run1("return math.max(1700000000000000001, 1700000000000000000)")
      == LInt(1700000000000000001L))
    // mixed int/float stays mathematically exact: 2^53 and 2^53+1
    assert(run1("return 9007199254740993 == 9007199254740992.0") == LBool(false))
    assert(run1("return 9007199254740993 > 9007199254740992.0") == LBool(true))
    assert(run1("return 0/0 < 1 or 1 < 0/0") == LBool(false)) // NaN
  }

  test("number lexing: 1..x is concat, not a malformed number") {
    assert(run1("return 1 .. 'x'") == LStr("1x"))
    assert(run1("return 12..'y'") == LStr("12y"))
    assert(run1("return 1.5 .. ''") == LStr("1.5"))
  }

  test("strings, concat, length, string library") {
    assert(run1("return 'a' .. 'b' .. 1") == LStr("ab1"))
    assert(run1("return #'hello'") == LInt(5))
    assert(run1("return string.format('%d|%s|%.2f', 42, 'x', 1.5)") ==
      LStr("42|x|1.50"))
    assert(run1("return ('Hello'):upper()") == LStr("HELLO"))
    assert(run1("return string.sub('hello', 2, 4)") == LStr("ell"))
    assert(run1("return string.sub('hello', -3)") == LStr("llo"))
    assert(run1("return string.rep('ab', 3)") == LStr("ababab"))
    assert(run1("local s, e = string.find('hay needle', 'need')\n" +
      "return s * 100 + e") == LInt(508)) // start 5, end 8
  }

  test("tables, constructors, table library, iteration") {
    assert(run1("local t = {10, 20, 30}\nreturn #t") == LInt(3))
    assert(run1("local t = {a = 1, b = 2}\nreturn t.a + t['b']") == LInt(3))
    assert(run1("local t = {}\nfor i = 1, 5 do t[i] = i * i end\n" +
      "local s = 0\nfor _, v in ipairs(t) do s = s + v end\nreturn s") ==
      LInt(55))
    assert(run1("local t = {}\ntable.insert(t, 'x')\n" +
      "table.insert(t, 'y')\ntable.insert(t, 1, 'z')\n" +
      "return table.concat(t, ',')") == LStr("z,x,y"))
    assert(run1("local t = {n = 2, m = 3}\nlocal s = 0\n" +
      "for k, v in pairs(t) do s = s + v end\nreturn s") == LInt(5))
  }

  test("control flow: if/elseif, while, repeat, break, numeric for") {
    assert(run1("local x = 7\nif x > 10 then return 'big'\n" +
      "elseif x > 5 then return 'mid' else return 'small' end") ==
      LStr("mid"))
    assert(run1("local n, s = 1, 0\nwhile true do s = s + n\n" +
      "n = n + 1\nif n > 4 then break end end\nreturn s") == LInt(10))
    assert(run1("local n = 0\nrepeat n = n + 1 until n >= 3\nreturn n") ==
      LInt(3))
    assert(run1("local s = 0\nfor i = 10, 1, -2 do s = s + i end\n" +
      "return s") == LInt(30))
  }

  test("functions: closures, multiple returns, recursion, pcall") {
    assert(run1("local function mk(a)\nreturn function(b) return a + b end\n" +
      "end\nlocal add5 = mk(5)\nreturn add5(37)") == LInt(42))
    assert(run1("local function two() return 1, 2 end\n" +
      "local a, b = two()\nreturn a + b") == LInt(3))
    assert(run1("local function fib(n)\nif n < 2 then return n end\n" +
      "return fib(n-1) + fib(n-2) end\nreturn fib(10)") == LInt(55))
    assert(run1("local ok, e = pcall(function() error('boom') end)\n" +
      "if ok then return 'no' end\nreturn e") == LStr("boom"))
    assert(run1("local ok = pcall(function() return 1 end)\n" +
      "return ok") == LBool(true))
    // methods via ':' receive self
    assert(run1("local t = {base = 100}\n" +
      "function t:plus(x) return self.base + x end\n" +
      "return t:plus(11)") == LInt(111))
  }

  test("math library and tostring/tonumber") {
    assert(run1("return math.floor(3.7)") == LInt(3))
    assert(run1("return math.max(3, 9, 4)") == LInt(9))
    assert(run1("return math.min(3, 9, 4)") == LInt(3))
    assert(run1("return tonumber('42')") == LInt(42))
    assert(run1("return tonumber('4.5') * 2") == LFlt(9.0))
    assert(run1("return tostring(42) .. tostring(true)") == LStr("42true"))
    assert(run1("return type({}) .. '/' .. type(1) .. '/' .. type('s')") ==
      LStr("table/number/string"))
  }

  // ── engine integration ─────────────────────────────────────────────

  private lazy val spark = TestSpark.spark

  private def freshEngine(): Engine =
    new Engine(spark, Files.createTempDirectory("lua-scope").toString,
      cursorPageSize = 4)

  private def ok(r: Result): Unit = r match {
    case Status(true, _) | Report(_, _) | Rows(_) =>
    case Status(false, m) => fail(s"statement failed: $m")
    case other => fail(s"unexpected $other")
  }

  test("lua procedures run against the invoking session") {
    val procDir = Files.createTempDirectory("lua-procs")
    // module exercising the documented nowdb surface: execute + cursor
    // iteration, onevalue, string.format-driven DML, makeresult,
    // array2row, bracket over a session lock, pexecute error handling,
    // and the doc's trapezoid integral (luaemb.tex:585-620)
    val lua =
      """function qtytotal()
        |  local cur = nowdb.execute([[select quantity from buys]])
        |  local total = 0
        |  for row in cur.rows() do
        |    total = total + row.field(0)
        |  end
        |  cur.release()
        |  return nowdb.makeresult(nowdb.INT, total)
        |end
        |
        |function addclient(id, name)
        |  nowdb.execute_(string.format(
        |    [[insert into client (id, name) (%d, '%s')]], id, name))
        |  local n = nowdb.onevalue([[select count(*) from client]])
        |  return nowdb.makeresult(nowdb.UINT, n)
        |end
        |
        |function constants()
        |  local r = {2.718281828, 3.141592653}
        |  local t = {nowdb.FLOAT, nowdb.FLOAT}
        |  return nowdb.array2row(t, r)
        |end
        |
        |function nextkey()
        |  local function before()
        |    nowdb.execute_("lock keylock")
        |  end
        |  local function after()
        |    nowdb.execute_("unlock keylock")
        |  end
        |  local k = nowdb.bracket(before, after, function()
        |    local x = nowdb.onevalue([[select max(id) from client]])
        |    return x + 1
        |  end)
        |  return nowdb.makeresult(nowdb.UINT, k)
        |end
        |
        |function safefail()
        |  local rc, msg = nowdb.pexecute([[select nope from nowhere]])
        |  if rc ~= nowdb.OK then
        |    return nowdb.error(rc, 'caught: ' .. msg)
        |  end
        |  return nowdb.success()
        |end
        |
        |function integral(fld, k, t0, t1)
        |  local stmt = string.format(
        |    [[select stamp, %s from buys
        |       where origin = %d
        |         and stamp >= %d and stamp < %d
        |       order by stamp]], fld, k, t0, t1)
        |  local cur = nowdb.execute(stmt)
        |  local x_1 = 0
        |  local x_2 = 0
        |  local x = 0
        |  local first = true
        |  for row in cur.rows() do
        |    if not first then x_1 = x_2 end
        |    x_2 = row.field(0)
        |    if not first then
        |      local d = x_2 - x_1
        |      local y = row.field(1)
        |      x = x + d * y
        |    else
        |      first = false
        |    end
        |  end
        |  cur.release()
        |  return nowdb.makeresult(nowdb.FLOAT, x / nowdb.hour)
        |end
        |""".stripMargin
    Files.writeString(procDir.resolve("luamod.lua"), lua)
    spark.conf.set("spark.graft.procPath", procDir.toString)
    val eng = freshEngine()
    try {
      ok(eng.sql("create scope luascope"))
      ok(eng.sql("use luascope"))
      ok(eng.sql("create type client (id uint pk, name text)"))
      ok(eng.sql("create edge buys (origin client origin, " +
        "destin client destin, stamp time stamp, quantity uint)"))
      ok(eng.sql("create lock keylock"))
      ok(eng.sql("insert into client (id, name) (1, 'Popeye')"))
      ok(eng.sql("insert into client (id, name) (7, 'Olivia')"))
      // hourly stamps so the integral has a clean closed form
      (0 until 4).foreach(h =>
        ok(eng.sql("insert into buys (origin, destin, stamp, quantity) " +
          s"(1, 7, '2024-01-01T0$h:00:00', ${(h + 1) * 10})")))

      Seq("qtytotal", "addclient", "constants", "nextkey", "safefail",
        "integral").foreach(p =>
        ok(eng.sql(s"create procedure luamod.$p() language lua")))

      // cursor fold: 10+20+30+40
      eng.sql("exec qtytotal()") match {
        case Rows(df) => assert(df.collect()(0).getLong(0) == 100L)
        case other => fail(s"qtytotal: $other")
      }
      // DML via string.format + onevalue re-read, EXEC args bound
      eng.sql("exec addclient(3, 'Wimpy')") match {
        case Rows(df) => assert(df.collect()(0).getLong(0) == 3L)
        case other => fail(s"addclient: $other")
      }
      // array2row → 2-field float row
      eng.sql("exec constants()") match {
        case Rows(df) =>
          val r = df.collect()(0)
          assert(math.abs(r.getDouble(0) - 2.718281828) < 1e-9)
          assert(math.abs(r.getDouble(1) - 3.141592653) < 1e-9)
        case other => fail(s"constants: $other")
      }
      // bracket acquires + releases the lock around max(id)+1
      eng.sql("exec nextkey()") match {
        case Rows(df) => assert(df.collect()(0).getLong(0) == 8L)
        case other => fail(s"nextkey: $other")
      }
      // lock must have been released by after(): reacquire instantly
      ok(eng.sql("lock keylock"))
      ok(eng.sql("unlock keylock"))
      // pexecute catches the engine error; proc maps it to a status
      eng.sql("exec safefail()") match {
        case Status(false, m) => assert(m.contains("caught"), m)
        case other => fail(s"safefail: $other")
      }
      // trapezoid integral over hourly samples of quantity 10..40:
      // sum over 3 intervals of 1h * right-endpoint value = 20+30+40
      eng.sql("exec integral('quantity', 1, 0, 4102444800000000000)") match {
        case Rows(df) =>
          assert(math.abs(df.collect()(0).getDouble(0) - 90.0) < 1e-9)
        case other => fail(s"integral: $other")
      }
      // unknown function in an existing module fails cleanly
      ok(eng.sql("create procedure luamod.ghost() language lua"))
      eng.sql("exec ghost()") match {
        case Status(false, m) => assert(m.contains("ghost"), m)
        case other => fail(s"ghost: $other")
      }
    } finally spark.conf.unset("spark.graft.procPath")
  }

  test("400 random arithmetic expressions: interpreter == independent eval") {
    // Differential fuzz of the expression grammar (lexer, parser
    // precedence/associativity, int/float subtype rules): random
    // expression TREES are rendered to Lua source with explicit
    // structure-revealing parens removed only where precedence should
    // reconstruct them, then evaluated by the interpreter AND by a
    // direct Scala walk of the same tree. Integer ops only (+ - * //
    // % with unary minus) so expected values are exact.
    val rnd = new scala.util.Random(31337)
    sealed trait E
    case class Num(v: Long) extends E
    case class Bin(op: String, l: E, r: E) extends E
    case class Neg(e: E) extends E
    def gen(depth: Int): E =
      if (depth == 0) Num(rnd.nextInt(19).toLong - 9)
      else rnd.nextInt(6) match {
        case 0 => Num(rnd.nextInt(199).toLong - 99)
        case 5 => Neg(gen(depth - 1))
        case _ => Bin(Seq("+", "-", "*", "//", "%")(rnd.nextInt(5)),
          gen(depth - 1), gen(depth - 1))
      }
    // Lua 5.3 integer semantics: // floors, % is floored remainder
    def ev(e: E): Option[Long] = e match {
      case Num(v) => Some(v)
      case Neg(x) => ev(x).map(v => -v)
      case Bin(op, l, r) =>
        for (a <- ev(l); b <- ev(r);
             v <- op match {
               case "+" => Some(a + b)
               case "-" => Some(a - b)
               case "*" => Some(a * b)
               case "//" => if (b == 0) None else Some(Math.floorDiv(a, b))
               case "%" => if (b == 0) None else Some(Math.floorMod(a, b))
             }) yield v
    }
    def render(e: E): String = e match {
      case Num(v) if v < 0 => s"($v)"
      case Num(v) => v.toString
      case Neg(x) => s"-(${render(x)})"
      case Bin(op, l, r) => s"(${render(l)} $op ${render(r)})"
    }
    var checked = 0
    for (_ <- 0 until 400) {
      val e = gen(3)
      ev(e).foreach { want => // skip div-by-zero trees
        val src = s"return ${render(e)}"
        val got = Lua.run(src, Lua.Interp.stdEnv())
        assert(got == Seq(Lua.LInt(want)), s"$src: got $got want $want")
        checked += 1
      }
    }
    assert(checked > 300, s"only $checked trees were evaluable")
    // precedence without parens: * and // and % bind over + -,
    // left-assoc at equal level (Lua 5.3 §3.4.8)
    assert(Lua.run("return 2 + 3 * 4 - 10 // 3 % 2",
      Lua.Interp.stdEnv()) == Seq(Lua.LInt(13)))
    assert(Lua.run("return 100 - 10 - 5 - 1", Lua.Interp.stdEnv()) ==
      Seq(Lua.LInt(84)))
    assert(Lua.run("return 7 // 2 // 2", Lua.Interp.stdEnv()) ==
      Seq(Lua.LInt(1)))
  }

  test("lua runtime errors surface as USRERR statuses, not crashes") {
    val procDir = Files.createTempDirectory("lua-procs2")
    Files.writeString(procDir.resolve("bad.lua"),
      """function blowup()
        |  nowdb.raise(74, 'deliberate')
        |end
        |function typo()
        |  return nosuchfunction(1)
        |end
        |""".stripMargin)
    spark.conf.set("spark.graft.procPath", procDir.toString)
    val eng = freshEngine()
    try {
      ok(eng.sql("create scope luascope2"))
      ok(eng.sql("use luascope2"))
      ok(eng.sql("create procedure bad.blowup() language lua"))
      ok(eng.sql("create procedure bad.typo() language lua"))
      eng.sql("exec blowup()") match {
        case Status(false, m) =>
          assert(m.contains("74") && m.contains("deliberate"), m)
        case other => fail(s"blowup: $other")
      }
      eng.sql("exec typo()") match {
        case Status(false, m) => assert(m.contains("nil"), m)
        case other => fail(s"typo: $other")
      }
    } finally spark.conf.unset("spark.graft.procPath")
  }
}
