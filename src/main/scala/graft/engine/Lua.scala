package graft.engine

import scala.collection.mutable

/** Minimal embedded Lua interpreter (lexer → recursive-descent parser
  * → tree-walking evaluator) for stored procedures, mirroring the
  * reference's embedded-Lua proc layer (`ifc/luaproc.c`,
  * `lua/nowdb.lua`, doc/manual/luaemb.tex). The container ships no
  * Lua, so the subset the reference's proc API needs is implemented
  * in-JVM: closures, multiple return values, integer/float numeric
  * subtypes (Lua 5.3 style — ns timestamps exceed 2^53 and MUST NOT
  * round-trip through doubles), tables, generic/numeric `for`,
  * `pcall`, and the `string`/`math`/`table` stdlib slices real proc
  * code uses. Deliberately absent: metatables, goto, coroutines,
  * varargs beyond fixed parameters — none appear in the reference's
  * proc examples (luaemb.tex:100-620, test/luasmoke lua shapes).
  *
  * The interpreter is engine-agnostic; [[LuaProcs]] supplies the
  * `nowdb` binding table. Scripts run on the DRIVER (procedures
  * orchestrate SQL; per-row work stays in Spark), so a tree-walker
  * is the right cost point — no codegen needed.
  */
object Lua {

  // ── values ─────────────────────────────────────────────────────────
  sealed trait V
  case object LNil extends V
  final case class LBool(b: Boolean) extends V
  final case class LInt(v: Long) extends V
  final case class LFlt(v: Double) extends V
  final case class LStr(s: String) extends V
  final class LTable extends V {
    val m = mutable.LinkedHashMap.empty[Any, V]
    def get(k: V): V = m.getOrElse(key(k), LNil)
    def set(k: V, v: V): Unit = {
      val kk = key(k)
      if (v == LNil) m.remove(kk) else m.update(kk, v)
    }
    /** Border: consecutive integer keys from 1 (Lua `#`). */
    def len: Long = {
      var n = 1L
      while (m.contains(n)) n += 1
      n - 1
    }
  }
  final case class LFun(params: List[String], body: List[Stat],
                        env: Env, name: String) extends V
  final case class LBuiltin(name: String, fn: Seq[V] => Seq[V]) extends V
  /** Host object smuggled through Lua untouched (Lua "userdata") —
    * carries e.g. a DataFrame inside a cursor wrapper table. */
  final case class LOpaque(ref: AnyRef) extends V

  /** Table-key normalization: float keys with integral value collapse
    * onto the integer key (Lua 5.3 §2.1). */
  private def key(k: V): Any = k match {
    case LInt(i) => i
    case LFlt(d) if d.isWhole && !d.isInfinite => d.toLong
    case LFlt(d) => d
    case LStr(s) => s
    case LBool(b) => b
    case LNil => throw err("table index is nil")
    case other => other
  }

  final class LuaError(val value: V) extends RuntimeException(tostr(value))
  private def err(msg: String) = new LuaError(LStr(msg))
  private case class BreakEx() extends RuntimeException
  private case class ReturnEx(vs: Seq[V]) extends RuntimeException

  final class Env(val parent: Env) {
    val vars = mutable.HashMap.empty[String, V]
    def lookup(n: String): Option[Env] =
      if (vars.contains(n)) Some(this)
      else if (parent == null) None else parent.lookup(n)
    def get(n: String): V =
      lookup(n).map(_.vars(n)).getOrElse(LNil)
    def setGlobal(n: String, v: V): Unit =
      lookup(n).getOrElse(root).vars(n) = v
    def define(n: String, v: V): Unit = vars(n) = v
    private def root: Env = if (parent == null) this else parent.root
  }

  // ── AST ────────────────────────────────────────────────────────────
  sealed trait Expr
  case object ENil extends Expr
  case object ETrue extends Expr
  case object EFalse extends Expr
  final case class ENum(v: V) extends Expr
  final case class EStr(s: String) extends Expr
  final case class EName(n: String) extends Expr
  final case class EIndex(t: Expr, k: Expr) extends Expr
  final case class ECall(f: Expr, args: List[Expr]) extends Expr
  final case class EMethod(o: Expr, name: String, args: List[Expr]) extends Expr
  final case class EBin(op: String, l: Expr, r: Expr) extends Expr
  final case class EUn(op: String, e: Expr) extends Expr
  final case class EFunc(params: List[String], body: List[Stat]) extends Expr
  final case class ETable(arr: List[Expr], kv: List[(Expr, Expr)]) extends Expr

  sealed trait Stat
  final case class SLocal(names: List[String], init: List[Expr]) extends Stat
  final case class SAssign(targets: List[Expr], vals: List[Expr]) extends Stat
  final case class SCall(e: Expr) extends Stat
  final case class SIf(arms: List[(Expr, List[Stat])],
                       els: List[Stat]) extends Stat
  final case class SWhile(c: Expr, b: List[Stat]) extends Stat
  final case class SRepeat(b: List[Stat], c: Expr) extends Stat
  final case class SForNum(v: String, from: Expr, to: Expr,
                           step: Option[Expr], b: List[Stat]) extends Stat
  final case class SForIn(names: List[String], exprs: List[Expr],
                          b: List[Stat]) extends Stat
  final case class SDo(b: List[Stat]) extends Stat
  final case class SReturn(es: List[Expr]) extends Stat
  case object SBreak extends Stat
  final case class SFunc(target: Expr, isMethod: Boolean,
                         params: List[String], body: List[Stat]) extends Stat
  final case class SLocalFunc(name: String, params: List[String],
                              body: List[Stat]) extends Stat

  // ── lexer ──────────────────────────────────────────────────────────
  private final case class Tok(kind: String, text: String, line: Int)

  private val keywords = Set("and", "break", "do", "else", "elseif", "end",
    "false", "for", "function", "if", "in", "local", "nil", "not", "or",
    "repeat", "return", "then", "true", "until", "while")

  private def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0; var line = 1
    val n = src.length
    def peek(o: Int = 0): Char = if (i + o < n) src.charAt(i + o) else '\u0000'
    while (i < n) {
      val c = src.charAt(i)
      if (c == '\n') { line += 1; i += 1 }
      else if (c.isWhitespace) i += 1
      else if (c == '-' && peek(1) == '-') {
        i += 2
        if (peek() == '[' && (peek(1) == '[' || peek(1) == '=')) {
          val (_, ni, nl) = longBracket(src, i, line)
          i = ni; line = nl
        } else while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '[' && (peek(1) == '[' || peek(1) == '=')) {
        val (s, ni, nl) = longBracket(src, i, line)
        out += Tok("str", s, line); i = ni; line = nl
      } else if (c == '"' || c == '\'') {
        val (s, ni) = shortString(src, i, line)
        out += Tok("str", s, line); i = ni
      } else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val start = i
        if (c == '0' && (peek(1) == 'x' || peek(1) == 'X')) {
          i += 2
          while (i < n && (src.charAt(i).isDigit ||
            "abcdefABCDEF".indexOf(src.charAt(i)) >= 0)) i += 1
          out += Tok("num", src.substring(start, i), line)
        } else {
          // a '.' is part of the number only when NOT followed by
          // another '.' — otherwise `1..x` (concat) lexes as the
          // malformed number "1.." and dies in parseNum
          while (i < n && (src.charAt(i).isDigit ||
            (src.charAt(i) == '.' &&
              !(i + 1 < n && src.charAt(i + 1) == '.')) ||
            src.charAt(i) == 'e' || src.charAt(i) == 'E' ||
            ((src.charAt(i) == '+' || src.charAt(i) == '-') &&
              (src.charAt(i - 1) == 'e' || src.charAt(i - 1) == 'E')))) i += 1
          out += Tok("num", src.substring(start, i), line)
        }
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit ||
          src.charAt(i) == '_')) i += 1
        val w = src.substring(start, i)
        out += Tok(if (keywords(w)) w else "name", w, line)
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        val three = if (i + 2 < n) src.substring(i, i + 3) else ""
        if (three == "...") { out += Tok("op", "...", line); i += 3 }
        else if (Set("==", "~=", "<=", ">=", "..", "//")(two)) {
          out += Tok("op", two, line); i += 2
        } else {
          out += Tok("op", c.toString, line); i += 1
        }
      }
    }
    out += Tok("eof", "", line)
    out.result()
  }

  /** `[[...]]` / `[=[...]=]` long strings and comments. Returns
    * (content, nextIndex, nextLine). */
  private def longBracket(src: String, at: Int,
                          line0: Int): (String, Int, Int) = {
    var i = at + 1
    var eqs = 0
    while (i < src.length && src.charAt(i) == '=') { eqs += 1; i += 1 }
    if (i >= src.length || src.charAt(i) != '[')
      throw err(s"malformed long bracket at line $line0")
    i += 1
    if (i < src.length && src.charAt(i) == '\n') { i += 1 }
    val close = "]" + ("=" * eqs) + "]"
    val end = src.indexOf(close, i)
    if (end < 0) throw err(s"unterminated long string at line $line0")
    val content = src.substring(i, end)
    val nl = line0 + src.substring(at, end).count(_ == '\n')
    (content, end + close.length, nl)
  }

  private def shortString(src: String, at: Int, line: Int): (String, Int) = {
    val q = src.charAt(at)
    val sb = new StringBuilder
    var i = at + 1
    while (i < src.length && src.charAt(i) != q) {
      val c = src.charAt(i)
      if (c == '\\' && i + 1 < src.length) {
        src.charAt(i + 1) match {
          case 'n' => sb += '\n'; case 't' => sb += '\t'
          case 'r' => sb += '\r'; case 'a' => sb += '\u0007'
          case '\\' => sb += '\\'; case '"' => sb += '"'
          case '\'' => sb += '\''; case '\n' => sb += '\n'
          case d if d.isDigit =>
            var j = i + 1; var code = 0; var k = 0
            while (j < src.length && src.charAt(j).isDigit && k < 3) {
              code = code * 10 + (src.charAt(j) - '0'); j += 1; k += 1
            }
            sb += code.toChar; i = j - 2
          case other => sb += other
        }
        i += 2
      } else if (c == '\n') {
        throw err(s"unterminated string at line $line")
      } else { sb += c; i += 1 }
    }
    if (i >= src.length) throw err(s"unterminated string at line $line")
    (sb.toString, i + 1)
  }

  // ── parser ─────────────────────────────────────────────────────────
  final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def cur: Tok = toks(pos)
    private def advance(): Tok = { val t = cur; pos += 1; t }
    private def at(kind: String, text: String = null): Boolean =
      cur.kind == kind && (text == null || cur.text == text)
    private def accept(kind: String, text: String = null): Boolean =
      if (at(kind, text)) { pos += 1; true } else false
    private def expect(kind: String, text: String = null): Tok = {
      if (!at(kind, text))
        throw err(s"line ${cur.line}: expected ${Option(text).getOrElse(kind)}" +
          s", got '${cur.text}'")
      advance()
    }

    def chunk(): List[Stat] = { val b = block(); expect("eof"); b }

    private def blockEnd: Boolean =
      cur.kind == "eof" || Set("end", "else", "elseif", "until")(cur.kind)

    def block(): List[Stat] = {
      val out = List.newBuilder[Stat]
      var done = false
      while (!done && !blockEnd) {
        if (accept("op", ";")) ()
        else if (at("return")) {
          advance()
          val es = if (blockEnd || at("op", ";")) Nil else expList()
          accept("op", ";")
          out += SReturn(es); done = true
        } else if (at("break")) {
          advance(); accept("op", ";"); out += SBreak; done = true
        } else out += statement()
      }
      out.result()
    }

    private def statement(): Stat = {
      if (accept("do")) { val b = block(); expect("end"); SDo(b) }
      else if (accept("while")) {
        val c = expr(); expect("do"); val b = block(); expect("end")
        SWhile(c, b)
      } else if (accept("repeat")) {
        val b = block(); expect("until"); SRepeat(b, expr())
      } else if (accept("if")) {
        val arms = List.newBuilder[(Expr, List[Stat])]
        val c = expr(); expect("then"); arms += ((c, block()))
        while (accept("elseif")) {
          val c2 = expr(); expect("then"); arms += ((c2, block()))
        }
        val els = if (accept("else")) block() else Nil
        expect("end"); SIf(arms.result(), els)
      } else if (accept("for")) {
        val n1 = expect("name").text
        if (accept("op", "=")) {
          val from = expr(); expect("op", ","); val to = expr()
          val step = if (accept("op", ",")) Some(expr()) else None
          expect("do"); val b = block(); expect("end")
          SForNum(n1, from, to, step, b)
        } else {
          val names = mutable.ListBuffer(n1)
          while (accept("op", ",")) names += expect("name").text
          expect("in"); val es = expList()
          expect("do"); val b = block(); expect("end")
          SForIn(names.toList, es, b)
        }
      } else if (accept("function")) {
        // funcname ::= Name {'.' Name} [':' Name]
        var target: Expr = EName(expect("name").text)
        var isMethod = false
        var loop = true
        while (loop) {
          if (accept("op", ".")) target = EIndex(target, EStr(expect("name").text))
          else if (accept("op", ":")) {
            target = EIndex(target, EStr(expect("name").text))
            isMethod = true; loop = false
          } else loop = false
        }
        val (ps, b) = funcBody()
        SFunc(target, isMethod, ps, b)
      } else if (accept("local")) {
        if (accept("function")) {
          val name = expect("name").text
          val (ps, b) = funcBody()
          SLocalFunc(name, ps, b)
        } else {
          val names = mutable.ListBuffer(expect("name").text)
          while (accept("op", ",")) names += expect("name").text
          val init = if (accept("op", "=")) expList() else Nil
          SLocal(names.toList, init)
        }
      } else {
        val e = suffixedExpr()
        if (at("op", "=") || at("op", ",")) {
          val targets = mutable.ListBuffer(e)
          while (accept("op", ",")) targets += suffixedExpr()
          expect("op", "=")
          SAssign(targets.toList, expList())
        } else e match {
          case _: ECall | _: EMethod => SCall(e)
          case _ => throw err(s"line ${cur.line}: syntax error near '${cur.text}'")
        }
      }
    }

    private def funcBody(): (List[String], List[Stat]) = {
      expect("op", "(")
      val ps = mutable.ListBuffer.empty[String]
      if (!at("op", ")")) {
        if (at("op", "...")) advance() else ps += expect("name").text
        while (accept("op", ",")) {
          if (at("op", "...")) advance() else ps += expect("name").text
        }
      }
      expect("op", ")")
      val b = block(); expect("end")
      (ps.toList, b)
    }

    private def expList(): List[Expr] = {
      val out = mutable.ListBuffer(expr())
      while (accept("op", ",")) out += expr()
      out.toList
    }

    // precedence climbing
    private val binPrec = Map(
      "or" -> 1, "and" -> 2,
      "<" -> 3, ">" -> 3, "<=" -> 3, ">=" -> 3, "~=" -> 3, "==" -> 3,
      ".." -> 4, "+" -> 5, "-" -> 5,
      "*" -> 6, "/" -> 6, "//" -> 6, "%" -> 6, "^" -> 8)
    private val rightAssoc = Set("..", "^")
    private val unaryPrec = 7

    /** Precedence climbing: consume operators with prec > `min`;
      * left-assoc recursion keeps equal-prec ops at this level,
      * right-assoc (`..`, `^`) lowers the bar by one so they nest
      * rightward. Unary ops sit between `*` and `^` (Lua §3.4.8). */
    def expr(min: Int = 0): Expr = {
      var left =
        if (at("not") || at("op", "-") || at("op", "#")) {
          val op = advance().text
          EUn(op, expr(unaryPrec))
        } else simpleExpr()
      var loop = true
      while (loop) {
        val opTok =
          if (cur.kind == "op" && binPrec.contains(cur.text)) cur.text
          else if (cur.kind == "and" || cur.kind == "or") cur.kind
          else null
        if (opTok == null || binPrec(opTok) <= min) loop = false
        else {
          advance()
          val nextMin =
            if (rightAssoc(opTok)) binPrec(opTok) - 1 else binPrec(opTok)
          left = EBin(opTok, left, expr(nextMin))
        }
      }
      left
    }

    private def simpleExpr(): Expr = {
      if (accept("nil")) ENil
      else if (accept("true")) ETrue
      else if (accept("false")) EFalse
      else if (at("num")) ENum(parseNum(advance().text))
      else if (at("str")) EStr(advance().text)
      else if (accept("function")) { val (ps, b) = funcBody(); EFunc(ps, b) }
      else if (at("op", "{")) tableCons()
      else suffixedExpr()
    }

    private def tableCons(): Expr = {
      expect("op", "{")
      val arr = mutable.ListBuffer.empty[Expr]
      val kv = mutable.ListBuffer.empty[(Expr, Expr)]
      while (!at("op", "}")) {
        if (at("op", "[")) {
          advance(); val k = expr(); expect("op", "]"); expect("op", "=")
          kv += ((k, expr()))
        } else if (at("name") && toks(pos + 1).kind == "op" &&
          toks(pos + 1).text == "=") {
          val k = advance().text; advance()
          kv += ((EStr(k), expr()))
        } else arr += expr()
        if (!accept("op", ",") && !accept("op", ";")) {
          if (!at("op", "}"))
            throw err(s"line ${cur.line}: expected , or } in table")
        }
      }
      expect("op", "}")
      ETable(arr.toList, kv.toList)
    }

    private def suffixedExpr(): Expr = {
      var e: Expr =
        if (accept("op", "(")) { val inner = expr(); expect("op", ")"); inner }
        else EName(expect("name").text)
      var loop = true
      while (loop) {
        if (accept("op", ".")) e = EIndex(e, EStr(expect("name").text))
        else if (accept("op", "[")) {
          val k = expr(); expect("op", "]"); e = EIndex(e, k)
        } else if (accept("op", "(")) {
          val args = if (at("op", ")")) Nil else expList()
          expect("op", ")"); e = ECall(e, args)
        } else if (at("op", ":") && toks(pos + 1).kind == "name") {
          advance(); val m = advance().text
          expect("op", "(")
          val args = if (at("op", ")")) Nil else expList()
          expect("op", ")"); e = EMethod(e, m, args)
        } else if (at("str")) {
          e = ECall(e, List(EStr(advance().text))) // f"literal" sugar
        } else loop = false
      }
      e
    }
  }

  private def parseNum(t: String): V =
    if (t.startsWith("0x") || t.startsWith("0X"))
      LInt(java.lang.Long.parseUnsignedLong(t.substring(2), 16))
    else if (t.contains('.') || t.contains('e') || t.contains('E'))
      LFlt(t.toDouble)
    else
      try LInt(t.toLong) catch { case _: NumberFormatException => LFlt(t.toDouble) }

  // ── evaluator ──────────────────────────────────────────────────────
  def truthy(v: V): Boolean = v match {
    case LNil | LBool(false) => false
    case _ => true
  }

  def tostr(v: V): String = v match {
    case LNil => "nil"
    case LBool(b) => b.toString
    case LInt(i) => i.toString
    case LFlt(d) =>
      if (d.isWhole && !d.isInfinite && math.abs(d) < 1e15)
        s"${d.toLong}.0"
      else d.toString
    case LStr(s) => s
    case t: LTable => s"table: 0x${System.identityHashCode(t).toHexString}"
    case f: LFun => s"function: ${f.name}"
    case b: LBuiltin => s"function: builtin ${b.name}"
    case o: LOpaque => s"userdata: ${o.ref.getClass.getSimpleName}"
  }

  private def tonum(v: V): Option[V] = v match {
    case n @ (LInt(_) | LFlt(_)) => Some(n)
    case LStr(s) =>
      try Some(parseNum(s.trim)) catch { case _: Exception => None }
    case _ => None
  }

  private def toD(v: V): Double = v match {
    case LInt(i) => i.toDouble
    case LFlt(d) => d
    case other => tonum(other) match {
      case Some(LInt(i)) => i.toDouble
      case Some(LFlt(d)) => d
      case _ => throw err(s"arithmetic on a ${typeName(other)} value")
    }
  }

  def typeName(v: V): String = v match {
    case LNil => "nil"
    case LBool(_) => "boolean"
    case LInt(_) | LFlt(_) => "number"
    case LStr(_) => "string"
    case _: LTable => "table"
    case _: LFun | _: LBuiltin => "function"
    case _: LOpaque => "userdata"
  }

  private def arith(op: String, a: V, b: V): V = {
    val (na, nb) = (tonum(a).getOrElse(
      throw err(s"arithmetic on a ${typeName(a)} value")),
      tonum(b).getOrElse(
        throw err(s"arithmetic on a ${typeName(b)} value")))
    (op, na, nb) match {
      case ("+", LInt(x), LInt(y)) => LInt(x + y)
      case ("-", LInt(x), LInt(y)) => LInt(x - y)
      case ("*", LInt(x), LInt(y)) => LInt(x * y)
      case ("%", LInt(x), LInt(y)) =>
        if (y == 0) throw err("attempt to perform 'n%%0'")
        else LInt(java.lang.Math.floorMod(x, y))
      case ("//", LInt(x), LInt(y)) =>
        if (y == 0) throw err("attempt to perform 'n//0'")
        else LInt(java.lang.Math.floorDiv(x, y))
      case ("/", _, _) => LFlt(toD(na) / toD(nb))
      case ("^", _, _) => LFlt(math.pow(toD(na), toD(nb)))
      case ("%", _, _) =>
        val (x, y) = (toD(na), toD(nb)); LFlt(x - math.floor(x / y) * y)
      case ("//", _, _) => LFlt(math.floor(toD(na) / toD(nb)))
      case ("+", _, _) => LFlt(toD(na) + toD(nb))
      case ("-", _, _) => LFlt(toD(na) - toD(nb))
      case ("*", _, _) => LFlt(toD(na) * toD(nb))
      case _ => throw err(s"bad arith op $op")
    }
  }

  private def cmp(op: String, a: V, b: V): Boolean = (a, b) match {
    case (LStr(x), LStr(y)) => op match {
      case "<" => x < y; case ">" => x > y
      case "<=" => x <= y; case ">=" => x >= y
      case _ => throw err("bad cmp")
    }
    // int-int compares EXACTLY on Long (Lua 5.3 §3.4.4): routing
    // through Double would collapse ns stamps above 2^53 (ulp 256 at
    // 1.7e18) — two distinct stamps would be neither < nor > nor ==
    case (LInt(x), LInt(y)) => op match {
      case "<" => x < y; case ">" => x > y
      case "<=" => x <= y; case ">=" => x >= y
      case _ => throw err("bad cmp")
    }
    // mixed int/float: exact via BigDecimal (Lua 5.3 compares the
    // mathematical values); NaN compares false on every operator
    case (LInt(x), LFlt(y)) => mixedCmp(op, x, y, intLeft = true)
    case (LFlt(x), LInt(y)) => mixedCmp(op, y, x, intLeft = false)
    case _ =>
      val (x, y) = (toD(a), toD(b))
      op match {
        case "<" => x < y; case ">" => x > y
        case "<=" => x <= y; case ">=" => x >= y
        case _ => throw err("bad cmp")
      }
  }

  /** Exact (long vs double) comparison; `intLeft` says which operand
    * position the long occupies for the asymmetric operators. */
  private def mixedCmp(op: String, i: Long, f: Double,
                       intLeft: Boolean): Boolean = {
    if (f.isNaN) return false
    val c = // sign of (i - f), exactly
      if (f.isPosInfinity) -1
      else if (f.isNegInfinity) 1
      else java.math.BigDecimal.valueOf(i)
        .compareTo(new java.math.BigDecimal(f))
    val s = if (intLeft) c else -c
    op match {
      case "<" => s < 0; case ">" => s > 0
      case "<=" => s <= 0; case ">=" => s >= 0
      case _ => throw err("bad cmp")
    }
  }

  private def luaEquals(a: V, b: V): Boolean = (a, b) match {
    // exact mathematical equality (not via toDouble, which collapses
    // longs above 2^53 onto their float neighbors)
    case (LInt(x), LFlt(y)) => intEqFlt(x, y)
    case (LFlt(x), LInt(y)) => intEqFlt(y, x)
    case _ => a == b
  }

  private def intEqFlt(i: Long, f: Double): Boolean =
    !f.isNaN && !f.isInfinite &&
      java.math.BigDecimal.valueOf(i)
        .compareTo(new java.math.BigDecimal(f)) == 0

  final class Interp(globals: Env) {
    def execBlock(stats: List[Stat], env: Env): Unit =
      stats.foreach(exec(_, env))

    private def exec(s: Stat, env: Env): Unit = s match {
      case SLocal(names, init) =>
        val vs = evalList(init, env, names.length)
        names.zip(vs).foreach { case (n, v) => env.define(n, v) }
      case SAssign(targets, vals) =>
        val vs = evalList(vals, env, targets.length)
        targets.zip(vs).foreach {
          case (EName(n), v) => env.setGlobal(n, v)
          case (EIndex(t, k), v) => eval1(t, env) match {
            case tab: LTable => tab.set(eval1(k, env), v)
            case other =>
              throw err(s"attempt to index a ${typeName(other)} value")
          }
          case (other, _) => throw err(s"cannot assign to $other")
        }
      case SCall(e) => evalMulti(e, env)
      case SIf(arms, els) =>
        arms.find { case (c, _) => truthy(eval1(c, env)) } match {
          case Some((_, b)) => execBlock(b, new Env(env))
          case None => execBlock(els, new Env(env))
        }
      case SWhile(c, b) =>
        try {
          while (truthy(eval1(c, env))) execBlock(b, new Env(env))
        } catch { case BreakEx() => }
      case SRepeat(b, c) =>
        try {
          var go = true
          while (go) {
            val inner = new Env(env)
            execBlock(b, inner)
            if (truthy(eval1(c, inner))) go = false
          }
        } catch { case BreakEx() => }
      case SForNum(v, fromE, toE, stepE, b) =>
        val from = tonum(eval1(fromE, env)).getOrElse(throw err("'for' init"))
        val to = tonum(eval1(toE, env)).getOrElse(throw err("'for' limit"))
        val step = stepE.map(e => tonum(eval1(e, env))
          .getOrElse(throw err("'for' step"))).getOrElse(LInt(1))
        try {
          (from, to, step) match {
            case (LInt(f), LInt(t), LInt(st)) if st != 0 =>
              var i = f
              while (if (st > 0) i <= t else i >= t) {
                val inner = new Env(env); inner.define(v, LInt(i))
                execBlock(b, inner); i += st
              }
            case _ =>
              val (f, t, st) = (toD(from), toD(to), toD(step))
              var i = f
              while (if (st > 0) i <= t else i >= t) {
                val inner = new Env(env); inner.define(v, LFlt(i))
                execBlock(b, inner); i += st
              }
          }
        } catch { case BreakEx() => }
      case SForIn(names, exprs, b) =>
        val vs = evalList(exprs, env, 3)
        val (f, st, ctl0) = (vs.head, vs(1), vs(2))
        try {
          var ctl = ctl0
          var go = true
          while (go) {
            val rs = call(f, Seq(st, ctl))
            val first = rs.headOption.getOrElse(LNil)
            if (first == LNil) go = false
            else {
              ctl = first
              val inner = new Env(env)
              names.zipWithIndex.foreach { case (n, i) =>
                inner.define(n, if (i < rs.length) rs(i) else LNil)
              }
              execBlock(b, inner)
            }
          }
        } catch { case BreakEx() => }
      case SDo(b) => execBlock(b, new Env(env))
      case SReturn(es) => throw ReturnEx(evalListAll(es, env))
      case SBreak => throw BreakEx()
      case SFunc(target, isMethod, ps, b) =>
        val params = if (isMethod) "self" :: ps else ps
        val f = LFun(params, b, env, nameOf(target))
        target match {
          case EName(n) => env.setGlobal(n, f)
          case EIndex(t, k) => eval1(t, env) match {
            case tab: LTable => tab.set(eval1(k, env), f)
            case other =>
              throw err(s"attempt to index a ${typeName(other)} value")
          }
          case _ => throw err("bad function name")
        }
      case SLocalFunc(n, ps, b) =>
        env.define(n, LNil)
        env.define(n, LFun(ps, b, env, n))
    }

    private def nameOf(e: Expr): String = e match {
      case EName(n) => n
      case EIndex(t, EStr(k)) => s"${nameOf(t)}.$k"
      case _ => "?"
    }

    /** Expression lists: every expr truncates to 1 value except the
      * LAST, which expands (Lua §3.4). `want` pads with nil. */
    private def evalList(es: List[Expr], env: Env, want: Int): Seq[V] = {
      val all = evalListAll(es, env)
      if (all.length >= want) all.take(want)
      else all ++ Seq.fill(want - all.length)(LNil)
    }

    private def evalListAll(es: List[Expr], env: Env): Seq[V] =
      es match {
        case Nil => Nil
        case init :+ last =>
          init.map(eval1(_, env)) ++ evalMulti(last, env)
      }

    def eval1(e: Expr, env: Env): V =
      evalMulti(e, env).headOption.getOrElse(LNil)

    def evalMulti(e: Expr, env: Env): Seq[V] = e match {
      case ENil => Seq(LNil)
      case ETrue => Seq(LBool(true))
      case EFalse => Seq(LBool(false))
      case ENum(v) => Seq(v)
      case EStr(s) => Seq(LStr(s))
      case EName(n) => Seq(env.get(n))
      case EIndex(t, k) => eval1(t, env) match {
        case tab: LTable => Seq(tab.get(eval1(k, env)))
        case LStr(s) =>
          // string indexing via the string library (s:upper() etc.)
          Seq(stringLib.get(eval1(k, env)))
        case LNil => throw err(s"attempt to index a nil value" +
          (k match { case EStr(f) => s" (field '$f')"; case _ => "" }))
        case other =>
          throw err(s"attempt to index a ${typeName(other)} value")
      }
      case ECall(f, args) =>
        call(eval1(f, env), evalListAll(args, env))
      case EMethod(o, m, args) =>
        val self = eval1(o, env)
        val fn = self match {
          case t: LTable => t.get(LStr(m))
          case LStr(_) => stringLib.get(LStr(m))
          case other =>
            throw err(s"attempt to index a ${typeName(other)} value")
        }
        call(fn, self +: evalListAll(args, env))
      case EBin("and", l, r) =>
        val lv = eval1(l, env)
        Seq(if (!truthy(lv)) lv else eval1(r, env))
      case EBin("or", l, r) =>
        val lv = eval1(l, env)
        Seq(if (truthy(lv)) lv else eval1(r, env))
      case EBin("==", l, r) =>
        Seq(LBool(luaEquals(eval1(l, env), eval1(r, env))))
      case EBin("~=", l, r) =>
        Seq(LBool(!luaEquals(eval1(l, env), eval1(r, env))))
      case EBin("..", l, r) =>
        val (a, b) = (eval1(l, env), eval1(r, env))
        (a, b) match {
          case (LStr(_) | LInt(_) | LFlt(_), LStr(_) | LInt(_) | LFlt(_)) =>
            Seq(LStr(tostr(a) + tostr(b)))
          case _ => throw err(
            s"attempt to concatenate a ${typeName(if (a.isInstanceOf[LStr] ||
              a.isInstanceOf[LInt] || a.isInstanceOf[LFlt]) b else a)} value")
        }
      case EBin(op @ ("<" | ">" | "<=" | ">="), l, r) =>
        Seq(LBool(cmp(op, eval1(l, env), eval1(r, env))))
      case EBin(op, l, r) =>
        Seq(arith(op, eval1(l, env), eval1(r, env)))
      case EUn("-", e1) => eval1(e1, env) match {
        case LInt(i) => Seq(LInt(-i))
        case v => Seq(LFlt(-toD(v)))
      }
      case EUn("not", e1) => Seq(LBool(!truthy(eval1(e1, env))))
      case EUn("#", e1) => eval1(e1, env) match {
        case LStr(s) => Seq(LInt(s.length.toLong))
        case t: LTable => Seq(LInt(t.len))
        case other => throw err(s"attempt to get length of a " +
          s"${typeName(other)} value")
      }
      case EUn(op, _) => throw err(s"bad unary op $op")
      case EFunc(ps, b) => Seq(LFun(ps, b, env, "anonymous"))
      case ETable(arr, kv) =>
        val t = new LTable
        arr.zipWithIndex.foreach {
          case (ex, i) if i == arr.length - 1 =>
            // last array item expands multiple values
            evalMulti(ex, env).zipWithIndex.foreach { case (v, j) =>
              t.set(LInt(i + 1 + j), v)
            }
          case (ex, i) => t.set(LInt(i + 1), eval1(ex, env))
        }
        kv.foreach { case (k, v) => t.set(eval1(k, env), eval1(v, env)) }
        Seq(t)
    }

    def call(f: V, args: Seq[V]): Seq[V] = f match {
      case LBuiltin(_, fn) => fn(args)
      case LFun(params, body, closure, _) =>
        val env = new Env(closure)
        params.zipWithIndex.foreach { case (p, i) =>
          env.define(p, if (i < args.length) args(i) else LNil)
        }
        try { execBlock(body, env); Nil }
        catch { case ReturnEx(vs) => vs }
      case LNil => throw err("attempt to call a nil value")
      case other =>
        throw err(s"attempt to call a ${typeName(other)} value")
    }

    // string library shared by `string.x(s, ...)` and `s:x(...)`
    val stringLib: LTable = Interp.makeStringLib(this)
  }

  object Interp {
    private def oneStr(v: V, fn: String): String = v match {
      case LStr(s) => s
      case LInt(i) => i.toString
      case LFlt(d) => tostr(LFlt(d))
      case other =>
        throw err(s"bad argument to '$fn' (string expected, got " +
          s"${typeName(other)})")
    }

    private def oneInt(v: V, fn: String): Long = v match {
      case LInt(i) => i
      case LFlt(d) if d.isWhole => d.toLong
      case LStr(s) => s.trim.toLong
      case other =>
        throw err(s"bad argument to '$fn' (number expected, got " +
          s"${typeName(other)})")
    }

    /** Lua's string.format → java.util.Formatter, with %d/%i/%u/%x/%c
      * coerced through Long and %s through tostring. */
    def format(fmt: String, args: Seq[V]): String = {
      val out = new StringBuilder
      var i = 0; var ai = 0
      while (i < fmt.length) {
        val c = fmt.charAt(i)
        if (c != '%') { out += c; i += 1 }
        else if (i + 1 < fmt.length && fmt.charAt(i + 1) == '%') {
          out += '%'; i += 2
        } else {
          val start = i
          i += 1
          while (i < fmt.length && "-+ #0".indexOf(fmt.charAt(i)) >= 0) i += 1
          while (i < fmt.length && fmt.charAt(i).isDigit) i += 1
          if (i < fmt.length && fmt.charAt(i) == '.') {
            i += 1
            while (i < fmt.length && fmt.charAt(i).isDigit) i += 1
          }
          if (i >= fmt.length) throw err("invalid format string")
          val conv = fmt.charAt(i)
          val spec = fmt.substring(start, i)
          val arg = if (ai < args.length) args(ai) else LNil
          ai += 1
          conv match {
            case 'd' | 'i' | 'u' =>
              out ++= String.format(spec + "d",
                java.lang.Long.valueOf(oneInt(arg, "format")))
            case 'x' | 'X' | 'o' =>
              out ++= String.format(spec + conv,
                java.lang.Long.valueOf(oneInt(arg, "format")))
            case 'f' | 'F' | 'g' | 'G' | 'e' | 'E' =>
              out ++= String.format(spec + conv,
                java.lang.Double.valueOf(toD(arg)))
            case 'c' =>
              out += oneInt(arg, "format").toChar
            case 's' =>
              out ++= String.format(spec + "s", tostr(arg))
            case 'q' =>
              out ++= "\"" + tostr(arg).flatMap {
                case '"' => "\\\""; case '\\' => "\\\\"
                case '\n' => "\\n"; case ch => ch.toString
              } + "\""
            case other => throw err(s"invalid conversion '%$other'")
          }
          i += 1
        }
      }
      out.toString
    }

    private[Lua] def makeStringLib(interp: Interp): LTable = {
      val t = new LTable
      def reg(n: String)(fn: Seq[V] => Seq[V]): Unit =
        t.set(LStr(n), LBuiltin(s"string.$n", fn))
      reg("format") { as =>
        Seq(LStr(format(oneStr(as.head, "format"), as.tail)))
      }
      reg("len") { as => Seq(LInt(oneStr(as.head, "len").length.toLong)) }
      reg("sub") { as =>
        val s = oneStr(as.head, "sub")
        var from = oneInt(as(1), "sub").toInt
        var to = if (as.length > 2) oneInt(as(2), "sub").toInt else -1
        val n = s.length
        if (from < 0) from = math.max(n + from + 1, 1)
        else if (from == 0) from = 1
        if (to < 0) to = n + to + 1 else if (to > n) to = n
        Seq(LStr(if (from > to) "" else s.substring(from - 1, to)))
      }
      reg("upper") { as => Seq(LStr(oneStr(as.head, "upper").toUpperCase)) }
      reg("lower") { as => Seq(LStr(oneStr(as.head, "lower").toLowerCase)) }
      reg("rep") { as =>
        Seq(LStr(oneStr(as.head, "rep") * oneInt(as(1), "rep").toInt))
      }
      reg("byte") { as =>
        val s = oneStr(as.head, "byte")
        val i = if (as.length > 1) oneInt(as(1), "byte").toInt else 1
        if (i >= 1 && i <= s.length) Seq(LInt(s.charAt(i - 1).toLong))
        else Nil
      }
      reg("char") { as => Seq(LStr(as.map(oneInt(_, "char").toChar).mkString)) }
      reg("find") { as =>
        // plain find only (no Lua patterns) — enough for proc code
        val s = oneStr(as.head, "find"); val p = oneStr(as(1), "find")
        val init = if (as.length > 2) oneInt(as(2), "find").toInt else 1
        val at = s.indexOf(p, math.max(init - 1, 0))
        if (at < 0) Seq(LNil)
        else Seq(LInt(at + 1L), LInt(at + p.length.toLong))
      }
      t
    }

    /** Fresh global environment with the base/string/math/table libs. */
    def stdEnv(printer: String => Unit = Console.out.println(_)): Env = {
      val g = new Env(null)
      val interp = new Interp(g)
      def reg(n: String)(fn: Seq[V] => Seq[V]): Unit =
        g.define(n, LBuiltin(n, fn))

      reg("print") { as => printer(as.map(tostr).mkString("\t")); Nil }
      reg("type") { as => Seq(LStr(typeName(as.headOption.getOrElse(LNil)))) }
      reg("tostring") { as => Seq(LStr(tostr(as.headOption.getOrElse(LNil)))) }
      reg("tonumber") { as =>
        Seq(tonum(as.headOption.getOrElse(LNil)).getOrElse(LNil))
      }
      reg("error") { as =>
        throw new LuaError(as.headOption.getOrElse(LNil))
      }
      reg("assert") { as =>
        if (!truthy(as.headOption.getOrElse(LNil)))
          throw new LuaError(
            if (as.length > 1) as(1) else LStr("assertion failed!"))
        as
      }
      reg("pcall") { as =>
        try {
          val rs = interp.call(as.head, as.tail)
          LBool(true) +: rs
        } catch {
          case e: LuaError => Seq(LBool(false), e.value)
          case scala.util.control.NonFatal(e) =>
            Seq(LBool(false), LStr(String.valueOf(e.getMessage)))
        }
      }
      reg("select") { as =>
        as.head match {
          case LStr("#") => Seq(LInt(as.tail.length.toLong))
          case n => val i = oneInt(n, "select").toInt; as.drop(i)
        }
      }
      reg("ipairs") { as =>
        val t = as.head.asInstanceOf[LTable]
        val iter = LBuiltin("ipairs-it", { itArgs =>
          val i = oneInt(itArgs(1), "ipairs") + 1
          val v = t.get(LInt(i))
          if (v == LNil) Seq(LNil) else Seq(LInt(i), v)
        })
        Seq(iter, t, LInt(0))
      }
      reg("pairs") { as =>
        val t = as.head.asInstanceOf[LTable]
        val keys = t.m.keys.toVector
        var idx = 0
        val iter = LBuiltin("pairs-it", { _ =>
          if (idx >= keys.length) Seq(LNil)
          else {
            val k = keys(idx); idx += 1
            val kv: V = k match {
              case l: Long => LInt(l)
              case d: Double => LFlt(d)
              case s: String => LStr(s)
              case b: Boolean => LBool(b)
              case v: V => v
              case _ => LNil
            }
            Seq(kv, t.m.getOrElse(k, LNil))
          }
        })
        Seq(iter, t, LNil)
      }
      reg("unpack") { as =>
        val t = as.head.asInstanceOf[LTable]
        (1L to t.len).map(i => t.get(LInt(i)))
      }

      g.define("string", interp.stringLib)

      val mathT = new LTable
      def regM(n: String)(fn: Seq[V] => Seq[V]): Unit =
        mathT.set(LStr(n), LBuiltin(s"math.$n", fn))
      regM("floor") { as => Seq(LInt(math.floor(toD(as.head)).toLong)) }
      regM("ceil") { as => Seq(LInt(math.ceil(toD(as.head)).toLong)) }
      regM("abs") { as => as.head match {
        case LInt(i) => Seq(LInt(math.abs(i)))
        case v => Seq(LFlt(math.abs(toD(v))))
      } }
      regM("sqrt") { as => Seq(LFlt(math.sqrt(toD(as.head)))) }
      regM("exp") { as => Seq(LFlt(math.exp(toD(as.head)))) }
      regM("log") { as =>
        if (as.length > 1)
          Seq(LFlt(math.log(toD(as.head)) / math.log(toD(as(1)))))
        else Seq(LFlt(math.log(toD(as.head))))
      }
      regM("max") { as => as.reduceLeft((a, b) =>
        if (cmp(">", b, a)) b else a) match { case v => Seq(v) } }
      regM("min") { as => as.reduceLeft((a, b) =>
        if (cmp("<", b, a)) b else a) match { case v => Seq(v) } }
      regM("fmod") { as =>
        // C fmod semantics = Java's % on doubles (truncated remainder)
        Seq(LFlt(toD(as.head) % toD(as(1))))
      }
      regM("tointeger") { as => as.head match {
        case i: LInt => Seq(i)
        case LFlt(d) if d.isWhole => Seq(LInt(d.toLong))
        case _ => Seq(LNil)
      } }
      mathT.set(LStr("huge"), LFlt(Double.PositiveInfinity))
      mathT.set(LStr("pi"), LFlt(math.Pi))
      mathT.set(LStr("maxinteger"), LInt(Long.MaxValue))
      mathT.set(LStr("mininteger"), LInt(Long.MinValue))
      g.define("math", mathT)

      val tableT = new LTable
      def regT(n: String)(fn: Seq[V] => Seq[V]): Unit =
        tableT.set(LStr(n), LBuiltin(s"table.$n", fn))
      regT("insert") { as =>
        val t = as.head.asInstanceOf[LTable]
        if (as.length == 2) t.set(LInt(t.len + 1), as(1))
        else {
          val pos = oneInt(as(1), "insert")
          var i = t.len
          while (i >= pos) { t.set(LInt(i + 1), t.get(LInt(i))); i -= 1 }
          t.set(LInt(pos), as(2))
        }
        Nil
      }
      regT("remove") { as =>
        val t = as.head.asInstanceOf[LTable]
        val n = t.len
        val pos = if (as.length > 1) oneInt(as(1), "remove") else n
        if (n == 0) Nil
        else {
          val removed = t.get(LInt(pos))
          var i = pos
          while (i < n) { t.set(LInt(i), t.get(LInt(i + 1))); i += 1 }
          t.set(LInt(n), LNil)
          Seq(removed)
        }
      }
      regT("concat") { as =>
        val t = as.head.asInstanceOf[LTable]
        val sep = if (as.length > 1) oneStr(as(1), "concat") else ""
        Seq(LStr((1L to t.len).map(i => tostr(t.get(LInt(i))))
          .mkString(sep)))
      }
      regT("unpack") { as =>
        val t = as.head.asInstanceOf[LTable]
        (1L to t.len).map(i => t.get(LInt(i)))
      }
      g.define("table", tableT)
      g
    }
  }

  /** Parse + run a chunk in `env`; returns the chunk's return values. */
  def run(src: String, env: Env): Seq[V] = {
    val stats = new Parser(lex(src)).chunk()
    val interp = new Interp(env)
    try { interp.execBlock(stats, env); Nil }
    catch { case ReturnEx(vs) => vs }
  }

  /** Call a global function defined by a previously-`run` chunk. */
  def callGlobal(env: Env, name: String, args: Seq[V]): Seq[V] = {
    val interp = new Interp(env)
    env.get(name) match {
      case LNil => throw err(s"no function '$name' in module")
      case f => interp.call(f, args)
    }
  }
}
