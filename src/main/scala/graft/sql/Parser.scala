package graft.sql

import Ast._
import scala.collection.mutable.ArrayBuffer

/** Hand-written lexer + recursive-descent parser for the NoWDB SQL
  * dialect. Statement/expression surface follows the reference
  * grammar (/root/reference/src/nowdb/sql/nowdbsql.y; lexer
  * nowdbsql.l): case-insensitive keywords, `--` and C-style comments,
  * single-quoted strings, bare-digit UINT literals, `^` as power,
  * `IS [NOT] NULL`, constant `IN` lists, CASE/WHEN, edge-join
  * `JOIN vtype ON origin|destin`.
  */
object Parser {

  case class ParseError(msg: String, pos: Int)
      extends RuntimeException(s"$msg (at offset $pos)")

  // ── lexer ──────────────────────────────────────────────────────────
  sealed trait Tok { def pos: Int }
  case class TId(s: String, pos: Int) extends Tok     // identifier/keyword
  case class TNum(s: String, pos: Int) extends Tok
  case class TStr(s: String, pos: Int) extends Tok
  case class TSym(s: String, pos: Int) extends Tok
  case class TEnd(pos: Int) extends Tok

  private def lex(input: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = input.length
    def peek(k: Int = 0): Char = if (i + k < n) input.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = peek()
      if (c.isWhitespace) i += 1
      else if (c == '-' && peek(1) == '-') { while (i < n && peek() != '\n') i += 1 }
      else if (c == '/' && peek(1) == '*') {
        i += 2
        while (i < n && !(peek() == '*' && peek(1) == '/')) i += 1
        i += 2
      }
      else if (c.isLetter || c == '_') {
        val s = i
        while (peek().isLetterOrDigit || peek() == '_') i += 1
        out += TId(input.substring(s, i), s)
      }
      else if (c.isDigit || (c == '.' && peek(1).isDigit)) {
        val s = i
        while (peek().isDigit) i += 1
        if (peek() == '.' && peek(1).isDigit) { i += 1; while (peek().isDigit) i += 1 }
        if (peek() == 'e' || peek() == 'E') {
          i += 1
          if (peek() == '+' || peek() == '-') i += 1
          while (peek().isDigit) i += 1
        }
        out += TNum(input.substring(s, i), s)
      }
      else if (c == '\'') {
        // string literal: '' doubling plus the reference's backslash
        // escapes \' \\ \n \r \t (nowdbsql.l:182-190 ESTRING rules) —
        // over the line-oriented wire protocol these are the ONLY way
        // to put a control character into a TEXT value
        val s = i; i += 1
        val sb = new StringBuilder
        while (i < n && !(peek() == '\'' && peek(1) != '\'')) {
          if (peek() == '\'' && peek(1) == '\'') { sb += '\''; i += 2 }
          else if (peek() == '\\' && i + 1 < n) {
            peek(1) match {
              case '\'' => sb += '\''
              case '\\' => sb += '\\'
              case 'n' => sb += '\n'
              case 'r' => sb += '\r'
              case 't' => sb += '\t'
              case o => sb += '\\'; sb += o // unknown escape kept raw
            }
            i += 2
          }
          else { sb += peek(); i += 1 }
        }
        if (i >= n) throw ParseError("unterminated string", s)
        i += 1
        out += TStr(sb.toString, s)
      }
      else {
        val two = if (i + 1 < n) input.substring(i, i + 2) else ""
        if (Seq("!=", "<>", "<=", ">=").contains(two)) { out += TSym(two, i); i += 2 }
        else if ("(),;.=<>+-*/%^:".indexOf(c) >= 0) { out += TSym(c.toString, i); i += 1 }
        else throw ParseError(s"unexpected character '$c'", i)
      }
    }
    out += TEnd(n)
    out.toVector
  }

  // ── parser state ───────────────────────────────────────────────────
  private class P(toks: Vector[Tok], val src: String = "") {
    var i = 0
    def cur: Tok = toks(i)
    def pos: Int = cur.pos
    def bump(): Tok = { val t = cur; i += 1; t }
    def isKw(kw: String): Boolean = cur match {
      case TId(s, _) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    def takeKw(kw: String): Boolean = if (isKw(kw)) { i += 1; true } else false
    def expectKw(kw: String): Unit =
      if (!takeKw(kw)) throw ParseError(s"expected $kw", pos)
    def isSym(s: String): Boolean = cur match {
      case TSym(x, _) => x == s
      case _ => false
    }
    def takeSym(s: String): Boolean = if (isSym(s)) { i += 1; true } else false
    def expectSym(s: String): Unit =
      if (!takeSym(s)) throw ParseError(s"expected '$s'", pos)
    def ident(): String = cur match {
      case TId(s, _) => i += 1; s
      case t => throw ParseError("expected identifier", t.pos)
    }
    def string(): String = cur match {
      case TStr(s, _) => i += 1; s
      case t => throw ParseError("expected string literal", t.pos)
    }
    def uintLit(): Long = cur match {
      case TNum(s, _) if !s.contains('.') => i += 1; s.toLong
      case t => throw ParseError("expected integer literal", t.pos)
    }
  }

  private val aggNames = Set("count", "sum", "avg", "average", "min",
    "max", "median", "stddev", "prod", "product", "spread", "mode",
    "integral", "count_distinct", "sum_distinct",
    // grouping(col) marks ROLLUP/CUBE subtotal rows (0 = data-level,
    // 1 = aggregated-away) — agg-class so it evaluates inside the
    // aggregation like every SQL engine requires
    "grouping")
  def isAggregate(name: String): Boolean = aggNames(name.toLowerCase)

  /** Parse one statement (a trailing ';' is allowed). */
  def parse(sql: String): Statement = {
    val p = new P(lex(sql), sql)
    val st = statement(p)
    p.takeSym(";")
    p.cur match {
      case TEnd(_) => st
      case t => throw ParseError("trailing input after statement", t.pos)
    }
  }

  /** Parse a ';'-separated script. */
  def parseScript(sql: String): Seq[Statement] = {
    val p = new P(lex(sql), sql)
    val out = ArrayBuffer.empty[Statement]
    while (!p.cur.isInstanceOf[TEnd]) {
      out += statement(p)
      if (!p.takeSym(";")) p.cur match {
        case TEnd(_) =>
        case t => throw ParseError("expected ';'", t.pos)
      }
    }
    out.toSeq
  }

  private def statement(p: P): Statement = {
    if (p.isKw("create")) create(p)
    else if (p.isKw("drop")) drop(p)
    else if (p.takeKw("use")) UseScope(p.ident())
    else if (p.takeKw("show")) ShowStmt(p.ident().toLowerCase)
    else if (p.takeKw("desc") || p.takeKw("describe")) DescStmt(p.ident())
    else if (p.takeKw("explain")) {
      if (!p.isKw("select") && !p.isKw("with"))
        throw ParseError("expected select", p.pos)
      ExplainStmt(statement(p))
    }
    else if (p.isKw("select")) selectChain(p)
    else if (p.takeKw("with")) {
      // WITH [RECURSIVE]; each binding body is a full set-op chain
      // (a recursive CTE's `base UNION [ALL] step` needs it), with an
      // optional ANSI column list renaming the output positionally
      val recursive = p.takeKw("recursive")
      val bindings = ArrayBuffer.empty[CteBinding]
      var more = true
      while (more) {
        val n = p.ident()
        val cols = ArrayBuffer.empty[String]
        if (p.takeSym("(")) {
          cols += p.ident()
          while (p.takeSym(",")) cols += p.ident()
          p.expectSym(")")
        }
        p.expectKw("as"); p.expectSym("(")
        bindings += CteBinding(n, cols.toSeq, selectChain(p))
        p.expectSym(")")
        more = p.takeSym(",")
      }
      if (!p.isKw("select"))
        throw ParseError("expected select", p.pos)
      WithStmt(bindings.toSeq, selectChain(p), recursive)
    }
    else if (p.takeKw("insert")) insert(p)
    else if (p.takeKw("load")) load(p)
    else if (p.takeKw("delete")) {
      p.expectKw("from")
      val t = p.ident()
      DeleteStmt(t, if (p.takeKw("where")) Some(expr(p)) else None)
    }
    else if (p.takeKw("update")) {
      val t = p.ident()
      p.expectKw("set")
      val sets = ArrayBuffer.empty[(String, Expr)]
      var more = true
      while (more) {
        val c = p.ident(); p.expectSym("=")
        sets += ((c, expr(p))); more = p.takeSym(",")
      }
      UpdateStmt(t, sets.toSeq,
        if (p.takeKw("where")) Some(expr(p)) else None)
    }
    else if (p.takeKw("merge")) merge(p)
    else if (p.takeKw("exec") || p.takeKw("execute")) exec(p)
    else if (p.takeKw("lock")) lock(p)
    else if (p.takeKw("unlock")) UnlockStmt(p.ident())
    else if (p.takeKw("fetch")) FetchStmt(p.uintLit())
    else if (p.takeKw("close")) CloseStmt(p.uintLit())
    else throw ParseError("unknown statement", p.pos)
  }

  /** A SELECT followed by an optional UNION/INTERSECT/EXCEPT [ALL]
    * chain. INTERSECT binds tighter; chains are left-associative. */
  private def selectChain(p: P): Statement = {
    def term(): Statement = {
      p.expectKw("select")
      var left: Statement = select(p)
      while (p.takeKw("intersect")) {
        val all = p.takeKw("all")
        p.expectKw("select")
        left = SetOpStmt("intersect", all, left, select(p))
      }
      left
    }
    var left = term()
    var more = true
    while (more) {
      if (p.takeKw("union"))
        left = SetOpStmt("union", p.takeKw("all"), left, term())
      else if (p.takeKw("except") || p.takeKw("minus"))
        left = SetOpStmt("except", p.takeKw("all"), left, term())
      else more = false
    }
    left
  }

  /** `MERGE INTO t USING s ON <expr> [WHEN MATCHED THEN UPDATE SET
    * c = e, … | WHEN MATCHED THEN DELETE] [WHEN NOT MATCHED THEN
    * INSERT (cols) VALUES (exprs)]` — at least one action clause;
    * UPDATE and DELETE are mutually exclusive. Qualified column refs
    * (`t.c`, `s.c`) resolve against the two table aliases. */
  private def merge(p: P): Statement = {
    p.expectKw("into")
    val target = p.ident()
    p.expectKw("using")
    val source = p.ident()
    p.expectKw("on")
    val on = expr(p)
    var sets: Option[Seq[(String, Expr)]] = None
    var del = false
    var ins: Option[(Seq[String], Seq[Expr])] = None
    while (p.takeKw("when")) {
      if (p.takeKw("matched")) {
        p.expectKw("then")
        if (p.takeKw("delete")) {
          if (sets.isDefined)
            throw ParseError("MERGE: UPDATE and DELETE are exclusive",
              p.pos)
          del = true
        } else {
          p.expectKw("update"); p.expectKw("set")
          if (del)
            throw ParseError("MERGE: UPDATE and DELETE are exclusive",
              p.pos)
          val ss = ArrayBuffer.empty[(String, Expr)]
          var more = true
          while (more) {
            val c = p.ident(); p.expectSym("=")
            ss += ((c, expr(p))); more = p.takeSym(",")
          }
          sets = Some(ss.toSeq)
        }
      } else {
        p.expectKw("not"); p.expectKw("matched"); p.expectKw("then")
        p.expectKw("insert"); p.expectSym("(")
        val cols = ArrayBuffer.empty[String]
        var more = true
        while (more) { cols += p.ident(); more = p.takeSym(",") }
        p.expectSym(")"); p.expectKw("values"); p.expectSym("(")
        val vals = ArrayBuffer.empty[Expr]
        more = true
        while (more) { vals += expr(p); more = p.takeSym(",") }
        p.expectSym(")")
        if (vals.length != cols.length)
          throw ParseError(
            s"MERGE INSERT: ${cols.length} columns, ${vals.length} values",
            p.pos)
        ins = Some((cols.toSeq, vals.toSeq))
      }
    }
    if (sets.isEmpty && !del && ins.isEmpty)
      throw ParseError("MERGE needs at least one WHEN clause", p.pos)
    MergeStmt(target, source, on, sets, del, ins)
  }

  private def ifNotExists(p: P): Boolean =
    if (p.takeKw("if")) {
      p.expectKw("not"); p.expectKw("exists"); true
    } else false

  /** trailing `if [not] exists` (the reference puts it after the name:
    * `create scope x if not exists`, `drop scope x if exists`). */
  private def trailingIfNot(p: P): Boolean =
    if (p.takeKw("if")) { p.expectKw("not"); p.expectKw("exists"); true }
    else false
  private def trailingIfExists(p: P): Boolean =
    if (p.takeKw("if")) { p.expectKw("exists"); true } else false

  private val nowTypes = Set("text", "date", "time", "float", "int",
    "uint", "bool", "longtext")

  private def create(p: P): Statement = {
    p.expectKw("create")
    // optional storage sizing adjectives (tiny..huge) before INDEX/STORAGE
    val sizing = Seq("tiny", "small", "medium", "big", "large", "huge")
      .find(p.isKw) match {
      case Some(s) => p.takeKw(s); Some(s)
      case None => None
    }
    if (p.takeKw("scope") || p.takeKw("schema")) {
      val name = p.ident(); CreateScope(name, trailingIfNot(p))
    } else if (p.takeKw("table") || p.takeKw("context")
        || p.takeKw("storage")) {
      val name = p.ident()
      val ine = trailingIfNot(p)
      val opts = scala.collection.mutable.Map.empty[String, String]
      sizing.foreach(s => opts += ("sizing" -> s))
      if (p.takeKw("set")) {
        var more = true
        while (more) {
          val k = p.ident(); p.expectSym("=")
          val v = p.cur match {
            case TStr(s, _) => p.bump(); s
            case TNum(s, _) => p.bump(); s
            case TId(s, _) => p.bump(); s
            case t => throw ParseError("expected option value", t.pos)
          }
          opts += (k.toLowerCase -> v)
          more = p.takeSym(",")
        }
      }
      CreateStorage(name, "storage", opts.toMap, ine)
    } else if (p.takeKw("type")) {
      val name = p.ident()
      val ine = trailingIfNot(p)
      p.expectSym("(")
      val props = ArrayBuffer.empty[PropDef]
      var more = true
      while (more) {
        val pn = p.ident()
        val pt = p.ident().toLowerCase
        if (!nowTypes(pt)) throw ParseError(s"unknown type $pt", p.pos)
        var pk = false
        if (p.takeKw("pk")) pk = true
        else if (p.takeKw("primary")) { p.expectKw("key"); pk = true }
        // `pk inc` is parsed by the reference but functionally inert
        // there too (stmt.c:505-507 re-affirms pk and discards inc)
        if (pk) p.takeKw("inc")
        val stamp = p.takeKw("stamp") || p.takeKw("timestamp")
        props += PropDef(pn, pt, pk, stamp)
        more = p.takeSym(",")
      }
      p.expectSym(")")
      // reference storage_clause `storage = <name>` — storages are
      // physical-placement no-ops here (parquet under the scope dir)
      if (p.takeKw("storage")) { p.expectSym("="); p.ident() }
      CreateType(name, props.toSeq, ine)
    } else if (p.takeKw("edge")) {
      val name = p.ident()
      val ine = trailingIfNot(p)
      p.expectSym("(")
      var origin: String = null
      var destin: String = null
      var stamped = false
      val payload = ArrayBuffer.empty[PropDef]
      var more = true
      // Role markers follow the reference's edge_field_decl grammar:
      // `<name> <vertextype> origin|destin` marks the role (the field
      // name is free — the wire/query name stays origin/destin, which
      // is also how the reference's field keywords address them), and
      // `<name> time|date stamp|timestamp` marks the stamp.
      val destinKws = Seq("destin", "dest", "destination")
      while (more) {
        val pn = p.ident()
        val pnl = pn.toLowerCase
        val pt = p.ident().toLowerCase
        // explicit role/stamp markers first; the two-token forms
        // (`origin client`, `stamp time` — FIXTURES.md:45,98) fall
        // back to the field NAME carrying the role
        if (p.takeKw("origin")) origin = pt
        else if (destinKws.exists(p.takeKw)) destin = pt
        else if (p.takeKw("stamp") || p.takeKw("timestamp")) {
          if (pt != "time" && pt != "date")
            throw ParseError("stamp must be time/date", p.pos)
          stamped = true
        } else if (pnl == "origin") origin = pt
        else if (destinKws.contains(pnl)) destin = pt
        else if (pnl == "stamp") {
          if (pt != "time" && pt != "date")
            throw ParseError("stamp must be time/date", p.pos)
          stamped = true
        } else {
          if (!nowTypes(pt)) throw ParseError(s"unknown type $pt", p.pos)
          p.takeKw("weight") // historical role marker, ignored
          payload += PropDef(pn, pt, pk = false, stamp = false)
        }
        more = p.takeSym(",")
      }
      p.expectSym(")")
      if (p.takeKw("storage")) { p.expectSym("="); p.ident() } // no-op
      if (origin == null || destin == null)
        throw ParseError("edge needs origin and destin", p.pos)
      CreateEdge(name, origin, destin, stamped, payload.toSeq, ine)
    } else if (p.takeKw("index")) {
      val name = p.ident()
      val ine = trailingIfNot(p)
      p.expectKw("on")
      val on = p.ident()
      p.expectSym("(")
      val fields = ArrayBuffer(p.ident())
      while (p.takeSym(",")) fields += p.ident()
      p.expectSym(")")
      CreateIndex(name, on, fields.toSeq, ine)
    } else if (p.takeKw("procedure")) {
      val module = p.ident()
      p.expectSym(".")
      val name = p.ident()
      val args = ArrayBuffer.empty[(String, String)]
      if (p.takeSym("(")) {
        if (!p.isSym(")")) {
          var more = true
          while (more) {
            val an = p.ident(); val at = p.ident().toLowerCase
            args += ((an, at)); more = p.takeSym(",")
          }
        }
        p.expectSym(")")
      }
      p.expectKw("language")
      val lang = p.ident().toLowerCase
      CreateProcedure(module, name, args.toSeq, lang, ifNotExists = false)
    } else if (p.takeKw("lock")) {
      val name = p.ident(); CreateLock(name, trailingIfNot(p))
    } else if (p.takeKw("view")) {
      val name = p.ident()
      val ine = trailingIfNot(p)
      p.expectKw("as")
      val start = p.pos
      if (!p.isKw("select") && !p.isKw("with"))
        throw ParseError("view body must be SELECT or WITH", p.pos)
      statement(p) match { // grammar-validate; the engine re-parses
        case _: SelectStmt | _: WithStmt | _: SetOpStmt =>
        case _ => throw ParseError("view body must be SELECT", p.pos)
      }
      CreateView(name, p.src.substring(start, p.pos).trim, ine)
    } else throw ParseError("unknown CREATE object", p.pos)
  }

  private def drop(p: P): Statement = {
    p.expectKw("drop")
    val kind =
      if (p.takeKw("scope") || p.takeKw("schema")) "scope"
      else if (p.takeKw("type")) "type"
      else if (p.takeKw("edge")) "edge"
      else if (p.takeKw("table") || p.takeKw("context")
        || p.takeKw("storage")) "storage"
      else if (p.takeKw("index")) "index"
      else if (p.takeKw("procedure")) "procedure"
      else if (p.takeKw("lock")) "lock"
      else if (p.takeKw("view")) "view"
      else throw ParseError("unknown DROP object", p.pos)
    val name = p.ident()
    DropStmt(kind, name, trailingIfExists(p))
  }

  private def insert(p: P): Statement = {
    p.expectKw("into")
    val target = p.ident()
    // reference form without a field list (nowdbsql.y:312): values
    // map positionally onto the target's full model
    def tuple(): Seq[Expr] = {
      p.expectSym("(")
      val vals = ArrayBuffer(expr(p))
      while (p.takeSym(",")) vals += expr(p)
      p.expectSym(")")
      vals.toSeq
    }
    def tuples(): (Seq[Expr], Seq[Seq[Expr]]) = {
      val first = tuple()
      val more = ArrayBuffer.empty[Seq[Expr]]
      while (p.takeSym(",")) more += tuple() // multi-row VALUES
      (first, more.toSeq)
    }
    if (p.takeKw("values")) {
      val (first, more) = tuples()
      return InsertStmt(target, Nil, first, more)
    }
    p.expectSym("(")
    val cols = ArrayBuffer(p.ident())
    while (p.takeSym(",")) cols += p.ident()
    p.expectSym(")")
    if (p.takeKw("select"))
      return InsertSelect(target, cols.toSeq, select(p))
    p.takeKw("values") // optional: reference uses bare `(v, ...)`
    val (first, more) = tuples()
    InsertStmt(target, cols.toSeq, first, more)
  }

  private def load(p: P): Statement = {
    val path = p.string()
    p.expectKw("into")
    val target = p.ident()
    var header = "none"
    var format = "csv"
    if (p.takeKw("use")) { p.expectKw("header"); header = "use" }
    else if (p.takeKw("ignore")) { p.expectKw("header"); header = "ignore" }
    if (p.takeKw("format")) {
      format = p.ident().toLowerCase
      if (format != "csv" && format != "json")
        throw ParseError(s"unsupported LOAD format '$format'", p.pos)
    }
    // reference `AS vertex|edge|<typename>` layout clause
    // (nowdbsql.y:287-295) — validated against the catalog in Engine
    val asKind = if (p.takeKw("as")) Some(p.ident().toLowerCase) else None
    var errs: Option[String] = None
    if (p.takeKw("set")) {
      p.expectKw("errors"); p.expectSym("="); errs = Some(p.string())
    }
    LoadStmt(path, target, header, errs, format, asKind)
  }

  private def exec(p: P): Statement = {
    val name = p.ident()
    val args = ArrayBuffer.empty[Expr]
    if (p.takeSym("(")) {
      if (!p.isSym(")")) {
        args += expr(p)
        while (p.takeSym(",")) args += expr(p)
      }
      p.expectSym(")")
    }
    ExecStmt(name, args.toSeq)
  }

  private def lock(p: P): Statement = {
    val name = p.ident()
    var write = true // default: exclusive (sql.tex LOCK section)
    if (p.takeKw("for")) {
      if (p.takeKw("reading")) write = false
      else if (p.takeKw("writing")) write = true
      else throw ParseError("expected reading|writing", p.pos)
    }
    var timeout: Option[Long] = None
    if (p.takeKw("set")) {
      p.expectKw("timeout"); p.expectSym("=")
      timeout = Some(p.uintLit())
    }
    LockStmt(name, write, timeout)
  }

  private def select(p: P): SelectStmt = {
    val dflag = p.takeKw("distinct") // superset: SELECT DISTINCT
    val items = ArrayBuffer.empty[SelectItem]
    var more = true
    while (more) {
      if (p.takeSym("*")) items += SelectItem(Star(), None)
      else {
        val e = expr(p)
        val alias = if (p.takeKw("as")) Some(p.ident()) else None
        items += SelectItem(e, alias)
      }
      more = p.takeSym(",")
    }
    var from: Option[String] = None
    var fromAlias: Option[String] = None
    var sample: Option[(Long, Option[Field])] = None
    val joins = ArrayBuffer.empty[JoinClause]
    val ansiJoins = ArrayBuffer.empty[AnsiJoin]
    val derived = ArrayBuffer.empty[(String, SelectStmt)]
    if (p.takeKw("from")) {
      // A clause keyword after a table name is never an alias
      // (LIMIT/HAVING are this dialect's supersets, so they must be
      // excluded here too or `SELECT a FROM t LIMIT 5` parses the
      // LIMIT as a table alias).
      def clauseKw: Boolean =
        Seq("join", "where", "group", "order", "having", "limit",
          "offset", "union", "intersect", "except", "minus", "inner",
          "left", "right", "full", "on", "sample",
          "tablesample").exists(p.isKw)
      def aliasOpt(): Option[String] =
        if (p.takeKw("as")) Some(p.ident())
        else if (!clauseKw && p.cur.isInstanceOf[TId]) Some(p.ident())
        else None
      // One FROM item: `(SELECT …) [AS] alias` (derived table,
      // superset — bound as a transient table for this statement), or
      // `table [alias]` / the reference `alias:table` form
      // (nowdbsql.y:1089, the first identifier is the alias). The
      // third component marks derived usages, so the collision check
      // below can tell a derived alias's own slot from a REAL table's.
      def fromItem(): (String, Option[String], Boolean) =
        if (p.takeSym("(")) {
          p.expectKw("select")
          val dsel = select(p)
          p.expectSym(")")
          val alias = aliasOpt().getOrElse(throw ParseError(
            "derived table needs an alias", p.pos))
          if (derived.exists(_._1.equalsIgnoreCase(alias)))
            throw ParseError(s"duplicate derived-table alias $alias",
              p.pos)
          derived += ((alias, dsel))
          (alias, None, true)
        } else {
          var t = p.ident()
          var a: Option[String] = None
          if (p.takeSym(":")) { a = Some(t); t = p.ident() }
          if (a.isEmpty) a = aliasOpt()
          (t, a, false)
        }
      // real (non-derived) table names + aliases seen in this FROM —
      // a derived alias equal to one would silently shadow that table
      // via the transient binding for the whole statement (advice
      // finding); pure shadowing with NO other use of the name
      // (`FROM (SELECT …) edges` alone) stays legal, like ANSI.
      val realNames = ArrayBuffer.empty[String]
      // plain (non-derived) FROM items, collected so the dNames
      // exclusion below can treat a table name equal to a derived
      // alias as a USE of the binding in every spelling — comma-list
      // `FROM (SELECT …) d, d` and `JOIN d ON …` desugar to the same
      // inner join, so they must pass or fail together (advice
      // finding: the comma form was rejected, the JOIN form allowed)
      val plainItems = ArrayBuffer.empty[(String, Option[String])]
      val (t0, a0, d0) = fromItem()
      from = Some(t0); fromAlias = a0
      if (!d0) plainItems += ((t0, a0))
      // SAMPLE <pct> [PERCENT] [ON f] — the last keyword of the
      // reference manual's absent triple "having, limit, sample"
      // (sql.tex:2127; HAVING and LIMIT are done). Also the ANSI
      // spelling TABLESAMPLE (<pct> PERCENT) [ON f]. Attaches to the
      // base FROM table (scan-level, before WHERE/joins) and maps to
      // the DETERMINISTIC multiplicative hash-mod sampler — NOT
      // Spark's .sample, whose output depends on partition layout —
      // so results are seed-stable and a DuckDB oracle can replicate
      // the filter arithmetically. Out-of-range fraction is a named
      // parse error, per the design: an empty (0) or total (≥100)
      // "sample" is a user mistake, not a degenerate scan.
      def samplePct(pct: Long, pos: Int): Unit = {
        if (pct < 1 || pct > 99)
          throw ParseError(
            s"SAMPLE $pct: percentage must be between 1 and 99 " +
              "(0 keeps nothing, 100 is the full scan)", pos)
      }
      if (p.takeKw("sample")) {
        val pos = p.pos
        val pct = p.uintLit()
        p.takeKw("percent") // optional noise word
        samplePct(pct, pos)
        val key = if (p.takeKw("on")) Some(fieldRef(p)) else None
        sample = Some((pct, key))
      } else if (p.takeKw("tablesample")) {
        p.expectSym("(")
        val pos = p.pos
        val pct = p.uintLit()
        p.expectKw("percent")
        p.expectSym(")")
        samplePct(pct, pos)
        val key = if (p.takeKw("on")) Some(fieldRef(p)) else None
        sample = Some((pct, key))
      }
      // Comma-separated FROM list (superset — TPC-H's join spelling):
      // `FROM a, b c, …` desugars to inner joins with a TRUE
      // condition; the WHERE's equi-conjuncts reach the join through
      // Catalyst's predicate pushdown, so the plan is the same keyed
      // join an explicit JOIN … ON would produce.
      while (p.takeSym(",")) {
        val (t, a, d) = fromItem()
        if (!d) plainItems += ((t, a))
        ansiJoins += AnsiJoin(t, a, "inner", Lit(true, "bool"))
      }
      val commaJoinCount = ansiJoins.length
      var joining = true
      while (joining) {
        // ANSI join kinds (superset); a bare JOIN may still be the
        // reference's edge-join, disambiguated after ON below
        val kind =
          if (p.takeKw("inner")) { p.expectKw("join"); Some("inner") }
          else if (p.takeKw("left")) {
            p.takeKw("outer"); p.expectKw("join"); Some("left")
          } else if (p.takeKw("right")) {
            p.takeKw("outer"); p.expectKw("join"); Some("right")
          } else if (p.takeKw("full")) {
            p.takeKw("outer"); p.expectKw("join"); Some("full")
          } else if (p.takeKw("join")) Some("bare")
          else None
        kind match {
          case None => joining = false
          case Some(k) =>
            val t = p.ident()
            var alias: Option[String] = None
            if (!p.isKw("on") && p.cur.isInstanceOf[TId])
              alias = Some(p.ident())
            p.expectKw("on")
            // reference edge-join form: bare JOIN + a lone
            // origin|destin|dest|destination ident (the lexer folds
            // the three destin spellings). If the ident continues as
            // an expression (`on origin = …`, `on o.k = …`), it is an
            // ANSI condition instead — backtrack and parse the expr.
            val save = p.i
            val edgeField = if (k == "bare" && p.cur.isInstanceOf[TId]) {
              val f = p.ident().toLowerCase
              val contSyms = Seq("=", ".", "<", ">", "<=", ">=", "!=",
                "<>", "+", "-", "*", "/", "%", "^")
              val continues = contSyms.exists(p.isSym) || p.isKw("is") ||
                p.isKw("in") || p.isKw("and") || p.isKw("or") ||
                p.isKw("not") || p.isKw("between") || p.isKw("like")
              if (!continues) f match {
                case "origin" => Some("origin")
                case "destin" | "dest" | "destination" => Some("destin")
                case _ => p.i = save; None
              } else { p.i = save; None }
            } else None
            edgeField match {
              case Some(f) => joins += JoinClause(t, f, alias)
              case None =>
                val on = expr(p)
                ansiJoins += AnsiJoin(t, alias,
                  if (k == "bare") "inner" else k, on)
            }
        }
      }
      if (derived.nonEmpty) {
        val dNames = derived.map(_._1.toLowerCase).toSet
        // One rule for every join spelling (r15, advice finding —
        // comma-list and JOIN used to disagree): a FROM/JOIN slot
        // whose table name matches a derived alias is a legal USE of
        // the binding (self-join re-instantiation) when it carries
        // its OWN alias — the slot then exposes that alias, names
        // stay unique, ANSI-style. WITHOUT an alias the slot would
        // re-expose the derived name itself (duplicate exposed
        // correlation name) — that is the silent-shadowing hazard,
        // rejected below like any other collision.
        def slotNames(t: String, a: Option[String]): Seq[String] =
          (if (dNames(t.toLowerCase) && a.nonEmpty) Seq.empty
           else Seq(t)) ++ a.toSeq
        realNames ++= plainItems.flatMap { case (t, a) => slotNames(t, a) }
        realNames ++= joins.flatMap(j => j.typeName +: j.alias.toSeq)
        realNames ++= ansiJoins.drop(commaJoinCount)
          .flatMap(aj => slotNames(aj.table, aj.alias))
        realNames.find(n => dNames(n.toLowerCase)).foreach(n =>
          throw ParseError(
            s"derived-table alias $n collides with a table name or " +
              "alias in the same FROM", p.pos))
      }
    }
    val where = if (p.takeKw("where")) Some(expr(p)) else None
    val groupBy = ArrayBuffer.empty[Expr]
    var groupMode = "plain"
    if (p.takeKw("group")) {
      p.expectKw("by")
      // GROUP BY ROLLUP(a, b) / CUBE(a, b) (superset): hierarchical /
      // power-set subtotal grids, executed via Dataset.rollup/cube
      if (p.takeKw("rollup")) groupMode = "rollup"
      else if (p.takeKw("cube")) groupMode = "cube"
      if (groupMode != "plain") {
        p.expectSym("(")
        groupBy += fieldRef(p)
        while (p.takeSym(",")) groupBy += fieldRef(p)
        p.expectSym(")")
      }
      // GROUP BY <ordinal> resolves to the item's expression; r13:
      // plain GROUP BY items are full EXPRESSIONS (the engine matches
      // them to select items / aliases for output naming)
      def gone(): Expr = p.cur match {
        case TNum(n, pos) if !n.contains('.') =>
          p.bump()
          val idx = n.toInt
          if (idx < 1 || idx > items.length)
            throw ParseError(s"GROUP BY $idx out of range", pos)
          items(idx - 1).expr match {
            case _: Star => throw ParseError(
              s"GROUP BY $idx may not reference *", pos)
            case e => e
          }
        case _ => expr(p)
      }
      if (groupMode == "plain") {
        groupBy += gone()
        while (p.takeSym(",")) groupBy += gone()
      }
    }
    // HAVING (superset — absent in the reference, sql.tex:2127):
    // evaluated over the projected aggregate columns, so it references
    // group keys or output aliases.
    val having = if (p.takeKw("having")) Some(expr(p)) else None
    val orderBy = ArrayBuffer.empty[(Field, Boolean)]
    if (p.takeKw("order")) {
      p.expectKw("by")
      def one(): Unit = {
        // ORDER BY <ordinal> (superset): resolves against the select
        // list's output name, so it works for aliased expressions and
        // plain column items alike
        val f = p.cur match {
          case TNum(n, pos) if !n.contains('.') =>
            p.bump()
            val idx = n.toInt
            if (idx < 1 || idx > items.length)
              throw ParseError(s"ORDER BY $idx out of range", pos)
            items(idx - 1) match {
              case SelectItem(_, Some(a)) => Field(a)
              case SelectItem(fd: Field, None) => Field(fd.name)
              case _ => throw ParseError(
                s"ORDER BY $idx: item needs an alias", pos)
            }
          case _ => fieldRef(p)
        }
        val asc = if (p.takeKw("desc")) false else { p.takeKw("asc"); true }
        orderBy += ((f, asc))
      }
      one()
      while (p.takeSym(",")) one()
    }
    val limit = if (p.takeKw("limit")) Some(p.uintLit()) else None
    // `LIMIT n OFFSET m` (superset) — only meaningful with ORDER BY,
    // like every SQL engine
    val offset = if (p.takeKw("offset")) Some(p.uintLit()) else None
    SelectStmt(items.toSeq, from, fromAlias, joins.toSeq, where,
      groupBy.toSeq, orderBy.toSeq, limit, having,
      distinct = dflag, offset = offset, ansiJoins = ansiJoins.toSeq,
      groupMode = groupMode, derived = derived.toSeq, sample = sample)
  }

  private def fieldRef(p: P): Field = {
    val a = p.ident()
    if (p.takeSym(".")) Field(p.ident(), Some(a)) else Field(a, None)
  }

  // ── expression grammar ─────────────────────────────────────────────
  // or < and < not < cmp/IS/IN < add < mul < pow(right) < unary < prim
  private def expr(p: P): Expr = orExpr(p)

  private def orExpr(p: P): Expr = {
    var l = andExpr(p)
    while (p.takeKw("or")) l = BinOp("or", l, andExpr(p))
    l
  }
  private def andExpr(p: P): Expr = {
    var l = notExpr(p)
    while (p.takeKw("and")) l = BinOp("and", l, notExpr(p))
    l
  }
  private def notExpr(p: P): Expr =
    if (p.takeKw("not")) UnOp("not", notExpr(p)) else cmpExpr(p)

  private def cmpExpr(p: P): Expr = {
    val l = addExpr(p)
    if (p.takeKw("is")) {
      val neg = p.takeKw("not")
      p.expectKw("null")
      IsNull(l, neg)
    } else if (p.isKw("in") || p.isKw("between") || p.isKw("like")
        || p.isKw("not")) {
      val neg = p.takeKw("not")
      if (neg && !p.isKw("in") && !p.isKw("between") && !p.isKw("like"))
        throw ParseError("expected IN/BETWEEN/LIKE after NOT", p.pos)
      if (p.takeKw("between")) {
        // [NOT] BETWEEN a AND b — desugared at parse time to the
        // inclusive range conjunction, so period pruning and every
        // downstream pass see plain comparisons
        val lo = addExpr(p)
        p.expectKw("and")
        val hi = addExpr(p)
        val rng = BinOp("and", BinOp(">=", l, lo), BinOp("<=", l, hi))
        if (neg) UnOp("not", rng) else rng
      } else if (p.takeKw("like")) {
        // [NOT] LIKE 'pattern' (% and _) — constant patterns only;
        // parsed at additive level so a following AND/OR stays with
        // the enclosing boolean expression
        val pat = addExpr(p)
        pat match {
          case Lit(_, "string") =>
          case _ => throw ParseError("LIKE needs a string literal", p.pos)
        }
        val lk = FnCall("like", Seq(l, pat))
        if (neg) UnOp("not", lk) else lk
      } else if (p.takeKw("in")) {
        p.expectSym("(")
        if (p.takeKw("select")) {
          val sub = select(p)
          p.expectSym(")")
          InSelect(l, sub, neg)
        } else {
          val vs = ArrayBuffer(expr(p))
          while (p.takeSym(",")) vs += expr(p)
          p.expectSym(")")
          InList(l, vs.toSeq, neg)
        }
      } else l
    } else {
      Seq("=", "!=", "<>", "<=", ">=", "<", ">").find(p.isSym) match {
        case Some(op) => p.takeSym(op); BinOp(op, l, addExpr(p))
        case None => l
      }
    }
  }

  private def addExpr(p: P): Expr = {
    var l = mulExpr(p)
    var go = true
    while (go) {
      if (p.takeSym("+")) l = BinOp("+", l, mulExpr(p))
      else if (p.takeSym("-")) l = BinOp("-", l, mulExpr(p))
      else go = false
    }
    l
  }
  private def mulExpr(p: P): Expr = {
    var l = powExpr(p)
    var go = true
    while (go) {
      if (p.takeSym("*")) l = BinOp("*", l, powExpr(p))
      else if (p.takeSym("/")) l = BinOp("/", l, powExpr(p))
      else if (p.takeSym("%")) l = BinOp("%", l, powExpr(p))
      else go = false
    }
    l
  }
  private def powExpr(p: P): Expr = {
    val l = unaryExpr(p)
    if (p.takeSym("^")) BinOp("^", l, powExpr(p)) // right-assoc
    else l
  }
  private def unaryExpr(p: P): Expr =
    if (p.takeSym("-")) UnOp("-", unaryExpr(p))
    else if (p.takeSym("+")) unaryExpr(p)
    else primary(p)

  private def primary(p: P): Expr = p.cur match {
    case TNum(s, _) =>
      p.bump()
      if (s.contains('.') || s.toLowerCase.contains('e'))
        Lit(s.toDouble, "float")
      else Lit(s.toLong, "uint")
    case TStr(s, _) => p.bump(); Lit(s, "string")
    case TSym("(", _) =>
      p.bump()
      if (p.takeKw("select")) {
        val sub = select(p); p.expectSym(")"); ScalarSelect(sub)
      } else { val e = expr(p); p.expectSym(")"); e }
    case TSym("*", _) => p.bump(); Star()
    case TId(s, _) if s.equalsIgnoreCase("case") => caseExpr(p)
    case TId(s, _) if s.equalsIgnoreCase("exists") =>
      p.bump()
      p.expectSym("(")
      p.expectKw("select")
      val sub = select(p)
      p.expectSym(")")
      ExistsSel(sub, neg = false)
    case TId(s, _) if s.equalsIgnoreCase("true") => p.bump(); Lit(true, "bool")
    case TId(s, _) if s.equalsIgnoreCase("false") => p.bump(); Lit(false, "bool")
    case TId(s, _) if s.equalsIgnoreCase("null") => p.bump(); Lit(null, "null")
    case TId(s, _) =>
      p.bump()
      if (p.takeSym("(")) { // function call
        // ANSI `CAST(x AS type)` (superset) — desugars to the
        // dialect's conversion functions
        if (s.equalsIgnoreCase("cast")) {
          val e = expr(p)
          p.expectKw("as")
          val ty = p.ident().toLowerCase
          if (ty == "decimal" || ty == "numeric") { // DECIMAL(p,s)
            if (p.takeSym("(")) {
              p.uintLit(); if (p.takeSym(",")) p.uintLit()
              p.expectSym(")")
            }
          }
          p.expectSym(")")
          val fn = ty match {
            case "bigint" | "int" | "integer" | "long" | "uint" |
                 "smallint" | "tinyint" => "toint"
            case "double" | "float" | "real" | "decimal" | "numeric" =>
              "tofloat"
            case "varchar" | "text" | "string" | "char" => "tostring"
            case "bool" | "boolean" => "tobool"
            case "time" | "timestamp" => "totime"
            case other =>
              throw ParseError(s"CAST: unsupported type $other", p.pos)
          }
          return FnCall(fn, Seq(e))
        }
        // `count(distinct x)` / `sum(distinct x)` (superset) — encoded
        // as the <name>_distinct aggregate so the FnCall shape (and
        // every pattern over it) stays binary
        val dflag = isAggregate(s) && p.takeKw("distinct")
        if (dflag && !Set("count", "sum").contains(s.toLowerCase))
          throw ParseError("DISTINCT supported for count/sum only", p.pos)
        val args = ArrayBuffer.empty[Expr]
        if (!p.isSym(")")) {
          args += expr(p)
          // ANSI `substring(x FROM a [FOR b])` (TPC-H q22's spelling)
          // — ANSI 1-based, distinct from the dialect's 0-based
          // C-style substr (reference fun/expr semantics)
          if (s.equalsIgnoreCase("substring") && p.takeKw("from")) {
            args += expr(p)
            if (p.takeKw("for")) args += expr(p)
            p.expectSym(")")
            return FnCall("substring", args.toSeq)
          }
          while (p.takeSym(",")) args += expr(p)
        }
        p.expectSym(")")
        val f = FnCall(
          if (dflag) s.toLowerCase + "_distinct" else s.toLowerCase,
          args.toSeq)
        if (p.takeKw("over")) windowOver(p, f) else f
      } else if (p.isSym(".")) {
        p.takeSym(".")
        Field(p.ident(), Some(s))
      } else Field(s, None)
    case t => throw ParseError("expected expression", t.pos)
  }

  /** `OVER ( [PARTITION BY e, …] [ORDER BY e [ASC|DESC], …] )` —
    * partition/order keys are full EXPRESSIONS (ANSI; r15 — the
    * TPC-DS q36 shape ranks `ORDER BY profit / rev` inside OVER). */
  private def windowOver(p: P, f: FnCall): Expr = {
    p.expectSym("(")
    val parts = ArrayBuffer.empty[Expr]
    if (p.takeKw("partition")) {
      p.expectKw("by")
      parts += expr(p)
      while (p.takeSym(",")) parts += expr(p)
    }
    val ords = ArrayBuffer.empty[(Expr, Boolean)]
    if (p.takeKw("order")) {
      p.expectKw("by")
      def one(): Unit = {
        val fd = expr(p)
        val asc = if (p.takeKw("desc")) false else { p.takeKw("asc"); true }
        ords += ((fd, asc))
      }
      one()
      while (p.takeSym(",")) one()
    }
    // Frame spec (superset, r12 verdict task 2): `ROWS|RANGE BETWEEN
    // <bound> AND <bound>` or the single-bound shorthand `ROWS|RANGE
    // <bound>` (… AND CURRENT ROW). Bounds: UNBOUNDED
    // PRECEDING/FOLLOWING, CURRENT ROW, <n> PRECEDING/FOLLOWING.
    val frame: Option[WFrame] =
      if (p.isKw("rows") || p.isKw("range")) {
        val mode = p.ident().toLowerCase
        def bound(isLower: Boolean): Option[Long] =
          if (p.takeKw("unbounded")) {
            // UNBOUNDED FOLLOWING as a lower bound (or PRECEDING as
            // an upper one) is meaningless — ANSI forbids it too
            if (isLower) { p.expectKw("preceding"); None }
            else { p.expectKw("following"); None }
          } else if (p.takeKw("current")) { p.expectKw("row"); Some(0L) }
          else {
            val n = p.uintLit()
            if (p.takeKw("preceding")) Some(-n)
            else { p.expectKw("following"); Some(n) }
          }
        if (p.takeKw("between")) {
          val lo = bound(isLower = true)
          p.expectKw("and")
          val hi = bound(isLower = false)
          Some(WFrame(mode, lo, hi))
        } else Some(WFrame(mode, bound(isLower = true), Some(0L)))
      } else None
    p.expectSym(")")
    WindowFn(f, parts.toSeq, ords.toSeq, frame)
  }

  private def caseExpr(p: P): Expr = {
    p.expectKw("case")
    // simple form `CASE x WHEN v THEN r …` desugars to the searched
    // form with equality conditions
    val subject = if (!p.isKw("when")) Some(expr(p)) else None
    val branches = ArrayBuffer.empty[(Expr, Expr)]
    while (p.takeKw("when")) {
      val c0 = expr(p)
      val c = subject.fold(c0)(s => BinOp("=", s, c0))
      p.expectKw("then")
      branches += ((c, expr(p)))
    }
    val other = if (p.takeKw("else")) Some(expr(p)) else None
    p.expectKw("end")
    if (branches.isEmpty) throw ParseError("CASE needs WHEN", p.pos)
    CaseExpr(branches.toSeq, other)
  }
}
