package graft.engine

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** `SparkSessionExtensions` integration: the NoWDB dialect mounted at
  * the session's front door via `injectParser` (SURVEY §4.3 item 1 —
  * the recommended integration point for a dialect Spark's own parser
  * cannot express).
  *
  * Routing rule: statements only the reference grammar knows —
  * `CREATE SCOPE/TYPE/EDGE/…`, `EXEC`, `FETCH/CLOSE`, `LOCK/UNLOCK`,
  * `SHOW types/edges/…` — always run through [[Engine]]; ambiguous
  * leads route by their target (`USE` only for names that are scopes,
  * `DESC`/`INSERT`/`UPDATE`/`DELETE` only for current-scope tables,
  * `LOAD` never in Hive's `LOAD DATA` form); everything else falls
  * through to Spark's delegate parser untouched. After each engine statement the current scope's tables
  * are (re)published as temp views, so plain Spark SQL — the
  * capability superset — queries them directly:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   .config("spark.graft.root", "/data/scopes").getOrCreate()
  * spark.sql("CREATE SCOPE sales")         // engine DDL
  * spark.sql("USE sales")
  * spark.sql("CREATE TYPE product (id uint PK, price float)")
  * spark.sql("INSERT INTO product (id, price) VALUES (1, 9.99)")
  * spark.sql("SELECT sum(price) FROM product")  // plain Spark SQL
  * }}}
  *
  * Engine statements execute when the plan is built (`spark.sql` call
  * time), returning their Status/Report rows as a LocalRelation-backed
  * DataFrame; `Rows` results stay lazy (the engine's own logical plan
  * is returned unexecuted). The strict-parity DQL path (NoWDB quirks
  * like `IS` only for NULL) remains on the `Engine.sql` facade.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectParser { case (session, delegate) =>
      new GraftParser(session, delegate)
    }
}

object GraftExtensions {
  // One engine per session for the session's lifetime (an Engine holds
  // cursors/locks/attached frames, so entries live as long as their
  // session — a per-request-session server should reuse sessions or
  // route through one engine).
  private val engines = new ConcurrentHashMap[SparkSession, Engine]()

  /** The per-session engine backing intercepted statements; root dir
    * from `spark.graft.root` (default: a session-scoped temp dir). */
  def engineFor(session: SparkSession): Engine =
    engines.computeIfAbsent(session, s => {
      val root = s.conf.getOption("spark.graft.root").getOrElse(
        java.nio.file.Files.createTempDirectory("graft-scopes").toString)
      new Engine(s, root)
    })

  /** The session's engine if one was already created — routing checks
    * use this so that merely PARSING a non-dialect statement never
    * instantiates an engine (no UDF registration, no temp dirs). */
  def existingEngineFor(session: SparkSession): Option[Engine] =
    Option(engines.get(session))
}

class GraftParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def engine: Engine = GraftExtensions.engineFor(session)

  private val graftLead = Set("exec", "fetch", "close", "lock", "unlock")
  private val graftCreatables = Set("scope", "type", "edge", "storage",
    "context", "procedure", "lock", "index", "tiny", "small", "big",
    "huge")
  private val graftShowables = Set("scopes", "types", "edges",
    "procedures", "stores", "storages", "indexes", "locks")

  /** True iff the statement belongs to the NoWDB dialect. Ambiguous
    * leads route by target: `USE` goes to the engine only when the
    * name IS a scope (Spark's USE <database> keeps working), `DESC`
    * and DML only when the target is a current-scope table, `LOAD`
    * only in the dialect's `LOAD '<file>' INTO` form (never Hive's
    * LOAD DATA). Routing never instantiates an engine — before any
    * dialect statement has run there is nothing to route to. */
  private def isGraft(sqlText: String): Boolean = {
    val toks = sqlText.trim.toLowerCase.split("[\\s(]+").toSeq
    def eng = GraftExtensions.existingEngineFor(session)
    def scopeTable(tok: Option[String]): Boolean = tok.exists(t =>
      eng.exists(_.scopeTables.exists(_.equalsIgnoreCase(t))))
    toks.headOption match {
      case Some(k) if graftLead(k) => true
      case Some("create") | Some("drop") =>
        toks.lift(1).exists(graftCreatables)
      case Some("show") => toks.lift(1).exists(graftShowables)
      case Some("use") => // a scope of THIS session's engine root?
        toks.lift(1).exists(n =>
          eng.exists(_.hasScope(n)) ||
            // no engine yet: only probe (and thereby create) one when
            // the user explicitly configured a graft root
            (eng.isEmpty &&
              session.conf.getOption("spark.graft.root").isDefined &&
              GraftExtensions.engineFor(session).hasScope(n)))
      case Some("load") => toks.lift(1).exists(_ != "data")
      // WITH RECURSIVE (r15 verdict task 7): route by target, like
      // USE/DESC. The engine's semi-naive fixpoint wins when every
      // referenced table is an engine table (scope/attached/view) —
      // that path also runs the UNION-distinct cyclic mode Spark
      // 4.1's native recursion (UNION ALL only) rejects. Queries over
      // Spark-catalog tables fall through to Spark's native
      // recursion untouched. Plain WITH (no RECURSIVE) always stays
      // with Spark.
      case Some("with") if toks.lift(1).contains("recursive") =>
        eng.exists(e =>
          try e.resolvesAllTables(graft.sql.Parser.parse(sqlText))
          catch { case scala.util.control.NonFatal(_) => false })
      case Some("desc") => scopeTable(toks.lift(1))
      case Some("insert") => scopeTable(toks.lift(2))
      case Some("update") => scopeTable(toks.lift(1))
      case Some("delete") => scopeTable(toks.lift(2))
      case _ => false
    }
  }

  private def publishViews(): Unit =
    engine.scopeTables.foreach { t =>
      try engine.tableDf(t).createOrReplaceTempView(t)
      catch { // e.g. dropped mid-statement — skip, but say so
        case e: Exception =>
          System.err.println(s"[graft] temp view '$t' not refreshed: $e")
      }
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    if (!isGraft(sqlText)) delegate.parsePlan(sqlText)
    else {
      import session.implicits._
      val plan = engine.sql(sqlText) match {
        case Rows(df) => df.queryExecution.logical
        case Status(ok, msg) =>
          Seq((ok, msg)).toDF("ok", "msg").queryExecution.logical
        case Report(loaded, errors) =>
          Seq((loaded, errors)).toDF("loaded", "errors")
            .queryExecution.logical
        case CursorRef(id) =>
          Seq(id).toDF("cursor_id").queryExecution.logical
      }
      publishViews()
      plan
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
