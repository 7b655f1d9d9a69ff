package graft.engine

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, PrintWriter}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal TCP wire protocol over [[Engine]] — the Spark-side
  * counterpart of the reference's session server (`ifc/nowdb.c`:
  * accept loop at :585-696 spawns one detached session thread per
  * connection; the session loop at :1505+ reads statements and
  * answers with status / report / cursor+rows frames, clients page
  * with FETCH/CLOSE). Here each connection gets its own Engine
  * session over the shared SparkSession and scope root, so sessions
  * see one catalog (and the engine's table write locks arbitrate
  * concurrent DML exactly as in-process callers do).
  *
  * Text line protocol (UTF-8, one statement per line, trailing `;`
  * optional; newlines/tabs/backslashes in cells escaped `\n` `\t`
  * `\\`, NULL as `\N`):
  *
  * {{{
  *   S: +ok graft <banner>
  *   C: <statement>
  *   S: +ok [msg]               (DDL/DML/USE/LOCK ok)
  *    | -err <message>          (any failure; session survives)
  *    | +report <loaded> <errors>       (CSV LOAD)
  *    | +cursor <id>            (SELECT — result parked as a cursor)
  *    | +batch <n> <more01>     (FETCH — then one #-prefixed header
  *                               line and n tab-separated row lines)
  *   C: fetch <id> | close <id> | quit
  * }}}
  *
  * The server thread and per-session threads are daemons; `stop()`
  * closes the listener and in-flight sessions clean up via
  * [[Engine.closeSession]] (cursor caches dropped, locks released) —
  * the reference's session teardown contract.
  */
class Server(spark: org.apache.spark.sql.SparkSession, root: String,
             port: Int = 0, pageSize: Int = 1000) {

  private val listener = new ServerSocket(port)
  @volatile private var running = true

  /** Ephemeral-port friendly (port = 0): the actually bound port. */
  def boundPort: Int = listener.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = listener.accept()
        val t = new Thread(() => session(sock))
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => // listener closed in stop()
      }
    }
  }, "graft-server-accept")
  acceptor.setDaemon(true)

  def start(): this.type = { acceptor.start(); this }

  def stop(): Unit = { running = false; listener.close() }

  private def session(sock: Socket): Unit = {
    val eng = new Engine(spark, root, cursorPageSize = pageSize)
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, UTF_8))
    val out = new PrintWriter(
      new OutputStreamWriter(sock.getOutputStream, UTF_8))
    out.println("+ok graft server ready")
    out.flush()
    try {
      var line = in.readLine()
      var open = true
      // row framing mode: text (TSV lines, default) or the reference's
      // binary typed-row frames (row.c:138-207) — per-session toggle,
      // wire-level like quit/exit, so it never reaches the parser
      var binary = false
      while (open && line != null && running) {
        val stmt = line.trim.stripSuffix(";").trim
        if (stmt.equalsIgnoreCase("quit") || stmt.equalsIgnoreCase("exit")) {
          out.println("+ok bye"); out.flush()
          open = false
        } else if (stmt.equalsIgnoreCase("mode binary") ||
            stmt.equalsIgnoreCase("mode text")) {
          binary = stmt.toLowerCase.endsWith("binary")
          out.println(s"+ok mode ${if (binary) "binary" else "text"}")
          out.flush()
          line = in.readLine()
        } else {
          if (stmt.nonEmpty) {
            if (binary) Wire.respondBinary(eng, stmt, out,
              sock.getOutputStream)
            else respond(eng, stmt, out)
            out.flush()
          }
          line = in.readLine()
        }
      }
    } catch {
      case _: java.io.IOException => // peer vanished — clean up below
    } finally {
      eng.closeSession()
      try sock.close() catch { case _: java.io.IOException => }
    }
  }

  private def respond(eng: Engine, stmt: String, out: PrintWriter): Unit =
    Wire.respond(eng, stmt, out)
}

/** Shared wire framing — used by [[Server]] sessions and by the
  * external-procedure bridge (which serves the SAME engine session to
  * a subprocess over a loopback socket). */
private[engine] object Wire {

  def respond(eng: Engine, stmt: String, out: PrintWriter): Unit =
    try eng.sql(stmt) match {
      case Batch(rows, schema, more) =>
        out.println(s"+batch ${rows.length} ${if (more) 1 else 0}")
        out.println("#" + schema.fieldNames.map(esc).mkString("\t"))
        rows.foreach { r =>
          out.println(schema.indices.map { i =>
            if (r.isNullAt(i)) "\\N" else esc(String.valueOf(r.get(i)))
          }.mkString("\t"))
        }
      case other => respondResult(other, eng, out)
    } catch {
      case e: Exception =>
        out.println(s"-err ${esc(String.valueOf(e.getMessage))}")
    }

  def esc(s: String): String = s
    .replace("\\", "\\\\").replace("\t", "\\t")
    .replace("\r", "\\r").replace("\n", "\\n")

  // ── binary typed-row framing ──────────────────────────────────────
  // The reference's row projection frames every field as
  // [1-byte type tag][value] with rows terminated by '\n'
  // (src/nowdb/query/row.c:138-207; tags types.h:89-99): TEXT(1) is a
  // NUL-terminated string, BOOL(9) one byte, NOTHING(0) one zero
  // byte, and all numerics 8 little-endian bytes (TIME(3) ns stamps,
  // FLOAT(4) IEEE doubles, INT(5)/UINT(6) int64). Head frames
  // (+ok/-err/+cursor/+batch) stay text lines in both modes — only
  // the rows after a +batch head switch representation, so a client
  // upgrades by reading N structured rows instead of N lines.
  private val TagNothing = 0.toByte
  private val TagText = 1.toByte
  private val TagTime = 3.toByte
  private val TagFloat = 4.toByte
  private val TagInt = 5.toByte
  private val TagBool = 9.toByte

  def respondBinary(eng: Engine, stmt: String, out: PrintWriter,
                    raw: java.io.OutputStream): Unit =
    try eng.sql(stmt) match {
      case Batch(rows, schema, more) =>
        out.println(s"+batch ${rows.length} ${if (more) 1 else 0}")
        out.println("#" + schema.fieldNames.map(esc).mkString("\t"))
        out.flush() // order the text head before the raw frames
        val bb = java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val bos = new java.io.BufferedOutputStream(raw)
        def num(tag: Byte, v: Long): Unit = {
          bos.write(tag.toInt)
          bb.clear(); bb.putLong(v)
          bos.write(bb.array(), 0, 8)
        }
        // engine time/date columns are ns LONGS in Spark — the schema
        // metadata marker from Engine.tableDf decides TIME vs INT
        val timeCol = schema.fields.map(f =>
          f.metadata.contains("graft.nowType") &&
            Set("time", "date")(f.metadata.getString("graft.nowType")))
        rows.foreach { r =>
          schema.indices.foreach { i =>
            if (r.isNullAt(i)) { bos.write(TagNothing.toInt); bos.write(0) }
            else r.get(i) match {
              case l: java.lang.Long =>
                num(if (timeCol(i)) TagTime else TagInt, l)
              case n: java.lang.Integer => num(TagInt, n.longValue)
              case d: java.lang.Double =>
                bos.write(TagFloat.toInt)
                bb.clear(); bb.putDouble(d)
                bos.write(bb.array(), 0, 8)
              case b: java.lang.Boolean =>
                bos.write(TagBool.toInt); bos.write(if (b) 1 else 0)
              case t: java.sql.Timestamp => // ns since epoch, TIME tag
                num(TagTime, Math.floorDiv(t.getTime, 1000L) *
                  1000000000L + t.getNanos.toLong)
              case other => // TEXT: NUL-terminated UTF-8
                bos.write(TagText.toInt)
                bos.write(String.valueOf(other)
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8))
                bos.write(0)
            }
          }
          bos.write('\n'.toInt)
        }
        bos.flush()
      case other => // non-row results frame identically in both modes
        respondResult(other, eng, out)
    } catch {
      case e: Exception =>
        out.println(s"-err ${esc(String.valueOf(e.getMessage))}")
    }

  /** Head-frame formatting shared by BOTH wire modes — one source of
    * truth for every non-row-data frame. */
  private def respondResult(res: Result, eng: Engine,
                            out: PrintWriter): Unit = res match {
    case Status(true, m) =>
      out.println(if (m.isEmpty) "+ok" else s"+ok ${esc(m)}")
    case Status(false, m) => out.println(s"-err ${esc(m)}")
    case Report(loaded, errors) => out.println(s"+report $loaded $errors")
    case Rows(df) =>
      // every remote result is a cursor (reference sendCursor,
      // ifc/nowdb.c:1185): the client decides the paging cadence
      out.println(s"+cursor ${eng.openCursor(df)}")
    case CursorRef(id) => out.println(s"+cursor $id")
    case b: Batch => // callers frame Batch themselves (mode-specific)
      out.println(s"+batch ${b.rows.length} ${if (b.more) 1 else 0}")
  }
}

/** Standalone daemon entry — the counterpart of the reference's
  * `nowdbd` (src/nowdbd/nowdbd.c): bring up a SparkSession, serve the
  * wire protocol until killed.
  *
  * Usage: sbt "runMain graft.engine.Server [port] [scopeRoot]"
  */
object Server {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(55505)
    val root = args.drop(1).headOption.getOrElse(
      sys.env.getOrElse("GRAFT_SCOPE_ROOT", "/tmp/graft-scopes"))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val srv = new Server(spark, root, port).start()
    println(s"graft server listening on ${srv.boundPort}, scopes at $root")
    Thread.currentThread.join() // serve until the process is killed
  }
}

/** Tiny blocking client for the [[Server]] line protocol — enough for
  * specs, external procedure bridges, and ad-hoc remote use. */
class WireClient(host: String, port: Int) {
  private val sock = new Socket(host, port)
  private val in = new BufferedReader(
    new InputStreamReader(sock.getInputStream, UTF_8))
  private val out = new PrintWriter(
    new OutputStreamWriter(sock.getOutputStream, UTF_8))
  require(in.readLine().startsWith("+ok"), "bad server greeting")

  /** Sends one statement; returns the raw response frame: the head
    * line plus (for `+batch`) the header and row lines. */
  def send(stmt: String): Seq[String] = {
    out.println(stmt.replace("\n", " ")); out.flush()
    val head = in.readLine()
    if (head == null) throw new java.io.EOFException("server closed")
    if (head.startsWith("+batch")) {
      val n = head.split(" ")(1).toInt
      head +: (0 to n).map(_ => in.readLine()) // header + n rows
    } else Seq(head)
  }

  /** SELECT → cursor → fetch all pages; returns unescaped cells. */
  def query(stmt: String): (Seq[String], Seq[Seq[String]]) = {
    val head = send(stmt).head
    require(head.startsWith("+cursor"), s"expected cursor, got: $head")
    val cur = head.split(" ")(1)
    var header: Seq[String] = Nil
    val rows = Seq.newBuilder[Seq[String]]
    var more = true
    while (more) {
      val frame = send(s"fetch $cur")
      require(frame.head.startsWith("+batch"), frame.head)
      more = frame.head.split(" ")(2) == "1"
      header = frame(1).stripPrefix("#").split("\t", -1).toSeq.map(unesc)
      frame.drop(2).foreach(l =>
        rows += l.split("\t", -1).toSeq.map(unesc))
    }
    (header, rows.result())
  }

  def close(): Unit = {
    try { out.println("quit"); out.flush(); in.readLine() }
    finally sock.close()
  }

  // single pass — sequential .replace would corrupt "\\n" (escaped
  // backslash + n) into backslash + newline
  private def unesc(s: String): String =
    if (s == "\\N") null
    else {
      val b = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => b += '\n'
            case 't' => b += '\t'
            case 'r' => b += '\r'
            case '\\' => b += '\\'
            case o => b += '\\'; b += o
          }
          i += 2
        } else { b += c; i += 1 }
      }
      b.toString
    }
}