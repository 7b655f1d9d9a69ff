package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.engine.{GraftExtensions, Result, Rows, Status}

/** End-to-end SparkSessionExtensions check: NoWDB dialect statements
  * through plain `spark.sql`, scope tables visible to Spark SQL. */
class GraftExtensionsSpec extends AnyFunSuite {

  // own session: extensions bind at build time (shares the test
  // JVM's SparkContext with TestSpark's session)
  private lazy val spark: SparkSession = {
    val base = TestSpark.spark // ensure the context exists
    // getOrCreate() would silently return the existing default
    // session and skip withExtensions — clear, build, restore.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.graft.root",
        java.nio.file.Files.createTempDirectory("graft-ext").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  test("dialect DDL/DML via spark.sql, then plain Spark SQL reads") {
    assert(spark.sql("CREATE SCOPE extsales").collect()
      .head.getBoolean(0), "create scope")
    assert(spark.sql("USE extsales").collect().head.getBoolean(0))
    assert(spark.sql(
      "CREATE TYPE product (id uint PK, price float)").collect()
      .head.getBoolean(0))
    assert(spark.sql(
      "INSERT INTO product (id, price) VALUES (1, 9.99)").collect()
      .head.getBoolean(0))
    spark.sql("INSERT INTO product (id, price) VALUES (2, 20.01)")
    // scope table published as a temp view → full Spark SQL superset
    val sum = spark.sql("SELECT sum(price) AS s FROM product")
      .collect().head.getDouble(0)
    assert(math.abs(sum - 30.0) < 1e-9, s"sum=$sum")
    // PK violation surfaces as a failed Status row
    val dup = spark.sql(
      "INSERT INTO product (id, price) VALUES (1, 1.0)").collect().head
    assert(!dup.getBoolean(0) && dup.getString(1).contains("key"),
      dup.toString)
  }

  test("SHOW/DESC route to the engine; regular SQL untouched") {
    val types = spark.sql("SHOW types").collect()
    assert(types.exists(_.toString.contains("product")))
    val desc = spark.sql("DESC product").collect()
    assert(desc.exists(_.toString.contains("price")))
    // a statement the dialect doesn't know still parses as Spark SQL
    assert(spark.sql("SELECT 1 + 1").collect().head.get(0) == 2)
    assert(spark.range(3).count() == 3)
  }

  test("mixed-case scope tables route DML to the engine") {
    spark.sql("CREATE TYPE Gadget (id uint PK, nm text)")
    val r = spark.sql(
      "INSERT INTO Gadget (id, nm) VALUES (7, 'x')").collect().head
    assert(r.getBoolean(0), r.toString)
    assert(spark.sql("SELECT count(*) AS n FROM gadget")
      .collect().head.getLong(0) == 1L)
  }

  test("USE of a non-scope name stays Spark SQL") {
    // extsales is a scope → engine; 'default' is not → delegate parser
    val e = intercept[Exception](spark.sql("USE no_such_db_anywhere"))
    // Spark's analyzer error (db not found), NOT an engine Status row
    assert(e.getMessage.toLowerCase.contains("schema")
      || e.getMessage.toLowerCase.contains("database"), e.getMessage)
  }

  test("EXEC runs a registered procedure that re-enters the engine") {
    GraftExtensions.engineFor(spark).registerProcedure("pcount",
      (eng, _) => eng.sql("SELECT count(*) FROM product") match {
        case r: Rows => r
        case other => other
      })
    val n = spark.sql("EXEC pcount()").collect().head.getLong(0)
    assert(n == 2L, s"n=$n")
  }

  test("WITH RECURSIVE routes by target: engine fixpoint for engine " +
    "tables (UNION-distinct cycles), Spark native for Spark tables") {
    // an engine table forming a 10-node ring (v -> (v+1) % 10): the
    // UNION-distinct reachability only terminates on the ENGINE's
    // fixpoint — Spark 4.1's native recursion supports UNION ALL
    // only, so reaching the engine is observable from the result
    // (a native route would throw, a bag route would loop to the
    // depth cap)
    assert(spark.sql("CREATE TYPE ringnode (v uint PK)").collect()
      .head.getBoolean(0))
    (0 until 10).foreach(i => spark.sql(
      s"INSERT INTO ringnode (v) VALUES ($i)"))
    val reach = spark.sql(
      "WITH RECURSIVE r AS (" +
        "  SELECT v FROM ringnode WHERE v = 0 " +
        "  UNION " +
        "  SELECT n.v FROM r JOIN ringnode n ON n.v = (r.v + 1) % 10) " +
        "SELECT count(*) AS n, sum(v) AS s FROM r").collect().head
    assert(reach.getLong(0) == 10L && reach.getLong(1) == 45L,
      reach.toString)
    // a Spark-only temp view is NOT an engine table → the statement
    // falls through to Spark's native recursion (UNION ALL mode),
    // untouched by the dialect
    spark.range(1, 6).toDF("k").createOrReplaceTempView("sparkonly")
    val native = spark.sql(
      "WITH RECURSIVE cnt AS (" +
        "  SELECT CAST(1 AS LONG) AS x " +
        "  UNION ALL " +
        "  SELECT x + 1 FROM cnt WHERE x < 5) " +
        "SELECT count(*) AS n FROM cnt JOIN sparkonly ON k = x")
      .collect().head
    assert(native.getLong(0) == 5L, native.toString)
  }
}
