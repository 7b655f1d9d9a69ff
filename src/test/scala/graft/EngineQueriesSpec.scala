package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EngineQueries

/** The four engine-surface queries are value-checked by the driver's
  * DuckDB oracle; this spec pins their structural invariants at
  * sf0.001 so a regression fails fast locally. */
class EngineQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("q173 LOAD round-trip rejects corrupted rows, keeps the rest") {
    val got = EngineQueries.queries("q173_load_roundtrip")(spark, d)
      .collect()
    val total = got.map(_.getLong(1)).sum
    val expected = Tables.customer(spark, d)
      .filter(org.apache.spark.sql.functions.col("c_custkey") % 97 =!= 0)
      .count()
    assert(total == expected)
  }

  test("q174 DML round-trip applies insert/update/delete, rejects dup PK") {
    val got = EngineQueries.queries("q174_dml_roundtrip")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(99L) == 2L) // both literal rows, dup rejected
  }

  test("q175 cursor pages are full except the last") {
    val got = EngineQueries.queries("q175_cursor_pages")(spark, d)
      .collect().sortBy(_.getLong(0))
    assert(got.nonEmpty)
    got.dropRight(1).foreach(r => assert(r.getLong(1) == 256L))
    assert(got.last.getLong(1) <= 256L)
  }

  test("q186 proc EXEC integral matches a lag-window recompute") {
    val got = EngineQueries.queries("q186_proc_exec")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val src = Tables.events(spark, d)
      .filter(col("user_id") < 3 && col("ts") < 1704931200000000000L)
      .select(col("user_id"), (col("ts") - col("ts") % 1000).as("stamp"),
        round(col("value")).cast("long").as("val"))
    val w = Window.partitionBy("user_id").orderBy("stamp")
    val exp = src.withColumn("prev", lag(col("stamp"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("user_id"))
      .agg((sum((col("stamp") - col("prev")) * col("val"))
        .cast("double") / 3600000000000.0).as("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the Lua cursor fold and the window recompute run the same
    // exact-int64 sum and one final double division — equality is
    // strict, not tolerance-based
    exp.foreach { case (k, v) => assert(got(k) == v, s"origin $k") }
  }

  test("q176 DDL catalog reflects create/drop and DESC order") {
    val got = EngineQueries.queries("q176_ddl_catalog")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("type", "person")))
    assert(!got.exists(_._2 == "gone")) // dropped type absent
    assert(got.contains(("edge_col", "stamp:time")))
  }
}
