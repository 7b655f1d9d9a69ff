package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus (where SQL-expressible) the DuckDB
  * oracle SQL the driver uses for differential checking. Mirrors the
  * reference's differential-test strategy (SURVEY.md §5: pysmoke
  * recomputes expected values independently).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** Subset of `queries` keys that have an ANSI-SQL oracle. */
  def oracles: Map[String, String]
}
