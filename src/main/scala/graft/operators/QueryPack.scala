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
  /** Named memoized-artifact builders (r14 verdict task 6): forcing
    * one materializes a shared table several of the pack's queries
    * re-read (span sets, LSH pair sets, IVF assignments, trained
    * models, co-occurrence edges). The bench pre-builds and
    * SEPARATELY BILLS these, so suite rows measure steady-state query
    * cost instead of whichever consumer runs first absorbing a
    * multi-second build. Each builder must be idempotent (memoized). */
  def prebuilds: Map[String, (SparkSession, String) => Unit] = Map.empty
}
