package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution by BLOCKED fuzzy join — the record-linkage
  * primitive (Fellegi–Sunter tradition; blocking is the standard
  * public technique) that n-gram/MinHash dedup does not cover:
  * matching REFERENCES to entities ("Customer#00X000123" → customer
  * 123) under typos, where the unit is a short string and the
  * similarity is edit distance, not set overlap.
  *
  * Scale shape: candidate pairs only form inside blocks keyed by a
  * cheap deterministic function of the name (suffix, phonetic code,
  * sorted-neighborhood key) — one equi-join shuffle on the block key
  * turns the O(n·m) all-pairs edit-distance sweep into
  * Σ |dirty_b|·|clean_b|, linear while block sizes stay bounded.
  * The verify predicate is exact Levenshtein (codegen'd built-in),
  * so blocking only bounds RECALL, never precision: a true match
  * whose edit damages the block key escapes its block, which is why
  * production linkage runs 2–3 passes with complementary keys.
  * Callers pick `blockKey` so the edits they expect preserve it. */
object Linkage {

  /** Match each dirty record to clean records within `maxDist` edits,
    * candidate-bounded by equal block keys. Output: one row per
    * (dirty, clean) pair that verifies — (dirty_id, clean_id, dist). */
  def blockedFuzzyJoin(dirty: DataFrame, dirtyId: String,
                       dirtyName: String,
                       clean: DataFrame, cleanId: String,
                       cleanName: String,
                       blockKey: Column => Column,
                       maxDist: Int): DataFrame = {
    val d = dirty.select(col(dirtyId).as("dirty_id"),
      col(dirtyName).as("dirty_name"),
      blockKey(col(dirtyName)).as("bk"))
    val c = clean.select(col(cleanId).as("clean_id"),
      col(cleanName).as("clean_name"),
      blockKey(col(cleanName)).as("bk"))
    d.join(c, "bk")
      .withColumn("dist",
        levenshtein(col("dirty_name"), col("clean_name")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("dirty_id"), col("clean_id"), col("dist"))
  }

  /** Last-`n`-characters block key — survives any edit that happens
    * before the suffix (the common case for id-like names whose tails
    * are the high-entropy part). Names shorter than `n` key on the
    * whole string (start clamps to 1 — Spark and DuckDB disagree on
    * substr with start < 1, so the clamp is part of the contract). */
  def suffixKey(n: Int): Column => Column =
    name => name.substr(greatest(lit(1), length(name) - (n - 1)), lit(n))
}
