package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Record-linkage coverage: blocked fuzzy joins over a
  * deterministically dirtied customer register. The dirty copy
  * substitutes position 12 of every name with 'X' (a fixed-position
  * typo inside the low-entropy digit run), so each dirty record has
  * EXACTLY one true match at distance 1 and the last-4-suffix block
  * key provably survives the edit — both engines recompute the
  * identical pair set, making the oracle exact rather than
  * recall-qualified. */
object LinkageQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Blocked fuzzy join: 15k-name register, suffix-4 blocking,
    // Levenshtein <= 1 verify. One equi-join shuffle; block sizes are
    // bounded by suffix cardinality, so candidates grow linearly.
    "q189_fuzzy_link" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"))
      val dirty = cust.select(
        (col("c_custkey") + 1000000L).as("id"),
        concat(substring(col("c_name"), 1, 11), lit("X"),
          substring(col("c_name"), 13, 64)).as("name"))
      Linkage.blockedFuzzyJoin(
        dirty, "id", "name", cust, "c_custkey", "c_name",
        Linkage.suffixKey(4), maxDist = 1)
    })
  )

  val oracles: Map[String, String] = Map(
    "q189_fuzzy_link" ->
      """WITH dirty AS (SELECT c_custkey + 1000000 AS did,
        |   substr(c_name, 1, 11) || 'X' || substr(c_name, 13)
        |     AS dname
        |  FROM customer),
        | db AS (SELECT did, dname,
        |   substr(dname, greatest(1, length(dname) - 3), 4) AS bk
        |  FROM dirty),
        | cb AS (SELECT c_custkey AS cid, c_name AS cname,
        |   substr(c_name, greatest(1, length(c_name) - 3), 4) AS bk
        |  FROM customer)
        | SELECT did AS dirty_id, cid AS clean_id,
        |  CAST(levenshtein(dname, cname) AS BIGINT) AS dist
        | FROM db JOIN cb USING (bk)
        | WHERE levenshtein(dname, cname) <= 1""".stripMargin
  )
}
