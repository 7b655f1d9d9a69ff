package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph-operator coverage over the TPC-H relationship structure:
  * customer —orders→ order —lineitem→ supplier forms a two-layer
  * edge set (exactly NoWDB's origin/destin shape). */
object GraphQueries extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // in/out degree over the customer→order edge set
    "q68_graph_degrees" -> ((s, d) => {
      val e = Tables.orders(s, d)
        .select(col("o_custkey").as("src"), col("o_orderkey").as("dst"))
      Graph.degrees(e, "src", "dst")
        .filter(col("out_deg") > 0) // customer side (orders have in=1)
        .select(col("vertex"), col("out_deg"))
    }),
    // two-hop motif: customers reaching suppliers through orders
    "q69_graph_two_hop" -> ((s, d) => {
      val co = Tables.orders(s, d)
        .select(col("o_custkey").as("c"), col("o_orderkey").as("o"))
      val os = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_suppkey").as("sup"))
      Graph.twoHop(co, "c", "o", os, "o", "sup")
        .groupBy(col("a").as("custkey"))
        .agg(countDistinct(col("c")).as("n_suppliers"))
    }),
    // supplier pairs sharing >= 30 orders (co-occurrence graph)
    "q70_graph_common" -> ((s, d) =>
      Graph.commonNeighborPairs(Tables.lineitem(s, d),
        "l_orderkey", "l_suppkey", minShared = 30L)
        .select(col("d_a").as("supp_a"), col("d_b").as("supp_b"),
          col("shared")))
  )

  val oracles: Map[String, String] = Map(
    "q68_graph_degrees" ->
      """SELECT o_custkey AS vertex, count(*) AS out_deg
        | FROM orders GROUP BY o_custkey""".stripMargin,
    "q69_graph_two_hop" ->
      """SELECT o.o_custkey AS custkey,
        |  count(DISTINCT l.l_suppkey) AS n_suppliers
        | FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        | GROUP BY o.o_custkey""".stripMargin,
    "q70_graph_common" ->
      """WITH e AS (SELECT DISTINCT l_orderkey AS s, l_suppkey AS d
        |   FROM lineitem)
        | SELECT x.d AS supp_a, y.d AS supp_b, count(*) AS shared
        | FROM e x JOIN e y ON x.s = y.s AND x.d < y.d
        | GROUP BY x.d, y.d HAVING count(*) >= 30""".stripMargin
  )
}
