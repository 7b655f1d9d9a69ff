package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Graph operators over the NoWDB edge model (SURVEY §1.1: a graph is
  * vertex-type tables + edge tables with origin/destin FKs; M6 in the
  * build plan). GraphFrames-style: a graph is just a pair of
  * DataFrames, every operator is a join/agg pipeline Catalyst can
  * optimize — no bespoke graph runtime.
  *
  * Scale: degree/neighbor ops are single shuffles on vertex ids;
  * multi-hop ops chain equi-joins (AQE picks broadcast vs SMJ by
  * side size); connected components is iterative min-label
  * propagation with per-iteration localCheckpoint to keep lineage
  * flat — the standard large-graph pattern.
  */
object Graph {

  /** In/out degree per vertex. */
  def degrees(edges: DataFrame, src: String, dst: String): DataFrame = {
    val out = edges.groupBy(col(src).as("vertex"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col(dst).as("vertex"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("vertex"), "full_outer")
      .select(col("vertex"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Two-hop motif a→b→c across two edge sets: (a)-[e1]->(b)-[e2]->(c). */
  def twoHop(e1: DataFrame, src1: String, dst1: String,
             e2: DataFrame, src2: String, dst2: String): DataFrame =
    e1.select(col(src1).as("a"), col(dst1).as("b"))
      .join(e2.select(col(src2).as("b"), col(dst2).as("c")), "b")
      .select(col("a"), col("b"), col("c"))

  /** Vertex pairs on the `dst` side sharing at least `minShared`
    * common `src` neighbors (co-occurrence graph). One shuffle on the
    * src id (groupBy + collect_set, map-side combined) and in-row pair
    * expansion — instead of the textbook self-join, which shuffles the
    * edge set three times (distinct, join, count) and re-scans it
    * twice. Pairs per src still grow quadratically with out-degree,
    * so skewed hubs should be capped upstream at extreme scale. */
  def commonNeighborPairs(edges: DataFrame, src: String, dst: String,
                          minShared: Long): DataFrame =
    edges.select(col(src).as("s"), col(dst).as("d"))
      .groupBy(col("s"))
      .agg(sort_array(collect_set(col("d"))).as("ds"))
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds")) - i - 1),
          y => struct(x.as("d_a"), y.as("d_b")))))).as("p"))
      .groupBy(col("p.d_a").as("d_a"), col("p.d_b").as("d_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)

  /** Undirected connected components by min-label propagation.
    * Converges in O(diameter) iterations; each iteration is one
    * shuffle + localCheckpoint (flat lineage, AQE-sized). */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
                          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(src).as("a"), col(dst).as("b"))
      .unionAll(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct().localCheckpoint()
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("comp", col("v")).localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val prop = sym.join(labels, sym("b") === labels("v"))
        .groupBy(col("a")).agg(min(col("comp")).as("nc"))
      val next = labels.join(prop, labels("v") === prop("a"), "left")
        .select(col("v"),
          least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("comp", "old"), "v")
        .filter(col("comp") =!= col("old")).isEmpty
      labels = next
      it += 1
    }
    labels
  }
}
