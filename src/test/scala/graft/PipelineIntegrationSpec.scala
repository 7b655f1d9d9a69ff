package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextAnalysis}

/** Capstone integration: the full training-data build — quality/lang
  * gates → exact dedup → near-dup purge (curateCorpus) → leakage-safe
  * split — run end to end on a salted corpus, with the INVARIANTS
  * each stage claims asserted across stage boundaries:
  *
  *  1. survivors carry no exact duplicates and no near-dup pair at
  *     the curation threshold (verified by an independent exact
  *     Jaccard recompute, not by trusting the LSH);
  *  2. the cluster-root split never separates near-duplicates
  *     (the q153 leakage guarantee), checked against the survivor
  *     corpus's own pair set;
  *  3. the dataset-card-style totals recount exactly on the survivor
  *     frame (no silent row loss between stages).
  */
class PipelineIntegrationSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("gate -> dedup -> purge -> split composes with invariants held") {
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    // salt: exact copies of every 5th doc, near-dup mutations of the
    // even docs — the pipeline must strip both
    val corpus = base
      .unionAll(base.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 20000L).as("doc_id"), col("text")))
      .unionAll(base.filter(col("doc_id") % 2 === 0).select(
        (col("doc_id") + 10000L).as("doc_id"),
        concat(col("text"), lit(" zq0 zq1 zq2")).as("text")))

    val survivors = TextAnalysis.curateCorpus(corpus, "doc_id", "text")
      .join(corpus, "doc_id").persist()
    val n = survivors.count()
    assert(n > 0)

    // 1a. no exact dups among survivors
    assert(survivors.select(md5(col("text"))).distinct().count() == n)
    // 1b. no near-dup pair at tau among survivors — EXACT recompute
    val residual = Dedup.ngramJaccardPairs(survivors, "doc_id", "text",
      n = 3, tau = 0.5)
    assert(residual.count() == 0)

    // 2. split by cluster root on the ORIGINAL corpus: no minhash
    // pair may span train/test
    val pairs = Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
      shingleN = 3, k = 32, bands = 16, tau = 0.5).persist()
    val clusters = Dedup.nearDupClusters(pairs)
    val splitDf = corpus.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("root"))
      .withColumn("split",
        when(pmod(col("root") * 2654435761L, lit(100L)) < 80,
          lit("train")).otherwise(lit("test")))
    val crossSplit = pairs
      .join(splitDf.select(col("doc_id").as("doc_a"),
        col("split").as("sa")), Seq("doc_a"))
      .join(splitDf.select(col("doc_id").as("doc_b"),
        col("split").as("sb")), Seq("doc_b"))
      .filter(col("sa") =!= col("sb"))
    assert(crossSplit.count() == 0)

    // 3. card totals recount on the survivor frame
    val card = survivors.agg(count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " "))).as("n_tokens")).collect()(0)
    assert(card.getLong(0) == n)
    val tokens = survivors.select(size(split(col("text"), " ")))
      .as[Int].collect().map(_.toLong).sum
    assert(card.getLong(1) == tokens)
    survivors.unpersist(); pairs.unpersist()
  }
}
