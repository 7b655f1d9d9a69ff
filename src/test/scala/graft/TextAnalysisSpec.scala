package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat and the dog sat in the garden of the house to rest"),
    (2L, "der hund und der schnelle fuchs, ein tier!"),
    (3L, "x")
  ).toDF("doc_id", "text")

  test("languageId picks the max-scoring profile with alpha tie-break") {
    val out = TextAnalysis.languageId(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "en")
    assert(out(1).getString(1) == "de")
    // doc 3 "x": all profiles score 0 → alphabetically first language
    assert(out(2).getString(1) == "de" && out(2).getLong(2) == 0L)
  }

  test("qualityScore features are exact integer-derived ratios") {
    val r = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .filter($"doc_id" === 1L).collect()(0)
    assert(r.getAs[Long]("n_words") == 14L)
    assert(r.getAs[Double]("stop_ratio") == math.rint(8.0 / 14.0 * 1e6) / 1e6
      || (r.getAs[Double]("stop_ratio") - 8.0 / 14.0).abs < 1e-6)
    assert(r.getAs[Double]("quality") == 1.0) // >=10 words, stops, no punct
  }

  test("tokenCounts: ws vs regex vs bpe estimate") {
    val r = TextAnalysis.tokenCounts(docs, "doc_id", "text")
      .filter($"doc_id" === 2L).collect()(0)
    assert(r.getAs[Long]("ws_tokens") == 8L)
    // regex splits "fuchs," into word+mark and "tier!" likewise
    assert(r.getAs[Long]("re_tokens") == 10L)
    assert(r.getAs[Long]("bpe_est") ==
      math.ceil("der hund und der schnelle fuchs, ein tier!".length / 4.0).toLong)
  }

  test("fingerprints: rolling hash matches a scala reimplementation") {
    val M = 1000000007L
    def poly(s: String): Long = s.foldLeft(0L)((h, c) => (h * 31 + c) % M)
    val txt = "the cat and the dog sat in the garden of the house to rest"
    val expWin = (0 to txt.length - 8).map(i => poly(txt.substring(i, i + 8))).min
    val r = TextAnalysis.fingerprints(docs, "doc_id", "text")
      .filter($"doc_id" === 1L).collect()(0)
    assert(r.getAs[Long]("doc_hash") == poly(txt))
    assert(r.getAs[Long]("winnow_min") == expWin)
  }
}
