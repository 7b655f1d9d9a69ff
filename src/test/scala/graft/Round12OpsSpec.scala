package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupQueries, TextQueries}

/** Round-12 operators: q376 (BPE tokenizer application) and q377
  * (duplicated-substring span accounting). The oracle gate proves
  * cross-engine equality; these pin the SEMANTICS against independent
  * in-memory recomputes — a straightforward mutable greedy BPE encoder
  * and a brute-force interval-union — over the real sf0.001 corpus,
  * so a matched-but-wrong pair of SQL formulations cannot pass.
  */
class Round12OpsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val sf = TestSpark.sfDir

  // ---- independent greedy one-pass BPE (textbook mutable scan) ----
  private def greedyMerge(syms: Vector[String], a: String,
      b: String): (Vector[String], Int) = {
    val out = Vector.newBuilder[String]
    var i = 0
    var applied = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); applied += 1; i += 2
      } else { out += syms(i); i += 1 }
    }
    (out.result(), applied)
  }

  private lazy val vocab: Map[String, Long] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    docs.flatMap(_.split(" "))
      .filter(_.matches("^[a-z]{2,20}$"))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
  }

  test("q376 encode: per-round merges_applied and tokens_after match " +
    "an independent mutable greedy encoder over the same vocab") {
    var cur: Map[Vector[String], Long] =
      vocab.map { case (w, c) => w.map(_.toString).toVector -> c }
    val expected = TextQueries.bpeMerges.zipWithIndex.map {
      case ((a, b), r) =>
        var merges = 0L
        cur = cur.map { case (syms, c) =>
          val (next, applied) = greedyMerge(syms, a, b)
          merges += applied * c
          next -> c
        }
        val tokens = cur.map { case (s, c) => s.length * c }.sum
        (r + 1L, a, b, merges, tokens)
    }
    val got = SparkEntry.queries("q376_bpe_encode")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == expected)
    // the fixture's merge chain actually fires: every round applies
    // at least one merge on this corpus, and later rounds consume
    // earlier rounds' multi-char symbols
    assert(got.forall(_._4 > 0))
    assert(got.map(_._5) == got.map(_._5).sorted.reverse) // monotone
  }

  test("q376 encode: equal-symbol runs merge left-to-right " +
    "non-overlapping (run parity), including odd runs >= 5") {
    // "aaaaa" -> aa aa a (NOT aa a aa); "abab" -> ab ab in ONE round
    assert(greedyMerge(Vector("a", "a", "a", "a", "a"), "a", "a")
      == (Vector("aa", "aa", "a"), 2))
    assert(greedyMerge(Vector("a", "b", "a", "b"), "a", "b")
      == (Vector("ab", "ab"), 2))
    // and the PRODUCTION round (TextQueries.bpeRound — the exact
    // code q376/q380 run) agrees on exactly these shapes:
    import spark.implicits._
    val df = Seq(("w1", 1L, "a a a a a"), ("w2", 1L, "a b a b"))
      .toDF("w", "c", "s")
    def applyPair(a: String, b: String) =
      TextQueries.bpeRound(df, a, b)
        .collect().map(r => r.getAs[String]("w") ->
          r.getAs[String]("s")).toMap
    assert(applyPair("a", "a")("w1") == "aa aa a")
    assert(applyPair("a", "b")("w2") == "ab ab")
  }

  // ---- independent interval-union for duplicated spans ----
  test("q377 spans: per-doc span counts and duplicated-token totals " +
    "match a brute-force recompute (8-gram, >=2 distinct docs)") {
    val K = 8
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // DedupQueries.corpus planted mutations: even ids duplicated at
    // +10000 with a 3-token suffix
    val corpus = base ++ base.filter(_._1 % 2 == 0)
      .map { case (id, t) => (id + 10000L) -> (t + " zq0 zq1 zq2") }
    val shingles = corpus.flatMap { case (id, t) =>
      val ws = t.split(" ")
      if (ws.length < K) Seq.empty
      else (0 to ws.length - K).map(i =>
        (ws.slice(i, i + K).mkString(" "), id, i))
    }
    val dupSet = shingles.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.length > 1).keySet
    val expected = corpus.flatMap { case (id, t) =>
      val ws = t.split(" ")
      val marks = (0 to math.max(ws.length - K, -1)).filter(i =>
        ws.length >= K && dupSet(ws.slice(i, i + K).mkString(" ")))
        .map(i => (i.toLong, i + K - 1L))
      if (marks.isEmpty) None
      else {
        // fuse overlapping/touching intervals
        val spans = marks.foldLeft(Vector.empty[(Long, Long)]) {
          case (acc, (s, e)) =>
            if (acc.nonEmpty && s <= acc.last._2 + 1)
              acc.init :+ (acc.last._1, math.max(acc.last._2, e))
            else acc :+ (s, e)
        }
        val dupTokens = spans.map(p => p._2 - p._1 + 1).sum
        Some((id, spans.length.toLong, dupTokens, ws.length.toLong,
          dupTokens * 1000000L / ws.length))
      }
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q377_dup_spans")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == expected)
    assert(got.nonEmpty) // the planted dups guarantee hits
    // every planted original/mutation pair is fully covered
    got.filter(t => t._1 >= 10000L).foreach { t =>
      assert(t._5 == 1000000L ||
        t._3 >= t._4 - 3) // suffix tokens may fall outside dup 8-grams
    }
  }

  test("q378 removal: kept_tokens complements q377's dup_tokens " +
    "exactly, clean_text re-joins the surviving tokens in order, and " +
    "fully-duplicated docs survive as the empty string") {
    val audit = SparkEntry.queries("q377_dup_spans")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3))).toMap // dup_tokens, n_tokens
    val removed = SparkEntry.queries("q378_dup_span_removal")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(removed.map(_._1).toSet == audit.keySet)
    removed.foreach { case (id, nTok, kept, clean) =>
      val (dup, nTok2) = audit(id)
      assert(nTok == nTok2)
      assert(kept == nTok - dup, s"doc $id")
      val cleanCount = if (clean.isEmpty) 0L
        else clean.split(" ").length.toLong
      assert(cleanCount == kept, s"doc $id clean_text token count")
      if (dup == nTok) assert(clean == "", s"doc $id should be empty")
    }
    // the planted whole-doc duplicates guarantee at least one
    // fully-removed doc and the corpus guarantees partial survivors
    assert(removed.exists(_._4 == ""))
    assert(removed.exists(r => r._3 > 0 && r._3 < r._2))
  }

  test("q379 contamination: train-doc spans against the %97 eval " +
    "set match a brute-force recompute, and eval docs never appear") {
    val K = 8
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val corpus = base ++ base.filter(_._1 % 2 == 0)
      .map { case (id, t) => (id + 10000L) -> (t + " zq0 zq1 zq2") }
    def isEval(id: Long) = id % 97 == 0 && id < 10000
    val evalSh = corpus.filter(c => isEval(c._1)).flatMap { case (_, t) =>
      val ws = t.split(" ")
      if (ws.length < K) Seq.empty
      else (0 to ws.length - K).map(i => ws.slice(i, i + K).mkString(" "))
    }.toSet
    val expected = corpus.filterNot(c => isEval(c._1))
      .flatMap { case (id, t) =>
        val ws = t.split(" ")
        val marks = (0 to math.max(ws.length - K, -1)).filter(i =>
          ws.length >= K && evalSh(ws.slice(i, i + K).mkString(" ")))
          .map(i => (i.toLong, i + K - 1L))
        if (marks.isEmpty) None
        else {
          val spans = marks.foldLeft(Vector.empty[(Long, Long)]) {
            case (acc, (s, e)) =>
              if (acc.nonEmpty && s <= acc.last._2 + 1)
                acc.init :+ (acc.last._1, math.max(acc.last._2, e))
              else acc :+ (s, e)
          }
          val ct = spans.map(p => p._2 - p._1 + 1).sum
          Some((id, spans.length.toLong, ct, ws.length.toLong,
            ct * 1000000L / ws.length))
        }
      }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q379_contamination_spans")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == expected)
    assert(got.forall(r => !isEval(r._1)))
    // doc 0 is eval (0 % 97 == 0); its planted mutation 10000 is
    // train and contains it verbatim → guaranteed contaminated
    assert(got.exists(_._1 == 10000L))
  }

  test("q380 fertility: per-language ratios match the independent " +
    "encoder applied to the same usage-weighted vocab") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val lw = rows.flatMap { case (l, t) =>
      t.split(" ").filter(_.matches("^[a-z]{2,20}$")).map(w => (l, w))
    }.groupBy(identity).map { case ((l, w), xs) =>
      (l, w, xs.length.toLong) }.toSeq
    def encode(w: String): Long = {
      var syms = w.map(_.toString).toVector
      TextQueries.bpeMerges.foreach { case (a, b) =>
        syms = greedyMerge(syms, a, b)._1
      }
      syms.length.toLong
    }
    val toks = lw.map(_._2).distinct.map(w => w -> encode(w)).toMap
    val expected = lw.groupBy(_._1).map { case (l, xs) =>
      val words = xs.map(_._3).sum
      val tokens = xs.map(x => x._3 * toks(x._2)).sum
      val chars = xs.map(x => x._3 * x._2.length).sum
      (l, words, tokens, chars, tokens * 1000000L / words,
        chars * 1000000L / tokens)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q380_tokenizer_fertility")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq
    assert(got == expected)
    // fertility is a real signal: encoding shrinks every language's
    // token count below its character count
    got.foreach(r => assert(r._3 < r._4))
  }

  test("q377 spans: interval fusion is a true union — overlapping " +
    "and touching marks count each token once, gaps split spans") {
    // the PRODUCTION fusion (DedupQueries.fuseSpans — the exact code
    // the span family runs) on a crafted mark set
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc 1: marks [0,7],[3,10],[11,18] -> ONE span [0,18] (19 toks)
    // doc 2: marks [0,7],[20,27]        -> TWO spans (16 toks)
    val marks = Seq((1L, 0L, 7L), (1L, 3L, 10L), (1L, 11L, 18L),
      (2L, 0L, 7L), (2L, 20L, 27L)).toDF("doc_id", "st", "en")
    val spans = DedupQueries.fuseSpans(marks)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("e0") - col("s0") + 1)
        .as("toks"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(spans(1L) == ((1L, 19L)))
    assert(spans(2L) == ((2L, 16L)))
  }
}
