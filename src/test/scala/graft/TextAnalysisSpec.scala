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

  test("duplicatedSpans merges overlapping repeats and clips at unique tails") {
    // the 8-word phrase "a b c d e f g h" appears in docs 1, 2 (offset
    // by 2), and 3; docs 4 and 5 are verbatim copies of each other
    val corpus = Seq(
      (1L, "a b c d e f g h x y z"),
      (2L, "p q a b c d e f g h r"),
      (3L, "a b c d e f g h i"),
      (4L, "m n o p q r s t u v w0 w1"),
      (5L, "m n o p q r s t u v w0 w1"),
      (6L, "totally unrelated words nothing repeats here at all ok")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.duplicatedSpans(corpus, "doc_id", "text", l = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set(
      (1L, 0L, 7L, 8L, 1L), // shared phrase at pos 0; tail x y z unique
      (2L, 2L, 9L, 8L, 1L), // same phrase offset 2; p q / r clipped
      (3L, 0L, 7L, 8L, 1L), // pos-1 gram "b..i" unique → span clips
      (4L, 0L, 11L, 12L, 5L), // verbatim copies: one merged full span
      (5L, 0L, 11L, 12L, 5L)))
  }

  test("batchPerceptron recovers a planted rule and converges to 0") {
    import graft.operators.Classifier
    val corpus = (0 until 60).map { i =>
      val base = s"alpha beta gamma w$i common words here"
      (i.toLong, if (i % 2 == 0) s"$base zzmark zzmark zzmark zzmark"
                 else base)
    }.toDF("doc_id", "text")
    val out = Classifier.batchPerceptron(corpus, "doc_id", "text",
        when(col("doc_id") % 2 === 0, 1L).otherwise(-1L),
        dims = 64, iters = 4)
      .collect()
    val curve = out.filter(_.getString(0) == "miscl")
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(curve(1L) == 60L) // zero weights: everything misclassified
    assert(curve(4L) == 0L, s"did not converge: $curve")
    // the heaviest positive weight sits on the planted marker's bucket
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("zzmark".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val markBucket = java.lang.Long.parseLong(md, 16) % 64
    val weights = out.filter(_.getString(0) == "w")
      .map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(weights.maxBy(_._2)._1 == markBucket,
      s"marker bucket $markBucket, weights ${weights.toSeq.sortBy(-_._2).take(3)}")
  }

  test("blocklistFilter counts occurrences word-exact per category") {
    val corpus = Seq(
      (1L, "slow slow lag means slowness but slower is not counted"),
      (2L, "spark and flink and spark again"),
      (3L, "clean text entirely")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistFilter(corpus, "doc_id", "text",
        Seq("perf" -> Seq("slow", "lag"), "tools" -> Seq("spark", "flink")),
        maxHits = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // word-exact: "slowness"/"slower" do NOT hit (no substring match)
    assert(got(1L) == (3L, 0L, 3L, false))
    assert(got(2L) == (0L, 3L, 3L, false))
    assert(got(3L) == (0L, 0L, 0L, true))
  }

  test("piiScrub counts and redacts emails, phones, IPv4 in order") {
    val corpus = Seq(
      (1L, "mail a.b-c@sub.example.org and d@e.io for 10.0.0.1 now"),
      (2L, "call +1-555-013-4567 or +44-201-555-0199 today"),
      (3L, "versions 1.2 and 3.4.5 are not 192.168.001.255 alone"),
      (4L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 2 && got(1L).getLong(3) == 1)
    assert(got(1L).getString(4) ==
      "mail <EMAIL> and <EMAIL> for <IP> now")
    assert(got(2L).getLong(2) == 2)
    assert(got(2L).getString(4) == "call <PHONE> or <PHONE> today")
    // dotted versions do NOT count as IPs (need 4 octets); a real
    // 4-octet dotted quad does, even zero-padded
    assert(got(3L).getLong(3) == 1)
    assert(got(3L).getString(4) ==
      "versions 1.2 and 3.4.5 are not <IP> alone")
    assert(got(4L).getLong(1) == 0 && got(4L).getLong(2) == 0 &&
      got(4L).getLong(3) == 0)
    assert(got(4L).getString(4) == "nothing sensitive here at all")
  }

  test("repetitionProfile: hand-counted dup/top fractions, flag at tau") {
    val corpus = Seq(
      // "a b c" ×4 overlapping-free repeats: 10 words → 8 trigrams:
      // [a b c, b c a, c a b] ×2 + [a b c, b c END...]: count exactly
      (1L, "a b c a b c a b c a"),
      (2L, "all these words differ pairwise so nothing repeats"),
      (3L, "xy zz") // < 3 words → zero grams, zero fractions
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionProfile(corpus, "doc_id", "text",
        n = 3, tau = 0.125)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: grams = abc,bca,cab,abc,bca,cab,abc,bca → total 8,
    // distinct 3 (abc×3, bca×3, cab×2), top 3
    assert(got(1L).getLong(1) == 8L && got(1L).getLong(2) == 3L)
    assert(got(1L).getLong(3) == 3L)
    assert(got(1L).getDouble(4) == 5.0 / 8.0) // dup_frac
    assert(got(1L).getDouble(5) == 3.0 / 8.0) // top_frac
    assert(got(1L).getBoolean(6)) // 0.625 > 0.125
    // doc 2: 8 words → 6 distinct trigrams, nothing repeats
    assert(got(2L).getLong(1) == 6L && got(2L).getLong(2) == 6L)
    assert(got(2L).getDouble(4) == 0.0 && !got(2L).getBoolean(6))
    // doc 3: no grams at all — zero counts, zero fractions, unflagged
    assert(got(3L).getLong(1) == 0L && got(3L).getDouble(4) == 0.0)
    assert(!got(3L).getBoolean(6))
  }

  test("repetitionProfile fuzz: 300 random docs == direct recount") {
    // differential check of the sorted-array run-length walk against
    // a plain Scala recount over the same token streams — small
    // vocabularies force heavy repetition, so run/max/distinct
    // transitions all get exercised (incl. all-same and all-distinct)
    val rnd = new scala.util.Random(424242)
    val docs = (0 until 300).map { i =>
      val vocab = 1 + rnd.nextInt(6) // 1..6 distinct words
      val len = rnd.nextInt(12)      // 0..11 words (incl. < n)
      (i.toLong, (0 until len).map(_ => s"w${rnd.nextInt(vocab)}")
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val got = TextAnalysis.repetitionProfile(df, "doc_id", "text", n = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    docs.foreach { case (id, text) =>
      val ws = text.split(" ", -1).toSeq
      val grams =
        if (text.isEmpty || ws.length < 2) Seq.empty
        else ws.sliding(2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      val exp = (grams.size.toLong, counts.size.toLong,
        if (counts.isEmpty) 0L else counts.values.max.toLong)
      assert(got(id) == exp, s"doc $id '$text'")
    }
  }

  test("frequentNgrams counts overlapping bigrams, freq-desc/gram-asc") {
    val out = TextAnalysis.frequentNgrams(docs, "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // "der hund", "der schnelle" etc. appear once; "the" bigrams:
    // doc 1 has "the cat","the dog","the garden","the house" — all 1;
    // no repeated bigram exists, so top-3 is pure gram-asc among freq=1
    assert(out.length == 3 && out.forall(_._2 == 1L))
    assert(out == out.sortBy(_._1))
    // a doc shorter than n yields no grams (doc 3 = "x")
    val one = TextAnalysis.frequentNgrams(
      Seq((9L, "a b a b a")).toDF("doc_id", "text"), "text", n = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(one == Seq(("a b", 2L), ("b a", 2L)))
  }

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

  test("tfidf ranks rare terms above common ones") {
    val corpus = Seq(
      (1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "banana banana date")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopTerms(corpus, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "banana" appears in every doc → lowest idf; unique terms win
    assert(top(1L) == "apple" && top(2L) == "cherry" && top(3L) == "date")
  }

  test("decontamination counts shared distinct n-grams") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over me"), // contains the 5-gram
      (2L, "entirely different words here friend okay")).toDF("doc_id", "text")
    val r = TextAnalysis.decontaminationScores(corpus, bench,
      "doc_id", "text", n = 5).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(1L) == 1L && r(2L) == 0L)
  }

  test("stratified sampling applies per-stratum rates") {
    val df = (0L until 1000L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val kept = TextAnalysis.stratifiedSample(df, "id", "s",
      Map("a" -> 0), defaultPct = 100).collect()
    assert(kept.forall(_.getString(1) == "b") && kept.length == 500)
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

  test("bm25TopK: hand-computed scores, rarer terms weigh more") {
    val docs = Seq(
      (1L, "spark spark spark alpha beta gamma"),
      (2L, "spark alpha beta gamma delta epsilon zeta eta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "unrelated words entirely here now")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      queryTerms = Seq("spark"), k1 = 1.5, b = 0.75, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L)) // only matching docs, tf order
    // doc 1: tf=3, dl=6; N=4, df=2, avgdl=27/4
    val idf = math.log(1.0 + (4.0 - 2 + 0.5) / (2 + 0.5))
    def sat(tf: Long, dl: Long) =
      (tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * (dl * 4L / 27L.toDouble)))
    def score(tf: Long, dl: Long) =
      BigDecimal(idf * sat(tf, dl)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0)._2 == score(3, 6) && got(1)._2 == score(1, 8))
  }

  test("bm25Expanded: feedback terms recall docs the raw query misses") {
    val docs = Seq(
      (1L, "spark engine tuning with catalyst optimizer rules"),
      (2L, "spark catalyst optimizer internals and codegen stages"),
      (3L, "catalyst optimizer deep dive without the s-word"),
      (4L, "gardening tips for small balconies and pots")
    ).toDF("doc_id", "text")
    val raw = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq("spark"), topK = 10).collect().map(_.getLong(0)).toSet
    assert(raw == Set(1L, 2L)) // doc 3 invisible to the raw query
    val exp = TextAnalysis.bm25Expanded(docs, "doc_id", "text",
      Seq("spark"), fbDocs = 2, nExpand = 2, topK = 10)
      .collect().map(_.getLong(0)).toSet
    // docs 1,2 vote for catalyst/optimizer → doc 3 now retrieved
    assert(exp.contains(3L) && !exp.contains(4L))
  }

  test("windowChunks: spans tile with overlap, short docs get one chunk") {
    val docs = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")), // 40 tokens
      (2L, "a b c")                                   // 3 tokens
    ).toDF("doc_id", "text")
    val got = TextAnalysis.windowChunks(docs, "doc_id", "text",
        window = 32, stride = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).sortBy(x => (x._1, x._2))
    // 40 tokens: chunks at 1..32 and 17..40 (truncated)
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, 1L, 32L, "w1", "w32"),
      (1L, 1L, 17L, 24L, "w17", "w40")))
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 1L, 3L, "a", "c")))
  }

  test("winnowedFingerprints: exact window minima + the MOSS guarantee") {
    val M = 1000000007L
    def poly(s: String): Long = s.foldLeft(0L)((h, c) => (h * 31 + c) % M)
    val txt = "the cat and the dog sat in the garden of the house to rest"
    // independent reimplementation: min of every 4-hash window
    val hs = (0 to txt.length - 8).map(i => poly(txt.substring(i, i + 8)))
    val exp = (0 to hs.length - 4).map(j => hs.slice(j, j + 4).min).toSet
    val got = TextAnalysis.winnowedFingerprints(docs, "doc_id", "text")
      .filter($"doc_id" === 1L).collect().map(_.getLong(1)).toSet
    assert(got == exp)
    // guarantee: two docs sharing a substring of length >= win+gram-1
    // (= 11 chars) must share at least one selected fingerprint
    val pair = Seq(
      (10L, "aaaa SHARED-CHUNK zzzz junk tail one"),
      (11L, "bbqq pref SHARED-CHUNK other suffix!")
    ).toDF("doc_id", "text")
    val sets = TextAnalysis.winnowedFingerprints(pair, "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert((sets(10L) intersect sets(11L)).nonEmpty)
    // sub-gram docs emit nothing rather than a partial hash
    val tiny = Seq((12L, "short")).toDF("doc_id", "text")
    assert(TextAnalysis.winnowedFingerprints(tiny, "doc_id", "text")
      .count() == 0L)
  }
}
