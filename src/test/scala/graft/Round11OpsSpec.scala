package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-11 operators: the oracle gate proves cross-engine equality;
  * these pin the SEMANTICS the parity fixture is asserting — codepoint
  * (not UTF-16 unit) string lengths, empty-token split behavior, the
  * documented SpecialCasing guard — and the probe's decomposition
  * arithmetic (residues recompose into q337's whole-table checksum).
  */
class Round11OpsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sfDir

  private lazy val parity =
    SparkEntry.queries("q367_string_parity")(spark, sf)
      .collect().map(r => r.getAs[Long]("case_id") -> r).toMap

  test("q367 parity: codepoint semantics — astral chars count 1, " +
    "combining marks count separately, NBSP/ZWSP are not spaces") {
    // case 11 "math 𝕏 symbol": 13 codepoints (𝕏 is ONE despite being
    // a surrogate pair), 3 space-split words
    assert(parity(11L).getAs[Long]("n_chars") == 13L)
    assert(parity(11L).getAs[Long]("n_words") == 3L)
    // case 22 "combining e<U+0301> accent": e + combining acute = 2
    // codepoints -> "combining"(9) + 1 + 2 + 1 + "accent"(6) = 19
    assert(parity(22L).getAs[Long]("n_chars") == 19L)
    // case 20 NBSP-joined: U+00A0 neither splits nor trims
    assert(parity(20L).getAs[Long]("n_words") == 1L)
    assert(parity(20L).getAs[Long]("trim_len")
      == parity(20L).getAs[Long]("n_chars"))
    // case 21 ZWSP: not a split space either
    assert(parity(21L).getAs[Long]("n_words") == 2L)
  }

  test("q367 parity: empty-token split laws and the NULL row") {
    // split on ' ' keeps empty tokens in BOTH engines: "" -> 1,
    // "a  b" -> 3, "   " -> 4
    assert(parity(2L).getAs[Long]("n_words") == 1L)
    assert(parity(3L).getAs[Long]("n_words") == 3L)
    assert(parity(6L).getAs[Long]("n_words") == 4L)
    // NULL row: every column NULL (size() guards included — Spark's
    // legacy size(NULL) = -1 must never reach the hashed output)
    val n = parity(24L)
    Seq("n_chars", "n_words", "n_stop", "n_punct", "n_alpha",
      "up_len", "trim_len", "pos_b", "sub23", "lower_s", "spaced")
      .foreach(c => assert(n.isNullAt(n.fieldIndex(c)), c))
  }

  test("q367 parity: SpecialCasing guard — case-mapped outputs are " +
    "NULL exactly where the engines measurably diverge (Java ß->SS " +
    "and İ->i+dot 1:N vs DuckDB 1:1)") {
    val special = parity.values.filter(
      _.getAs[Boolean]("has_special_casing")).toSeq
    assert(special.map(_.getAs[Long]("case_id")).sorted == Seq(18L, 25L))
    special.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("up_len")))
      assert(r.isNullAt(r.fieldIndex("lower_s")))
    }
    // everything else has concrete, engine-agreed case-mapped values
    // (incl. full-width and RTL — measured parity, no guard needed)
    parity.values.filterNot(_.getAs[Boolean]("has_special_casing"))
      .filter(_.getAs[Long]("case_id") != 24L)
      .foreach { r =>
        assert(!r.isNullAt(r.fieldIndex("up_len")))
        assert(!r.isNullAt(r.fieldIndex("lower_s")))
      }
  }

  test("q368 probe: residues are in [0, 2^61-1), one row per audited " +
    "column, and documents.doc_id recomposes against a direct sum") {
    val m61 = BigInt("2305843009213693951")
    val rows = SparkEntry.queries("q368_parity_probe")(spark, sf)
      .collect()
    assert(rows.length == 18)
    assert(rows.map(_.getAs[String]("item")).distinct.length == 18)
    rows.foreach { r =>
      val res = BigInt(r.getAs[Long]("residue"))
      assert(res >= 0 && res < m61, r.getAs[String]("item"))
    }
    // independent recompute of one residue
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val direct = Tables.documents(spark, sf)
      .select(operators.Dedup.md5Hash60(
        coalesce(col("doc_id").cast("string"), lit("∅"))).as("h"))
      .agg(sum(col("h").cast(dec38))).collect()(0)
    val want = (BigInt(direct.getDecimal(0).toBigInteger) mod m61)
      .toLong
    val got = rows.find(_.getAs[String]("item") == "documents.doc_id")
      .get.getAs[Long]("residue")
    assert(got == want)
  }

  test("q371 BPE merges match an independent in-memory TEXTBOOK " +
    "one-pass greedy recompute over the same word-frequency table") {
    val got = SparkEntry.queries("q371_bpe_merges")(spark, sf)
      .collect().sortBy(_.getAs[Long]("merge_round"))
      .map(r => (r.getAs[String]("sym_a"), r.getAs[String]("sym_b"),
        r.getAs[Long]("pair_count")))
    // reference: collect the (bounded) vocab and run textbook greedy
    // BPE in plain Scala — non-overlapping pair counts (a run of k
    // equal symbols yields ⌊k/2⌋ pairs) and a single left-to-right
    // merge pass that fuses consecutive occurrences in ONE round
    var vocab = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]{2,20}$"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
      .toSeq
    def greedyPairs(sy: Array[String]): Seq[(String, String)] = {
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, String)]
      var runStart = 0
      for (i <- sy.indices) {
        if (i > 0 && sy(i) != sy(i - 1)) runStart = i
        if (i < sy.length - 1 &&
            (sy(i) != sy(i + 1) || (i - runStart) % 2 == 0))
          out += ((sy(i), sy(i + 1)))
      }
      out.toSeq
    }
    def mergeOnePass(sy: Array[String], a: String,
        b: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < sy.length) {
        if (i < sy.length - 1 && sy(i) == a && sy(i + 1) == b) {
          out += a + b; i += 2
        } else { out += sy(i); i += 1 }
      }
      out.toArray
    }
    val want = (1 to 5).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (sy, c) =>
        greedyPairs(sy).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      val ((a, b), n) = counts.toSeq
        .sortBy { case ((x, y), m) => (-m, x, y) }.head
      vocab = vocab.map { case (sy, c) => (mergeOnePass(sy, a, b), c) }
      (a, b, n)
    }
    assert(got.toSeq == want)
    // the textbook-greedy properties, pinned on synthetic shapes:
    // a run of 4 equal symbols pairs twice and merges in one pass
    assert(greedyPairs(Array("a", "a", "a", "a"))
      .count(_ == ("a", "a")) == 2)
    assert(mergeOnePass(Array("a", "a", "a", "a"), "a", "a").toSeq
      == Seq("aa", "aa"))
    // alternating occurrences fuse in ONE round (the r11 deviation
    // merged them on alternating rounds)
    assert(mergeOnePass(Array("a", "b", "a", "b"), "a", "b").toSeq
      == Seq("ab", "ab"))
    // a run of 3: one pair, greedy from the left
    assert(greedyPairs(Array("a", "a", "a"))
      .count(_ == ("a", "a")) == 1)
    assert(mergeOnePass(Array("a", "a", "a"), "a", "a").toSeq
      == Seq("aa", "a"))
  }

  test("q368 probe: a single-value perturbation moves exactly the " +
    "perturbed column's residue (the isolation property)") {
    val m61 = BigInt("2305843009213693951")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def residues(df: org.apache.spark.sql.DataFrame) =
      Seq("lang", "source").map { c =>
        val s = df.select(operators.Dedup.md5Hash60(
            coalesce(col(c).cast("string"), lit("∅"))).as("h"))
          .agg(sum(col("h").cast(dec38))).collect()(0)
        c -> (BigInt(s.getDecimal(0).toBigInteger) mod m61).toLong
      }.toMap
    val base = Tables.documents(spark, sf)
    val perturbed = base.withColumn("lang",
      when(col("doc_id") === 0L, lit("xx")).otherwise(col("lang")))
    val r0 = residues(base)
    val r1 = residues(perturbed)
    assert(r0("lang") != r1("lang"))
    assert(r0("source") == r1("source"))
  }
}
