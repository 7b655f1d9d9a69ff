package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-run ordering operators: the two corpus-wide orderings a
  * large-scale LM training pipeline computes after curation —
  * deterministic multi-epoch shuffles and quality-ordered token-budget
  * selection.
  *
  * Both are global total orders over 10⁸⁺ documents at 100 TB, which
  * is exactly the shape Spark's `Window.orderBy` (no partition) gets
  * wrong — an `Exchange SinglePartition` funnel. Both operators
  * therefore ride [[Rank.distributedRank]] /
  * [[Rank.distributedPrefixSum]]: range-repartition on the order key,
  * per-partition local work, a partitions-sized carry table. One
  * extra exchange, full cluster parallelism, no driver-era
  * bottleneck.
  *
  * Determinism is load-bearing (a re-run must produce the identical
  * shuffle so training is reproducible and resumable): the shuffle
  * key is the multiplicative hash
  * `(id · ((2654435761 + 700000001·epoch) mod 1e9+7)) mod 1e9+7` —
  * pure 64-bit integer arithmetic, bit-identical in any engine (the
  * DuckDB oracle recomputes it verbatim), no RNG state anywhere.
  * Two traps the spec pins down (both the same defect class the
  * round-7 MinHash family repair fixed): the epoch must vary the
  * MULTIPLIER, not an additive offset (`+ c·epoch` shifts every key
  * by one constant, preserving the permutation except at modulus
  * wraps), and the multiplier stride must be LARGE relative to the
  * modulus (a small stride perturbs keys by ≪ the typical gap
  * between sorted hash values, again preserving the order — observed
  * verbatim with stride 40503 over a 97-doc fixture).
  */
object TrainingOrder {

  private val M = 1000000007L

  /** Deterministic per-epoch permutation of `idCol`: for each epoch
    * `0 until epochs`, every document gets a 1-based position `pos`
    * in that epoch's shuffle order and a round-robin `shard` in
    * `0 until shards`. Epochs decorrelate because the hash mixes the
    * epoch number into the multiplier stream; position assignment is
    * one distributedRank over (epoch, hash, id).
    */
  def epochShuffle(docs: DataFrame, idCol: String, epochs: Int,
                   shards: Int, spark: SparkSession): DataFrame = {
    require(epochs > 0 && shards > 0, "epochs and shards must be positive")
    val id = col(idCol)
    val exploded = docs.select(id)
      .select(id, explode(array((0 until epochs).map(e =>
        lit(e.toLong)): _*)).as("epoch"))
      .withColumn("h",
        (id * ((lit(2654435761L) + lit(700000001L) * col("epoch"))
          % lit(M))) % lit(M))
    val ranked = Rank.distributedRank(exploded,
      Seq(col("epoch"), col("h"), id), spark, withTotal = true)
    // rk is global over all epochs; each epoch holds exactly
    // n_total/epochs rows, so the in-epoch position is an offset
    // subtraction — no second ranking pass
    // n_total = epochs · |docs| exactly, so the quotient is integral
    ranked.select(col("epoch"), id,
        (col("rk") - col("epoch") * (col("n_total") / epochs))
          .cast("long").as("pos"))
      .withColumn("shard", (col("pos") - 1) % shards)
  }

  /** Quality-ordered token-budget selection: take documents in
    * (quality desc, id) order while the inclusive running token sum
    * stays within `num/den` of the corpus total — "fill a 25% token
    * budget with the best documents first". Output: the selected
    * documents with their quality, token count, and running total.
    *
    * The running sum is [[Rank.distributedPrefixSum]] (two-pass
    * carry), the budget a broadcast 1-row scalar: two exchanges
    * total, both keyed — nothing single-partition, nothing collected.
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, textCol: String,
                        num: Long, den: Long,
                        spark: SparkSession): DataFrame = {
    require(num > 0 && den > 0, "budget fraction must be positive")
    val scored = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.qualityExpr(col(textCol)).as("quality"),
      TextAnalysis.wsTokens(col(textCol)).as("toks"))
    val order = Seq(col("quality").desc, col("doc_id"))
    // withTotal: the budget comes from the prefix-sum's own partition
    // totals — a separate agg over `scored` would re-scan the corpus
    // and re-pay the regex-heavy quality projection (measured 2× at
    // the 10× decade)
    val run = Rank.distributedPrefixSum(scored, order, col("toks"),
      spark, withTotal = true)
    run.filter(col("run") <= (col("total") * num / den).cast("long"))
      .select(col("doc_id"), col("quality"), col("toks"),
        col("run").cast("long").as("run"))
  }

  /** Size-balanced training shards: rank documents longest-first
    * (token count desc, id tie-break), deal round-robin across
    * `shards` — the order-free cousin of LPT (longest-processing-time
    * first) scheduling. Dealing by sorted rank guarantees every shard
    * gets one document from each length class of `shards` consecutive
    * ranks, so shard token totals differ by at most one document per
    * class — the property that keeps data-parallel training steps
    * from straggling on one fat shard. Unlike true LPT (assign to
    * least-loaded, inherently sequential), the rank deal is one
    * [[Rank.distributedRank]] plus a row-local modulus — fully
    * parallel, deterministic, engine-reproducible. Returns per-shard
    * accounting (population, token total, min/max doc length).
    */
  def balancedShards(docs: DataFrame, idCol: String, textCol: String,
                     shards: Int, spark: SparkSession): DataFrame = {
    require(shards > 0, "shards must be positive")
    val scored = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.wsTokens(col(textCol)).cast("long").as("toks"))
    Rank.distributedRank(scored,
        Seq(col("toks").desc, col("doc_id")), spark)
      .withColumn("shard", (col("rk") - 1) % shards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("shard_toks"),
        min(col("toks")).as("min_toks"), max(col("toks")).as("max_toks"))
  }

  /** UniMax language-capped budget allocation (Chung et al. 2023):
    * distribute a corpus-level token budget across languages by the
    * smallest-first waterfill — each language's quota is an equal
    * share of what remains, capped at `maxEpochs` passes over that
    * language; small languages that can't absorb their share release
    * it to the larger ones. The published fix for both failure modes
    * of temperature sampling (low-resource languages over-epoched
    * into memorization, high-resource ones starved).
    *
    * Output, one row per language: the doc/token inventory, the
    * allocated budget, how many FULL epochs that buys, the leftover
    * partial-epoch token count, and how many documents the partial
    * epoch admits (deterministic Knuth-hash order, inclusive running
    * sum ≤ partial — the same prefix rule as [[tokenBudgetSelect]]).
    *
    * Scale shape: the language table is bounded by the number of
    * languages (≈200 for any real multilingual corpus), so the
    * sequential waterfill is a driver-side O(L log L) loop — the same
    * bounded-collect class as the perceptron's dims-sized model. The
    * per-document partial prefix is ONE [[Rank.distributedPrefixSum]]
    * ordered language-major: the in-language running sum is the
    * global running sum minus the token mass of lexicographically
    * earlier languages (a broadcast L-row table), so a dominant
    * language (English ≈ half of any web corpus) still spreads across
    * range partitions instead of funneling into one per-language
    * window task. All budget arithmetic is 64-bit integer — the
    * allocation is bit-identical in any engine.
    */
  def unimaxCap(docs: DataFrame, idCol: String, langCol: String,
                textCol: String, budgetNum: Long, budgetDen: Long,
                maxEpochs: Long, spark: SparkSession): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && maxEpochs > 0,
      "budget fraction and epoch cap must be positive")
    val toks = docs.select(col(idCol).as("doc_id"),
        col(langCol).as("lang"),
        TextAnalysis.wsTokens(col(textCol)).cast("long").as("toks"))
      .withColumn("h", (col("doc_id") * lit(2654435761L)) % lit(M))
    val langRows = toks.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("lang_toks"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val budget = langRows.map(_._3).sum * budgetNum / budgetDen
    var brem = budget
    var lrem = langRows.length.toLong
    val alloc = langRows.sortBy { case (l, _, t) => (t, l) }.map {
      case (l, nd, lt) =>
        val a = math.min(maxEpochs * lt, brem / lrem)
        brem -= a
        lrem -= 1
        (l, nd, lt, a, a / lt, a % lt)
    }
    import spark.implicits._
    val allocDf = alloc.toSeq.toDF("lang", "n_docs", "lang_toks",
      "alloc", "full_epochs", "partial_toks")
    // token mass of lexicographically earlier languages — the carry
    // that turns the single global prefix sum into per-language runs
    val lexBase = alloc.sortBy(_._1)
      .scanLeft(("", 0L)) { case ((_, acc), (l, _, lt, _, _, _)) =>
        (l, acc + lt)
      }
    val baseDf = lexBase.sliding(2).collect {
      case Array((_, acc), (l, _)) => (l, acc)
    }.toSeq.toDF("lang", "base")
    val run = Rank.distributedPrefixSum(toks,
      Seq(col("lang"), col("h"), col("doc_id")), col("toks"), spark)
    run.join(broadcast(baseDf), "lang")
      .join(broadcast(allocDf), "lang")
      .groupBy(col("lang"), col("n_docs"), col("lang_toks"),
        col("alloc"), col("full_epochs"), col("partial_toks"))
      .agg(sum(when(col("run") - col("base") <= col("partial_toks"), 1L)
        .otherwise(0L)).cast("long").as("n_partial_docs"))
  }
}
