package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TrainingOrder

class TrainingOrderSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("epochShuffle: each epoch is a permutation, epochs decorrelate") {
    val docs = (0L until 97L).toDF("doc_id")
    val out = TrainingOrder.epochShuffle(docs, "doc_id",
      epochs = 3, shards = 4, spark).cache()
    try {
      // every epoch holds positions exactly 1..N (a permutation)
      (0 to 2).foreach { e =>
        val pos = out.filter(col("epoch") === e).select("pos")
          .as[Long].collect().sorted
        assert(pos.toSeq == (1L to 97L), s"epoch $e not a permutation")
      }
      // determinism: a second evaluation is bit-identical
      val again = TrainingOrder.epochShuffle(docs, "doc_id",
        epochs = 3, shards = 4, spark)
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
      // epochs are different orders (the hash mixes the epoch in):
      // doc order in epoch 0 != epoch 1
      val o0 = out.filter(col("epoch") === 0).orderBy("pos")
        .select("doc_id").as[Long].collect().toSeq
      val o1 = out.filter(col("epoch") === 1).orderBy("pos")
        .select("doc_id").as[Long].collect().toSeq
      assert(o0 != o1, "epoch orders identical — epoch not mixed in")
      // shards are round-robin over positions: balanced to ±1
      val sizes = out.filter(col("epoch") === 0).groupBy("shard")
        .count().select("count").as[Long].collect()
      assert(sizes.max - sizes.min <= 1)
    } finally { out.unpersist(); () }
  }

  test("tokenBudgetSelect: quality-prefix under the budget, never over") {
    val docs = (0 until 60).map { i =>
      // three quality tiers via doc length / stopword presence
      val words =
        if (i % 3 == 0) Seq.fill(30)("the quick fox").mkString(" ")
        else if (i % 3 == 1) Seq.fill(12)("zz qq").mkString(" ")
        else "short"
      (i.toLong, words)
    }.toDF("doc_id", "text")
    val sel = TrainingOrder.tokenBudgetSelect(docs, "doc_id", "text",
      num = 1L, den = 4L, spark).collect()
    val total = docs.select(
      sum(size(split(col("text"), " ")).cast("long"))).as[Long].head()
    val budget = total / 4
    assert(sel.nonEmpty)
    assert(sel.map(_.getAs[Long]("toks")).sum <= budget)
    assert(sel.map(_.getAs[Long]("run")).max <= budget)
    // selection is a prefix of the (quality desc, id) order: the
    // worst selected quality ≥ best unselected quality (ties broken
    // by id, so compare on the pair)
    val selIds = sel.map(_.getAs[Long]("doc_id")).toSet
    val all = docs.select(col("doc_id"),
        graft.operators.TextAnalysis.qualityExpr(col("text")).as("q"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("q")))
    val ordered = all.sortBy { case (id, q) => (-q, id) }.map(_._1)
    val k = sel.length
    assert(ordered.take(k).toSet == selIds,
      "selected set is not the top-k prefix of the quality order")
  }

  test("unimaxCap: budget conserved, epoch cap honored, prefix exact") {
    val docs = (0 until 80).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 10 match {
        case n if n < 6 => 0 // aa dominates
        case n if n < 9 => 1
        case _          => 2
      })
      (i.toLong, lang, Seq.fill(3 + i % 7)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val out = TrainingOrder.unimaxCap(docs, "doc_id", "lang", "text",
      budgetNum = 8L, budgetDen = 5L, maxEpochs = 2L, spark).collect()
    assert(out.length == 3)
    val total = out.map(_.getAs[Long]("lang_toks")).sum
    val budget = total * 8 / 5
    // conservation: never over budget; cap: never over 2 epochs/lang
    assert(out.map(_.getAs[Long]("alloc")).sum <= budget)
    out.foreach { r =>
      assert(r.getAs[Long]("alloc") <=
        2L * r.getAs[Long]("lang_toks"))
      assert(r.getAs[Long]("full_epochs") ==
        r.getAs[Long]("alloc") / r.getAs[Long]("lang_toks"))
      assert(r.getAs[Long]("partial_toks") ==
        r.getAs[Long]("alloc") % r.getAs[Long]("lang_toks"))
    }
    // the waterfill's point: some capped language exists alongside a
    // budget-bound one on this skewed fixture
    assert(out.exists(_.getAs[Long]("full_epochs") == 2L))
    assert(out.exists(_.getAs[Long]("full_epochs") < 2L))
    // partial prefix recomputed brute-force per language
    val toks = docs.collect().map { r =>
      val id = r.getAs[Long]("doc_id")
      (r.getAs[String]("lang"), id,
        r.getAs[String]("text").split(" ").length.toLong,
        id * 2654435761L % 1000000007L)
    }
    out.foreach { r =>
      val lang = r.getAs[String]("lang")
      val partial = r.getAs[Long]("partial_toks")
      val inLang = toks.filter(_._1 == lang).sortBy(t => (t._4, t._2))
      val runs = inLang.scanLeft(0L)(_ + _._3).drop(1)
      assert(r.getAs[Long]("n_partial_docs") ==
        runs.count(_ <= partial).toLong, s"partial prefix wrong for $lang")
    }
    // a budget ≥ E×corpus caps EVERY language at exactly E epochs
    val capped = TrainingOrder.unimaxCap(docs, "doc_id", "lang", "text",
      budgetNum = 3L, budgetDen = 1L, maxEpochs = 2L, spark).collect()
    capped.foreach { r =>
      assert(r.getAs[Long]("full_epochs") == 2L &&
        r.getAs[Long]("partial_toks") == 0L)
    }
  }

  test("balancedShards: ±1 doc balance, token spread bounded by one length class") {
    val docs = (0 until 100).map(i =>
      (i.toLong, Seq.fill(1 + (i * 7) % 40)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TrainingOrder.balancedShards(docs, "doc_id", "text",
      shards = 8, spark).collect()
    assert(out.length == 8)
    val nd = out.map(_.getAs[Long]("n_docs"))
    assert(nd.sum == 100 && nd.max - nd.min <= 1)
    // the round-robin deal over the sorted order bounds shard token
    // spread: ⌈n/shards⌉ deal rounds, each contributing ≤ (round max −
    // round min) spread; recompute that bound brute-force
    val lens = docs.collect()
      .map(r => (r.getAs[String]("text").split(" ").length.toLong,
        r.getAs[Long]("doc_id")))
      .sortBy { case (t, id) => (-t, id) }.map(_._1)
    // complete rounds spread ≤ max−min; the partial last round gives
    // some shards nothing, so it contributes up to its max
    val bound = lens.grouped(8)
      .map(g => if (g.length == 8) g.max - g.min else g.max).sum
    val tk = out.map(_.getAs[Long]("shard_toks"))
    assert(tk.max - tk.min <= bound,
      s"token spread ${tk.max - tk.min} exceeds deal bound $bound")
    assert(tk.sum == lens.sum)
  }
}
