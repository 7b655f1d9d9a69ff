package graft.engine

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Built-in pipeline procedures: the modern training-data operators
  * exposed through the reference's own procedure surface
  * (`EXEC name(args)` — grammar nowdbsql.y:369-375, dispatch
  * stmt.c:1791-1845), so a wire-protocol client can run dedup/ANN/
  * curation against scope tables without writing any Scala. Installed
  * on every Engine at construction, exactly like the reference's proc
  * manager preloading server-side modules (scope/procman.c).
  *
  * Procs receive the INVOKING session (the reference's re-entrancy
  * contract): table arguments resolve through `Engine.tableDf`, so
  * attached frames, scope tables, and period-pruned stamped edges all
  * work, and results come back as `Rows` — SELECT-shaped, pageable
  * through the same cursor machinery as any query.
  */
object PipelineProcs {

  private def str(a: Any): String = a match {
    case s: String => s
    case other => other.toString
  }
  private def lng(a: Any): Long = a match {
    case l: Long => l
    case i: Int => i.toLong
    case d: Double => d.toLong
    case s: String => s.toLong
    case other => throw new IllegalArgumentException(
      s"expected integer argument, got $other")
  }
  private def dbl(a: Any): Double = a match {
    case d: Double => d
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: String => s.toDouble
    case other => throw new IllegalArgumentException(
      s"expected numeric argument, got $other")
  }

  /** Arity gate: EXEC argument lists come straight off the wire, so a
    * missing argument must surface as a usable signature message, not
    * an IndexOutOfBounds/MatchError JVM trace echoed to the client. */
  private def need(args: Seq[Any], n: Int, sig: String): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"expected $n arguments: $sig (got ${args.length})")

  def install(e: Engine): Unit = {
    // exact dedup: (table, idCol, textCol) → (fp, keep_id, n_copies)
    e.registerProcedure("dedup_exact", (eng, args) => {
      need(args, 3, "dedup_exact(table, idCol, textCol)")
      val Seq(t, id, tx) = args.take(3).map(str)
      Rows(Dedup.exact(eng.tableDf(t), id, tx))
    })
    // near-dup pairs: (table, idCol, textCol, tau) — MinHash k=32,
    // 16 bands × 2, word 3-gram shingles, exact-Jaccard verified
    e.registerProcedure("dedup_near", (eng, args) => {
      need(args, 4, "dedup_near(table, idCol, textCol, tau)")
      val Seq(t, id, tx) = args.take(3).map(str)
      Rows(Dedup.minhashNearDupPairs(eng.tableDf(t), id, tx,
        shingleN = 3, k = 32, bands = 16, tau = dbl(args(3))))
    })
    // duplicated spans: (table, idCol, textCol, L)
    e.registerProcedure("dup_spans", (eng, args) => {
      need(args, 4, "dup_spans(table, idCol, textCol, spanWords)")
      val Seq(t, id, tx) = args.take(3).map(str)
      Rows(TextAnalysis.duplicatedSpans(eng.tableDf(t), id, tx,
        l = lng(args(3)).toInt))
    })
    // language ID: (table, idCol, textCol)
    e.registerProcedure("lang_id", (eng, args) => {
      need(args, 3, "lang_id(table, idCol, textCol)")
      val Seq(t, id, tx) = args.take(3).map(str)
      Rows(TextAnalysis.languageId(eng.tableDf(t), id, tx))
    })
    // quality scores: (table, idCol, textCol)
    e.registerProcedure("quality", (eng, args) => {
      need(args, 3, "quality(table, idCol, textCol)")
      val Seq(t, id, tx) = args.take(3).map(str)
      Rows(TextAnalysis.qualityScore(eng.tableDf(t), id, tx))
    })
    // brute-force ANN: (table, idCol, vecCol, queryId, k)
    e.registerProcedure("ann_topk", (eng, args) => {
      need(args, 5, "ann_topk(table, idCol, vecCol, queryId, k)")
      val Seq(t, id, vc) = args.take(3).map(str)
      val df = eng.tableDf(t)
      import org.apache.spark.sql.functions.col
      Rows(Similarity.bruteForceTopKJoin(df,
        df.filter(col(id) === lng(args(3))), id, vc, id, vc,
        k = lng(args(4)).toInt))
    })
    // near-dup clusters + min-id survivors:
    // (table, idCol, textCol, tau) → (doc_id, cluster_id)
    e.registerProcedure("dedup_clusters", (eng, args) => {
      need(args, 4, "dedup_clusters(table, idCol, textCol, tau)")
      val Seq(t, id, tx) = args.take(3).map(str)
      Rows(Dedup.nearDupClusters(Dedup.minhashNearDupPairs(
        eng.tableDf(t), id, tx,
        shingleN = 3, k = 32, bands = 16, tau = dbl(args(3)))))
    })
    // transitive decontamination: flag every member of any near-dup
    // cluster containing a seed row from `seedTable.seedIdCol`
    // (q257's semantics over scope tables)
    e.registerProcedure("decontaminate", (eng, args) => {
      need(args, 6, "decontaminate(table, idCol, textCol, tau, " +
        "seedTable, seedIdCol)")
      val Seq(t, id, tx) = args.take(3).map(str)
      import org.apache.spark.sql.functions.col
      val comp = Dedup.nearDupClusters(Dedup.minhashNearDupPairs(
        eng.tableDf(t), id, tx,
        shingleN = 3, k = 32, bands = 16, tau = dbl(args(3))))
      val seeds = eng.tableDf(str(args(4)))
        .select(col(str(args(5))).as("doc_id"))
      val cont = comp.join(seeds, Seq("doc_id"), "left_semi")
        .select(col("cluster_id")).distinct()
      Rows(comp.join(cont, Seq("cluster_id"), "left_semi")
        .select(col("doc_id"), col("cluster_id")))
    })
    // deterministic weighted sample (Efraimidis–Spirakis, q261's
    // quantized-key form with uniform weights): (table, idCol, k)
    e.registerProcedure("sample_topk", (eng, args) => {
      need(args, 3, "sample_topk(table, idCol, k)")
      import org.apache.spark.sql.functions._
      val id = str(args(1))
      Rows(eng.tableDf(str(args(0)))
        .withColumn("es_key",
          (col(id) * 2654435761L) % 1000000007L)
        .orderBy(col("es_key").asc, col(id).asc)
        .limit(lng(args(2)).toInt)
        .drop("es_key"))
    })
  }
}
