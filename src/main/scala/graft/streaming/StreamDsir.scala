package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.TextAnalysis

/** ONLINE targeted data selection — the deploy half of DSIR's
  * train-once/select-as-you-go contract (Xie et al., NeurIPS 2023;
  * batch laws: `TextAnalysis.dsirWeights`/`dsirResample`): the hashed
  * n-gram importance model is fitted ONCE offline ([[modelWrite]], a
  * 512-row log-ratio table — the exact frozen-model posture of
  * [[StreamAnnIndex]]), then raw-pool documents arrive as a streaming
  * (doc_id, source, text) DataFrame and the operator maintains the
  * RUNNING Gumbel-top-k selection: each micro-batch is scored
  * map-side against the frozen model (integer micro-nat keys — the
  * identical law `dsirResampleOn` applies, so the final selected set
  * provably equals the batch resample over the same corpus), admitted
  * or rejected against the current threshold, and previously-selected
  * docs whose key falls below the new kth key are EVICTED.
  *
  * Why this is O(batch + k) per micro-batch, never O(corpus): keys are
  * STATIC once scored (the model is frozen), so the selection
  * threshold — the kth-largest (gkey, doc_id) pair seen so far — is
  * MONOTONE non-decreasing, a doc below it can never re-enter, and the
  * new threshold is computable from (current selected ∪ batch) alone:
  * a ≤ k-row range-pruned read of the key-ordered scores store plus
  * the batch's own keys. No density probes (contrast [[StreamMix]],
  * whose thresholds move both ways), no corpus re-rank, no windows.
  *
  * Store tables (all `USING parquet`, appends sorted on their probe
  * key so row-group stats prune between compactions):
  *   - `<prefix>_model`  (f, lr_u) — the frozen 512-row log-ratio
  *     model; written once by [[modelWrite]], read per batch.
  *   - `<prefix>_scores` (doc_id, gkey, batch_id) — every pool doc
  *     ever scored, insert-once on doc_id, key-ordered for the
  *     bounded selected-set range read.
  *   - `<prefix>_thr`    (batch_id, t_key, t_doc, n_sel) — the
  *     threshold snapshot per batch ((Long.MinValue, Long.MaxValue)
  *     sentinel while fewer than k docs are pooled: everything
  *     selected).
  *   - `<prefix>_ledger` (doc_id, gkey, kept, batch_id) — the change
  *     EVENT LOG: every fresh doc's first verdict plus every eviction
  *     flip; the replay fast-path re-emits its batch slice.
  *
  * Crash-window order is thr → scores → ledger, the [[StreamMix]]
  * posture: a thr row without its ledger rows marks a recovering
  * batch, whose recomputed state must MATCH the stored snapshot
  * (foreign-checkpoint refusal) and whose emissions are re-derived;
  * scores residue is absorbed by the insert-once anti-join; the
  * emission frame is deterministic (frozen model + seeded keys), so
  * replays re-emit bit-identically. Duplicate doc_ids within a batch
  * collapse to one deterministic winner (smallest (source, text)) —
  * the siblings' replay device.
  *
  * Zero-gram docs (NULL or empty text — `TextAnalysis.dsirGrams`
  * filters empty grams, so the empty string's [""] split yields no
  * evidence either) score no key and by law never enter the pool — the
  * batch twins drop them identically. Since r18 the whole scoring law
  * (log-ratios AND the Gumbel term) runs on `IlogMicro`'s integer
  * fixed-point log: no libm in either engine, keys bit-identical by
  * construction. Target-domain arrivals (the sources the model's p side
  * was fitted on) are not candidates and are filtered out. */
object StreamDsir {
  import StreamStoreOps.MaxPruneKeys

  private[graft] def modelT(prefix: String) = s"${prefix}_model"
  private[graft] def scoresT(prefix: String) = s"${prefix}_scores"
  private[graft] def thrT(prefix: String) = s"${prefix}_thr"
  private[graft] def ledgerT(prefix: String) = s"${prefix}_ledger"

  /** No-threshold sentinel: selection is `gkey > t_key || (gkey ==
    * t_key && doc_id <= t_doc)`, so (MinValue, MaxValue) selects every
    * scored doc — the state while the pool holds fewer than k docs. */
  private val NoKey = Long.MinValue
  private val NoDoc = Long.MaxValue

  private def selPred(tKey: Long, tDoc: Long) =
    (col("gkey") > lit(tKey)) ||
      (col("gkey") === lit(tKey) && col("doc_id") <= lit(tDoc))

  def ensureStore(spark: SparkSession, prefix: String): Unit = {
    // residue-proof across JVMs (TableOps.ensureFreshLocation contract)
    Seq(scoresT(prefix), thrT(prefix), ledgerT(prefix))
      .foreach(graft.sources.TableOps.ensureFreshLocation(spark, _))
    spark.sql(s"CREATE TABLE IF NOT EXISTS ${scoresT(prefix)} " +
      "(doc_id BIGINT, gkey BIGINT, batch_id BIGINT) USING parquet")
    spark.sql(s"CREATE TABLE IF NOT EXISTS ${thrT(prefix)} " +
      "(batch_id BIGINT, t_key BIGINT, t_doc BIGINT, n_sel BIGINT) " +
      "USING parquet")
    spark.sql(s"CREATE TABLE IF NOT EXISTS ${ledgerT(prefix)} " +
      "(doc_id BIGINT, gkey BIGINT, kept BOOLEAN, batch_id BIGINT) " +
      "USING parquet")
  }

  /** Fit + persist the frozen log-ratio model over the reference
    * corpus (target sources vs raw pool — `TextAnalysis.dsirModel`).
    * Train-once: a REFIT under a running selection stream would
    * invalidate every stored key — stop the stream and start a new
    * prefix, the [[StreamAnnIndex]] rebuild contract. */
  def modelWrite(spark: SparkSession, prefix: String,
      documents: DataFrame,
      buckets: Int = TextAnalysis.DsirBuckets): Unit = {
    TextAnalysis.dsirModel(documents, buckets)
      .coalesce(1).sortWithinPartitions("f")
      .write.mode("overwrite").saveAsTable(modelT(prefix))
  }

  /** ORDERED small-file compaction + thr-history retention — the
    * shared threshold-store maintenance contract
    * ([[StreamStoreOps.compactThresholdStore]]: rank-based snapshot
    * retention, staged trim), with scores ordered on the (gkey,
    * doc_id) probe key the selected-set range read prunes on. */
  def compactStore(spark: SparkSession, prefix: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      retainThrBatches: Int = 8): Map[String, (Int, Int)] = {
    ensureStore(spark, prefix)
    StreamStoreOps.compactThresholdStore(spark,
      Seq(scoresT(prefix) -> Seq("gkey", "doc_id"),
        ledgerT(prefix) -> Seq("doc_id")),
      thrT(prefix), targetFileBytes, retainThrBatches)
  }

  /** One micro-batch: score the fresh pool docs against the frozen
    * model, advance the monotone top-k threshold, emit fresh verdicts
    * plus evictions. Package-private so specs drive replay/crash
    * windows without a running stream. Returns the batch's emission
    * frame (doc_id, gkey, kept, batch_id), eagerly materialized. */
  private[graft] def processBatch(spark: SparkSession, prefix: String,
      batch: DataFrame, batchId: Long, seed: String = "dsir42",
      k: Int = TextAnalysis.DsirK,
      targetSources: Seq[String] = TextAnalysis.DsirTargetSources,
      buckets: Int = TextAnalysis.DsirBuckets)
      : DataFrame = {
    ensureStore(spark, prefix)
    graft.functions.Md5Prefix60.register(spark)
    require(spark.catalog.tableExists(modelT(prefix)),
      s"streamingDsir($prefix): no frozen model at ${modelT(prefix)} — " +
        "fit it once with StreamDsir.modelWrite before streaming")
    val ledger = spark.table(ledgerT(prefix))
    val emptyEmission = ledger.filter(lit(false))
      .select(col("doc_id"), col("gkey"), col("kept"), col("batch_id"))

    // Deterministic within-batch collapse + pool filter (the model's
    // own target-domain sources are not candidates), then the frozen
    // scoring law — keys are exact integers, so replays re-derive them
    // bit-identically.
    val bw = Window.partitionBy(col("doc_id")).orderBy(col("source"), col("text"))
    val pool = batch.select(col("doc_id"), col("source"), col("text"))
      .withColumn("rn", row_number().over(bw))
      .filter(col("rn") === 1).drop("rn")
      .filter(!col("source").isin(targetSources: _*))
    val batchD = TextAnalysis.dsirScore(pool, spark.table(modelT(prefix)),
        seed, buckets)
      .localCheckpoint(true)
    if (batchD.isEmpty) return emptyEmission

    val batchIds = batchD.select(col("doc_id"))
      .limit(MaxPruneKeys + 1).collect().map(_.getLong(0)).toIndexedSeq
    val decidedSlice = StreamStoreOps.decidedSlice(spark, ledger, batchIds)

    // ---- replay fast-path with the foreign-checkpoint guard
    if (decidedSlice.filter(col("batch_id") === batchId).limit(1).count() > 0) {
      val undecided = batchD
        .join(decidedSlice.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .limit(1).count()
      require(undecided == 0L,
        s"streamingDsir($prefix): ledger already carries batch_id=$batchId " +
          "but this batch contains undecided doc_ids — the store prefix " +
          "is bound to a different checkpoint; use a new prefix or " +
          "restore the original checkpoint")
      return ledger.filter(col("batch_id") === batchId)
        .select(col("doc_id"), col("gkey"), col("kept"), col("batch_id"))
        .localCheckpoint(true)
    }

    // ---- threshold state (tiny reads, the StreamMix shape)
    val thrTable = spark.table(thrT(prefix))
    val ahead = thrTable.filter(col("batch_id") > batchId).limit(1).count()
    require(ahead == 0L,
      s"streamingDsir($prefix): thresholds table carries batch ids " +
        s"beyond $batchId — the store prefix is bound to a different " +
        "(newer) checkpoint; use a new prefix or restore the original")
    def thrAt(b: Long): Option[(Long, Long, Long)] =
      thrTable.filter(col("batch_id") === b)
        .select(col("t_key"), col("t_doc"), col("n_sel"))
        .collect().headOption
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val prevBatchId = thrTable.filter(col("batch_id") < batchId)
      .agg(max(col("batch_id"))).head() match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getLong(0))
      }
    val prevThr = prevBatchId.flatMap(thrAt)
    val curThr = thrAt(batchId)
    val recovering = curThr.isDefined
    if (prevThr.isEmpty) {
      val scoresNonEmpty = spark.table(scoresT(prefix)).limit(1).count() > 0
      require(!scoresNonEmpty || recovering,
        s"streamingDsir($prefix): scores table is non-empty but no " +
          "thresholds snapshot precedes this batch — inconsistent store")
    }

    // ---- fresh pool docs (never decided); crash-residue scores rows
    // of THIS batch are excluded from every old-side read below.
    val freshK = batchD
      .join(decidedSlice.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

    // ---- the standing selected set: at most k rows, read through the
    // key-range predicate the key-ordered store prunes on. Keys are
    // static, so docs at-or-below the previous threshold are out
    // FOREVER — this bounded read is the whole reason the batch never
    // rescans the corpus.
    val oldSel: Array[(Long, Long)] = prevThr match {
      case Some((pKey, pDoc, nSelPrev)) =>
        val sel = spark.table(scoresT(prefix))
          .filter(selPred(pKey, pDoc))
          .join(broadcast(freshK.select(col("doc_id"))),
            Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("gkey"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        require(sel.length == nSelPrev,
          s"streamingDsir($prefix): selected-set read returned " +
            s"${sel.length} rows, thresholds snapshot says $nSelPrev — " +
            "store and snapshot disagree (bug or foreign store)")
        sel
      case None =>
        // No predecessor snapshot means NOTHING may be decided yet —
        // guarded BEFORE any sentinel-threshold read: falling back to
        // select-all over a populated store would collect the corpus
        // to the driver and emit spurious evictions for every
        // unselected doc (the exact garbage path a thr history trimmed
        // past the predecessor would open).
        val residue = spark.table(scoresT(prefix))
          .join(broadcast(freshK.select(col("doc_id"))),
            Seq("doc_id"), "left_anti")
          .limit(1).count()
        require(residue == 0L,
          s"streamingDsir($prefix): no thresholds snapshot precedes " +
            s"batch_id=$batchId but the scores store carries decided " +
            "docs — the predecessor snapshot is missing (foreign store, " +
            "or thr history trimmed below retainThrBatches >= 2)")
        Array.empty
    }

    // ---- new threshold = kth of (old selected ∪ fresh) by
    // (gkey desc, doc_id asc): the union is ≤ k + |batch| rows and the
    // kth lands via TakeOrderedAndProject — driver state stays ≤ k.
    import spark.implicits._
    val oldSelDf = oldSel.toSeq.toDF("doc_id", "gkey")
    val union = freshK.unionByName(oldSelDf)
    val topk = union
      .orderBy(col("gkey").desc, col("doc_id"))
      .limit(k).collect().map(r => (r.getLong(0), r.getLong(1)))
    val (tKey, tDoc, nSel) =
      if (topk.length < k) (NoKey, NoDoc, topk.length.toLong)
      else (topk.last._2, topk.last._1, k.toLong)

    // Recovery-binding guard: a legit crash-after-thr replay re-derives
    // the SAME snapshot; any mismatch is a foreign checkpoint.
    if (recovering)
      require(curThr.contains((tKey, tDoc, nSel)),
        s"streamingDsir($prefix): thresholds already stored for " +
          s"batch_id=$batchId do not match this batch's recomputed " +
          "state — the store prefix is bound to a different checkpoint")

    // ---- emissions: every fresh doc's first verdict + evictions of
    // standing docs the risen threshold displaced (≤ k driver rows;
    // admissions of old docs are impossible — the threshold is
    // monotone).
    val freshVerdicts = freshK
      .select(col("doc_id"), col("gkey"), selPred(tKey, tDoc).as("kept"))
    val evicted = oldSel.filterNot { case (d, g) =>
      g > tKey || (g == tKey && d <= tDoc)
    }
    val delta = freshVerdicts
      .unionByName(evicted.toSeq.toDF("doc_id", "gkey")
        .select(col("doc_id"), col("gkey"), lit(false).as("kept")))
      .withColumn("batch_id", lit(batchId))
      .localCheckpoint(true)

    // ---- appends: thr → scores → ledger (the crash-window order the
    // object doc analyzes); insertInto is positional.
    if (!recovering)
      Seq((batchId, tKey, tDoc, nSel))
        .toDF("batch_id", "t_key", "t_doc", "n_sel")
        .coalesce(1).write.insertInto(thrT(prefix))
    val scoresToAppend =
      if (!recovering) freshK
      else freshK.join(spark.table(scoresT(prefix)).select(col("doc_id")),
        Seq("doc_id"), "left_anti").localCheckpoint(true)
    scoresToAppend.select(col("doc_id"), col("gkey"))
      .withColumn("batch_id", lit(batchId))
      .coalesce(1).sortWithinPartitions("gkey", "doc_id")
      .write.insertInto(scoresT(prefix))
    delta.coalesce(1).sortWithinPartitions("doc_id")
      .write.insertInto(ledgerT(prefix))
    delta
  }

  /** Current selection for every pooled doc — audits and the scale
    * probe's law gate (vs `dsirResampleOn` over the reconstructed
    * corpus); the serve path never needs it. One store scan + a 1-row
    * threshold read. */
  def currentSelected(spark: SparkSession, prefix: String): DataFrame = {
    ensureStore(spark, prefix)
    val thr = spark.table(thrT(prefix))
    val lastRow = thr.agg(max(col("batch_id"))).head()
    val scores = spark.table(scoresT(prefix))
    if (lastRow.isNullAt(0))
      return scores.select(col("doc_id"), col("gkey"),
        lit(false).as("selected")).filter(lit(false))
    val t = thr.filter(col("batch_id") === lastRow.getLong(0))
      .select(col("t_key"), col("t_doc")).head()
    scores.select(col("doc_id"), col("gkey"),
      selPred(t.getLong(0), t.getLong(1)).as("selected"))
  }

  /** Start the online selector over a streaming (doc_id, source, text)
    * DataFrame. The frozen model must exist ([[modelWrite]]). `sink`
    * receives each batch's change frame and its batchId and must be
    * idempotent per batchId (standard foreachBatch recovery
    * contract). */
  def streamingDsir(docs: DataFrame, prefix: String = "stream_dsir",
      seed: String = "dsir42", k: Int = TextAnalysis.DsirK,
      targetSources: Seq[String] = TextAnalysis.DsirTargetSources,
      checkpoint: Option[String] = None)
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    ensureStore(docs.sparkSession, prefix)
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(processBatch(batch.sparkSession, prefix, batch, batchId,
          seed, k, targetSources), batchId)
      }
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** The oracled batch twin (registry entry `d_dsir_streamed`, the
    * same device as `d_corpus_mix_streamed`): model frozen over the
    * FULL documents table, the raw pool replayed through the REAL
    * store-backed [[processBatch]] in the standard four waves
    * (`wave = (doc_id div 20) mod 4`), emissions folded to per-doc
    * (doc_id, gkey, wave, admitted, kept) — admitted is the arrival
    * verdict, kept the final one. The DuckDB twin re-derives every
    * wave's top-k from the scoring law, so the oracle pins the
    * monotone-threshold dataflow to the batch selection semantics;
    * final kept additionally equals `dsirResampleOn`'s selected set
    * over the same corpus (spec-asserted). Sequential-replay twin:
    * Bench excludes it — steady-state cost is ONE processBatch per
    * micro-batch. */
  def dsirStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val prefix = "dsr_replay"
    Seq(modelT(prefix), scoresT(prefix), thrT(prefix), ledgerT(prefix))
      .foreach(graft.sources.TableOps.dropWithLocation(spark, _))
    val docs = graft.Tables.documents(spark, sfDir)
    modelWrite(spark, prefix, docs)
    // integer div, never double/floor: above 2^53 a double quotient
    // loses ulps and could mis-wave a doc vs the twin's integer `//`
    val waved = docs
      .withColumn("wave", expr("CAST(pmod(doc_id DIV 20, 4) AS INT)"))
      .select(col("doc_id"), col("source"), col("text"), col("wave"))
      .localCheckpoint(true)
    (0 until 4).foreach { w =>
      processBatch(spark, prefix,
        waved.filter(col("wave") === lit(w))
          .select(col("doc_id"), col("source"), col("text")),
        w.toLong): Unit
    }
    val led = spark.table(ledgerT(prefix))
    val first = Window.partitionBy(col("doc_id")).orderBy(col("batch_id"))
    val verdicts = led
      .withColumn("rn", row_number().over(first))
      .withColumn("rnLast", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("batch_id").desc)))
      .groupBy(col("doc_id"))
      .agg(max(when(col("rn") === 1, col("kept"))).as("admitted"),
        max(when(col("rnLast") === 1, col("kept"))).as("kept"))
    spark.table(scoresT(prefix))
      .select(col("doc_id"), col("gkey"),
        expr("CAST(pmod(doc_id DIV 20, 4) AS INT)").as("wave"))
      .join(verdicts, Seq("doc_id"))
      .select(col("doc_id"), col("gkey"), col("wave"),
        col("admitted"), col("kept"))
  }
}
