package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** ONLINE corpus mixing of a document stream — the streaming half of the
  * corpus-ops family (the batch members are `ext.TextAnalysis.corpusMix`
  * and its oracled arrival twin `corpusMixIncr`, reference scope
  * SURVEY.md §2 extensions): documents arrive as a streaming DataFrame
  * of (doc_id, source), each micro-batch extends the accumulated corpus,
  * the mix is RE-QUOTAED over everything on hand under the same
  * exact-integer law (`u12 = min over sources of n·(12/w)`,
  * `quota = (w·u12) div 12`, kept = smallest shuffle keys), and the
  * caller's sink receives the batch's VERDICT CHANGES — exactly the
  * dynamics `corpusMixIncr` pins batch-side: an arrival that shrinks the
  * binding source EVICTS previously-kept docs, growth ADMITS new ones.
  *
  * The store is two catalog tables (created on first use):
  *
  *   - `<prefix>_docs`   (doc_id, source) — the accumulated corpus; the
  *     only input the re-quota ever reads (document BODIES are not
  *     needed: the mix is keyed on doc_id and source alone).
  *   - `<prefix>_ledger` (doc_id, source, kept, batch_id) — one row per
  *     VERDICT CHANGE: a doc's first verdict on arrival, then a row per
  *     flip (kept→evicted or back). The doc's current state is its
  *     highest-batch_id row, so the ledger IS the replay log and the
  *     state store at once; `d_corpus_mix` cardinalities make changes
  *     per batch quota-bounded, and a long-lived deployment compacts
  *     the ledger to current-state + tail the same way the dedup
  *     stores compact ([[StreamDedup.compactStore]]).
  *
  * Exactly-once contract (the [[StreamDedup]] posture): the docs append
  * is anti-joined on doc_id, and the ledger append is decisions-last
  * keyed by batch_id —
  *
  *   - crash BEFORE the docs append: plain re-run.
  *   - crash after docs, before ledger: the replay finds every batch doc
  *     already stored; the re-quota over the identical accumulated
  *     corpus is deterministic, so the recomputed delta (against the
  *     ledger state, which predates this batch) is the same delta, and
  *     nothing was emitted yet.
  *   - crash after ledger, before the sink completed: the replay finds
  *     ledger rows carrying this batch_id and re-emits exactly them,
  *     recomputing nothing — the sink must be idempotent per batchId
  *     (the standard foreachBatch recovery contract).
  *
  * Emitted rows: (doc_id, source, kept, batch_id). Folding emissions by
  * latest batch_id reproduces the full kept set after every batch —
  * spec-asserted equal to `corpusMixIncr`'s per-wave kept columns, which
  * ties the online operator to the DuckDB-oracled law. */
object StreamMix {

  private def docsT(prefix: String) = s"${prefix}_docs"
  private def ledgerT(prefix: String) = s"${prefix}_ledger"

  /** Idempotent store DDL. Both tables are probe-key-narrow and tiny
    * relative to the corpus (no text payloads); the docs table is the
    * re-quota's only scan, so at 100 TB it is the one to keep
    * doc_id-ordered via compaction (its aggregate is a per-source count
    * — map-side partial, no layout sensitivity). */
  def ensureStore(spark: SparkSession, prefix: String): Unit = {
    spark.sql(s"CREATE TABLE IF NOT EXISTS ${docsT(prefix)} " +
      "(doc_id BIGINT, source STRING) USING parquet")
    spark.sql(s"CREATE TABLE IF NOT EXISTS ${ledgerT(prefix)} " +
      "(doc_id BIGINT, source STRING, kept BOOLEAN, batch_id BIGINT) " +
      "USING parquet")
  }

  /** One micro-batch: extend the corpus, re-quota, append the verdict
    * changes, return the batch's emission frame (recomputed fresh or
    * replayed — see the object doc's crash-window analysis). Exposed
    * package-private so specs can drive replay/crash windows without a
    * running stream. */
  private[graft] def processBatch(spark: SparkSession, prefix: String,
      batch: DataFrame, batchId: Long, seed: String = "mix42"): DataFrame = {
    ensureStore(spark, prefix)
    val ledger = spark.table(ledgerT(prefix))
    // Replay fast-path: this batch already decided — re-emit its rows.
    val replayed = ledger.filter(col("batch_id") === batchId)
      .localCheckpoint(true)
    if (replayed.count() > 0) return replayed
    // Corpus extension, anti-joined (idempotent under doc-level replay).
    val newDocs = batch.select(col("doc_id"), col("source"))
      .dropDuplicates("doc_id")
      .join(spark.table(docsT(prefix)).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    newDocs.write.insertInto(docsT(prefix))
    // Deterministic re-quota over the accumulated corpus.
    val mix = graft.ext.TextAnalysis
      .corpusMixOn(spark.table(docsT(prefix)), seed)
      .select(col("doc_id"), col("source"), col("kept"))
    // Current ledger state = each doc's highest-batch_id row. The window
    // runs over the CHANGE ledger, not the corpus — its row count is
    // Σ per-batch deltas, and compaction folds it back to one row per
    // doc when the tail grows.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("batch_id").desc)
    val state = ledger
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("kept").as("kept_prev"))
    // Delta = verdict differs from recorded state, or first appearance.
    val delta = mix
      .join(state, Seq("doc_id"), "left")
      .filter(col("kept_prev").isNull || col("kept") =!= col("kept_prev"))
      .select(col("doc_id"), col("source"), col("kept"),
        lit(batchId).as("batch_id"))
      .localCheckpoint(true)
    delta.write.insertInto(ledgerT(prefix))
    delta
  }

  /** Start the online mixer over a streaming (doc_id, source) DataFrame.
    * `sink` receives each batch's verdict-change frame and its batchId
    * and must be idempotent per batchId. */
  def streamingMix(docs: DataFrame, prefix: String = "stream_mix",
      seed: String = "mix42", checkpoint: Option[String] = None)
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    ensureStore(docs.sparkSession, prefix)
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(processBatch(batch.sparkSession, prefix, batch, batchId, seed),
          batchId)
      }
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }
}
