package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** ONLINE near-duplicate filtering of a document stream — the streaming
  * half of the dedup family (SURVEY.md §2 extensions; the batch members
  * are `ext.Dedup.dedupPipeline` / `dedupIncremental`): documents arrive
  * as a streaming DataFrame of (doc_id, source, text), each micro-batch
  * is deduplicated against the accumulated KEPT corpus and within
  * itself (`ext.Dedup.streamDedupStep` — the exact core the oracled
  * batch twin `d_dedup_streamed` folds through, so the streaming logic
  * is DuckDB-checked via the twin), kept docs extend the store, and a
  * per-doc verdict stream goes to the caller's sink.
  *
  * The store is three catalog tables (created on first use):
  *
  *   - `<prefix>_bands`     (doc_id, band_idx, band) — MinHash band
  *     relation of every KEPT doc; 4 fixed-size rows per doc, the only
  *     thing candidate generation ever joins. BUCKETED+SORTED on band
  *     (`ensureStore` DDL, [[StreamDedup.BandBuckets]]): the store side
  *     of the per-batch candidate join arrives pre-partitioned — only
  *     the micro-batch shuffles — and after `compactStore` the store is
  *     a constant-file-count pile whose scan cost no longer tracks the
  *     corpus (the round-14 scale residual, SCALING.md).
  *   - `<prefix>_toks`      (doc_id, toks) — distinct-token sets for
  *     exact-Jaccard verification; only candidate-matched doc_ids are
  *     ever read. BUCKETED+SORTED on doc_id, so the pushed candidate
  *     id set prunes whole buckets and row groups, and the verify
  *     join's store side arrives pre-partitioned. Old document BODIES
  *     are never stored or read.
  *   - `<prefix>_decisions` (doc_id, source, kept, matched_old,
  *     batch_id) — the decide-exactly-once ledger: docs already present
  *     are never re-processed, and a replayed batch re-emits their
  *     recorded verdicts unchanged. BUCKETED+SORTED on doc_id like
  *     toks (the decide-split probe is a doc_id IN-list).
  *
  * Exactly-once contract (same posture as the lake fold's anti-join
  * idiom, `sources/LakeFold.scala`): writes land store-first,
  * decisions-last, and every append is anti-joined on doc_id, so each
  * crash window converges under Spark's batch replay —
  *
  *   - crash BEFORE any append: plain re-run.
  *   - crash after bands/toks, before decisions: the replay re-decides
  *     the batch against a store that already holds the crashed
  *     attempt's kept docs; self-pairs are excluded by doc_id inside
  *     streamDedupStep, kept docs re-keep (Jaccard 1 matches are only
  *     sought among OTHER doc_ids), the anti-joined appends add no
  *     duplicate rows, and nothing was emitted yet. A doc whose
  *     in-batch representative now sits in the store may flip from a
  *     within-batch drop to a store drop with the same matched_old —
  *     same verdict, different route.
  *   - crash after decisions, before the sink ran or completed: the
  *     replay finds every doc decided, recomputes nothing, and re-emits
  *     the recorded verdicts — the sink must be idempotent per batchId,
  *     the contract checkpoint recovery already imposes on every
  *     foreachBatch writer.
  *
  * Verdict rows: (doc_id, source, kept, matched_old, batch_id) —
  * matched_old is the smallest verified kept-corpus match (store drop),
  * the component representative (within-batch drop), or NULL (kept).
  */
object StreamDedup {
  import StreamStoreOps.MaxPruneKeys

  private def bands(prefix: String) = s"${prefix}_bands"
  private def toks(prefix: String) = s"${prefix}_toks"
  private def decisions(prefix: String) = s"${prefix}_decisions"

  /** Bucket count for the bands store, bucketed on the full candidate
    * join key (band_idx, band). The COMPOSITE key is load-bearing:
    * Spark's co-partition check requires a side to be hash-partitioned
    * on ALL the join's keys (requireAllClusterKeysForCoPartition
    * defaults true — a single-column `band` bucket layout reads
    * "Bucketed: false (disabled by query planner)" and shuffles the
    * store anyway). Bucket PRUNING is single-column-only and therefore
    * forgone; what the batch's band IN-list still gets is page/
    * dictionary skipping inside each sorted bucket file (streamDedupStep
    * pushes the key set natively). 16 fits the test corpus; a
    * corpus-sized deployment scales it with store bytes (buckets ≈
    * store size / target file size) so each bucket file stays
    * right-sized while the FILE COUNT stays constant — the per-batch
    * serve scan then opens a bounded file set no matter how large the
    * kept corpus grows. 16 is only the CREATE-time floor:
    * [[compactStore]] re-sizes the count with [[bucketsFor]] as the
    * store grows (a bucket count is immutable outside a full rewrite,
    * and compaction is the one place the table is rewritten anyway). */
  private[graft] val BandBuckets = 16

  /** Bucket-count growth policy: enough buckets that one bucket ≈ one
    * target-sized file, rounded UP to a power of two so growth steps
    * are infrequent (each rebucketing is a full rewrite) and monotone,
    * clamped to [[BandBuckets]]..65536 (≈ 8 TB of band rows at 128 MB
    * files — past that, partition the store by band_idx and scale per
    * partition). Power-of-two also keeps successive layouts nested
    * under murmur3-pmod only in expectation, not exactly — which is
    * fine: correctness never depends on WHICH bucket a key lands in,
    * only on both join sides agreeing, and Spark re-checks the spec at
    * plan time.
    *
    * Do NOT shrink `targetFileBytes` to manufacture parallelism: bucket
    * count past what the cluster's cores can absorb is the small-files
    * anti-pattern, and it was measured here, not assumed — the x100
    * probe with 2048 ~30 KB buckets on 32 cores served at 7.3×,
    * WORSE than the fixed-16 layout's 2.0×, pure task-scheduling and
    * file-open overhead; the same store at 128 buckets (4× cores)
    * served at 1.43× (BENCH_SCALEUP.json, SCALING.md round 16). At
    * deployment scale the 128 MB default keeps per-task work real and
    * cores grow with the corpus, so the file-size bound is the right
    * driver; on a fixed-size cluster, cap the count near a small
    * multiple of total cores. */
  private[graft] def bucketsFor(storeBytes: Long,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val needed = math.max(1L, (storeBytes + targetFileBytes - 1) / targetFileBytes)
    val pow2 = java.lang.Long.highestOneBit(needed) match {
      case h if h == needed => needed
      case h => h * 2
    }
    math.min(65536L, math.max(BandBuckets.toLong, pow2)).toInt
  }

  /** Idempotent store DDL. All three store tables are BUCKETED+SORTED
    * on their probe key — bands on the composite candidate-join key
    * (see [[BandBuckets]]), toks and the decisions ledger on doc_id —
    * the layout that removes every corpus-proportional serve-path term:
    * after [[compactStore]] each store is a constant-file-count,
    * key-clustered table, so a micro-batch's candidate join reads a
    * bounded file set and shuffles only the batch side, doc_id-keyed
    * joins (the verify join, the append guards) find the store side
    * pre-partitioned, and the pushed doc_id IN-lists prune whole
    * BUCKETS (single-column bucket pruning) on top of the row-group
    * skips the within-bucket sort provides.
    * `d_dedup_pipeline_bucketed` proves bucketing cannot change any
    * answer; a store created before this DDL (flat toks/decisions from
    * rounds <= 16) keeps working — appends and compaction follow the
    * catalog's actual spec. */
  def ensureStore(spark: SparkSession, prefix: String): Unit = {
    // residue-proof across JVMs: an uncataloged table whose warehouse
    // directory survived a previous JVM must not adopt the stale files
    // (TableOps.ensureFreshLocation — the r17 sd_cpa_bands flake)
    Seq(bands(prefix), toks(prefix), decisions(prefix))
      .foreach(graft.sources.TableOps.ensureFreshLocation(spark, _))
    spark.sql(s"CREATE TABLE IF NOT EXISTS ${bands(prefix)} " +
      "(doc_id BIGINT, band_idx INT, band STRING) USING parquet " +
      "CLUSTERED BY (band_idx, band) SORTED BY (band_idx, band) " +
      s"INTO $BandBuckets BUCKETS")
    spark.sql(s"CREATE TABLE IF NOT EXISTS ${toks(prefix)} " +
      "(doc_id BIGINT, toks ARRAY<STRING>) USING parquet " +
      "CLUSTERED BY (doc_id) SORTED BY (doc_id) " +
      s"INTO $BandBuckets BUCKETS")
    spark.sql(s"CREATE TABLE IF NOT EXISTS ${decisions(prefix)} " +
      "(doc_id BIGINT, source STRING, kept BOOLEAN, matched_old BIGINT, " +
      "batch_id BIGINT) USING parquet " +
      "CLUSTERED BY (doc_id) SORTED BY (doc_id) " +
      s"INTO $BandBuckets BUCKETS")
  }

  // bucket-layout-aligned appends are shared streaming-store
  // infrastructure — see [[StreamStoreOps.appendToStore]]
  private def appendToStore(spark: SparkSession, table: String,
      df: DataFrame, sortCols: Seq[String]): Unit =
    StreamStoreOps.appendToStore(spark, table, df, sortCols)

  /** One micro-batch: decide fresh docs, append store then decisions
    * (each anti-joined — see the object doc's crash-window analysis),
    * and return the batch's full verdict frame (fresh decisions plus
    * replayed ones, already eagerly materialized — safe to hand to any
    * sink after the appends). Exposed package-private so specs can
    * drive replay/crash windows without a running stream. */
  private[graft] def processBatch(spark: SparkSession, prefix: String,
      batch: DataFrame, batchId: Long): DataFrame = {
    ensureStore(spark, prefix)
    // The whole batch evaluates inside the widened native-IN pushdown
    // window (StreamStoreOps doc): the decide-split and append-guard
    // IN-lists routinely exceed parquet's 10-key default, above which
    // the pushed predicate degrades to a min..max range that skips
    // nothing for scattered ids — every eager evaluation (checkpoints,
    // inserts) happens in here; streamDedupStep's own nested window is
    // harmless.
    StreamStoreOps.withPushdownInWindow(spark) {
    // The decide-exactly-once split reads the decisions ledger, which
    // grows with the TOTAL corpus while the batch stays micro-batch-sized
    // — prune it by the batch's own doc_ids (bounded collect, capped;
    // restricting either side of an equi-/anti-join on doc_id to the
    // batch's ids is a no-op). With a doc_id-ordered ledger layout
    // ([[compactStore]]) the pushed id range skips files outright.
    // Within-batch doc_id collapse (the StreamAnnIndex device): an
    // at-least-once source can redeliver a doc INSIDE one micro-batch;
    // without the collapse both rows flow through — duplicate verdict
    // emissions, duplicate ledger/toks rows multiplying every later
    // replay join, and (for same-id-different-text redelivery) a
    // minhash signature silently merged from both texts. One
    // deterministic winner (smallest (source, text)) pins replay.
    val bw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("source"), col("text"))
    // batch1 feeds the id collect, the replay join, and the fresh split;
    // decided feeds the replay join and the fresh anti-join — both
    // pinned ONCE (decidedSlice pins the under-cap ledger slice and
    // stays lazy over the cap) instead of re-running the window / the
    // ledger scan per consumer.
    val batch1 = batch
      .withColumn("rn", row_number().over(bw))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint(true)
    val batchIds = batch1.select(col("doc_id")).distinct()
      .limit(MaxPruneKeys + 1).collect().map(_.getLong(0)).toIndexedSeq
    val decided = StreamStoreOps.decidedSlice(
      spark, spark.table(decisions(prefix)), batchIds)
    // Both sides of the already-decided split are frozen BEFORE any
    // append (decidedSlice pinned the ledger slice; the frames below
    // checkpoint): the appends mutate the very tables these frames
    // read, and a lazy evaluation after the decisions append would
    // double-count the batch's own fresh docs as replayed.
    val replayed = decided
      .join(batch1.select(col("doc_id")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("kept"),
        col("matched_old"), col("batch_id"))
      .localCheckpoint(true)
    val fresh = batch1
      .join(decided.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint(true)
    // prune = true: the store tables are parquet-backed and grow without
    // bound while the batch stays micro-batch-sized — exactly the shape
    // probe-side store pruning exists for (see streamDedupStep's doc; a
    // doc_id-ordered toks layout turns the pushed id range into row-group
    // skips, and a batch with no store candidates never scans toks at all).
    val (verdicts, keptBands, keptToks) = graft.ext.Dedup.streamDedupStep(
      fresh, spark.table(bands(prefix)), spark.table(toks(prefix)),
      prune = true)
    // Anti-joined appends: each frame is materialized (localCheckpoint)
    // before its insert so no plan both reads and writes one table.
    // The guard's left side carries only BATCH doc_ids, so restricting
    // the store-side read to those ids is a no-op on the anti-join — and
    // turns a per-batch full-store scan+distinct (a term that grows with
    // the kept corpus) into the same capped IN-list prune the decisions
    // ledger uses above; over the cap the full scan is the cheaper plan
    // anyway. With the doc_id-ordered/bucketed store layouts the pushed
    // id set skips row groups (and whole buckets for toks/decisions).
    def storeIdSlice(table: String): DataFrame = StreamStoreOps.keySlice(
      spark.table(table).select(col("doc_id")), "doc_id", batchIds).distinct()
    // the bands guard anti-joins on (doc_id, band_idx), NOT doc_id
    // alone: a doc's 4 band rows land across multiple bucket FILES, and
    // a crash mid job-commit can persist some files without the rest —
    // a doc-granular guard would then see the doc "present" on replay
    // and permanently drop its missing bands (future near-duplicates
    // colliding only on those bands would be kept). toks/decisions are
    // one row per doc and keep the doc-granular guard.
    val bandSlice = StreamStoreOps.keySlice(
      spark.table(bands(prefix)).select(col("doc_id"), col("band_idx")),
      "doc_id", batchIds).distinct()
    val newBands = keptBands
      .join(bandSlice, Seq("doc_id", "band_idx"), "left_anti")
      .select(col("doc_id"), col("band_idx"), col("band"))
      .localCheckpoint(true)
    // each append follows its table's LIVE bucket layout (the counts
    // drift upward across compactStore rebucketings; the checkpoints
    // above already isolated the read sides, so the lazy repartition is
    // safe to evaluate inside the insert)
    appendToStore(spark, bands(prefix), newBands, Seq("band_idx", "band"))
    val newToks = keptToks
      .join(storeIdSlice(toks(prefix)), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("toks"))
      .localCheckpoint(true)
    appendToStore(spark, toks(prefix), newToks, Seq("doc_id"))
    val freshDecisions = verdicts
      .withColumn("batch_id", lit(batchId))
      .select(col("doc_id"), col("source"), col("kept"),
        col("matched_old"), col("batch_id"))
      .localCheckpoint(true)
    // No guard anti-join here — it is provably redundant: freshDecisions
    // derives from `fresh` = batch1 ∖ decided, with `decided` PINNED
    // before any append and only this batch writing the ledger, so a
    // second anti-join against the same pinned set removes nothing in
    // any crash window (partial-append residue lands in `decided` on
    // the NEXT replay, where those docs take the replayed path).
    appendToStore(spark, decisions(prefix), freshDecisions, Seq("doc_id"))
    freshDecisions.union(replayed)
    }
  }

  /** ORDERED small-file compaction of the three store tables — the
    * maintenance pass the serve path's probe pruning assumes. Every
    * micro-batch appends a few small files to each table; after N
    * batches the stores are N-file piles with interleaved key ranges, so
    * the pushed id-range predicates ([[processBatch]]'s ledger pruning,
    * `streamDedupStep(prune = true)`'s toks pruning) can skip nothing.
    * Compaction rewrites each table back to one right-sized file per
    * non-empty bucket, rescaling the bucket count with store bytes
    * ([[bucketsFor]]) — bands keyed on (band_idx, band), toks and the
    * decisions ledger on doc_id — via
    * `TableOps.compactBucketedTable`'s stage+swap protocol (crash
    * before the swap leaves the live table byte-identical; the swap's
    * drop+RENAME caveat is documented there). A legacy flat store gets
    * the ordered `compactTable` rewrite instead. Run it with the filter idle — between
    * micro-batches or with the stream stopped — same contract as every
    * in-place lake maintenance job here. Returns per-table
    * (filesBefore, filesAfter). */
  def compactStore(spark: SparkSession, prefix: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Map[String, (Int, Int)] = {
    ensureStore(spark, prefix)
    // Every bucketed store's compaction must preserve the bucket spec,
    // collapsing the per-append file pile back to one file per
    // non-empty bucket, and is ALSO where the bucket count scales with
    // store bytes ([[bucketsFor]]): the CREATE-time count fits an empty
    // store, and without the rescale a grown store's per-bucket files
    // blow past the target size (the fixed-16 layout was the remaining
    // 2x in the 100x pruned-serve datum). A store created before the
    // bucketed DDL keeps the ordered flat rewrite.
    def compactOne(table: String, orderBy: Seq[String]): (Int, Int) = {
      val bucketed = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .bucketSpec.isDefined
      if (bucketed) {
        val desired = bucketsFor(
          graft.sources.TableOps.tableDataBytes(spark, table), targetFileBytes)
        graft.sources.TableOps.compactBucketedTable(spark, table,
          newBuckets = Some(desired))
      } else graft.sources.TableOps.compactTable(spark, table,
        targetFileBytes, orderBy = orderBy)
    }
    Map(
      bands(prefix) -> compactOne(bands(prefix), Seq("band_idx", "band")),
      toks(prefix) -> compactOne(toks(prefix), Seq("doc_id")),
      decisions(prefix) -> compactOne(decisions(prefix), Seq("doc_id")))
  }

  /** Start the online dedup filter over a streaming (doc_id, source,
    * text) DataFrame. `sink` receives each batch's verdict frame and its
    * batchId and must be idempotent per batchId (standard foreachBatch
    * recovery contract — see the object doc). */
  def streamingDedup(docs: DataFrame, prefix: String = "stream_dedup",
      checkpoint: Option[String] = None)
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    ensureStore(docs.sparkSession, prefix)
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(processBatch(batch.sparkSession, prefix, batch, batchId), batchId)
      }
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }
}
