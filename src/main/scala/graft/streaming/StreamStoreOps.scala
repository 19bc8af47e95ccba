package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Infrastructure shared by the streaming store operators
  * ([[StreamDedup]], [[StreamMix]], [[StreamMixTokens]]) — one source
  * of truth for the keyspace/sentinel constants, the threshold-key
  * order predicates, the capped ledger-slice prune, the native-IN
  * pushdown window, and the mix-store compaction body, so a fix to any
  * of them cannot silently diverge between the operators. */
private[graft] object StreamStoreOps {

  /** skey = first 60 bits of md5 (functions/Md5Prefix60), so the
    * keyspace is exactly [0, 2^60) and uniform — the density estimate
    * every boundary probe relies on. */
  val KeySpace: Long = 1L << 60

  /** Sentinel threshold ordering BEFORE every real key (quota/rem 0
    * keeps nothing; real skeys are non-negative). */
  val NoKeyS = -1L
  val NoKeyD = -1L

  /** Cap on any probe-side key collect: above it, the unpruned scan is
    * the cheaper plan anyway. */
  val MaxPruneKeys = 100000

  /** key ≤ (tS, tD) lexicographically — the kept/in-partial predicate. */
  def keyLE(skey: Column, docId: Column, tS: Long, tD: Long): Column =
    (skey < lit(tS)) || (skey === lit(tS) && docId <= lit(tD))
  def keyGT(skey: Column, docId: Column, tS: Long, tD: Long): Column =
    (skey > lit(tS)) || (skey === lit(tS) && docId > lit(tD))

  /** Run `body` with the parquet native-IN pushdown window widened to
    * 1000 keys: parquet receives an IN-list as a real In predicate only
    * up to `spark.sql.parquet.pushdown.inFilterThreshold` values
    * (default 10); bigger lists collapse to a min..max range, which
    * skips nothing for uniform hash keys and only coarsely for doc
    * ids. Raised, the key SET reaches row-group dictionaries and page
    * indexes. CONCURRENCY CAVEAT: the conf is SESSION-global — the
    * caller is assumed to own the SparkSession for the duration (true
    * of every foreachBatch serve path: one batch at a time). Two
    * concurrent streams sharing a session would see each other's
    * threshold; give each its own `SparkSession.newSession()` instead. */
  def withPushdownInWindow[T](spark: SparkSession)(body: => T): T = {
    val inKey = "spark.sql.parquet.pushdown.inFilterThreshold"
    val saved = spark.conf.get(inKey)
    spark.conf.set(inKey, 1000)
    try body finally spark.conf.set(inKey, saved)
  }

  /** Capped key-slice prune — THE store-read shape of every streaming
    * operator here (decide splits, append guards, ack joins): the store
    * grows with the corpus while the batch stays micro-batch-sized, so
    * restricting the store side of a key-equi/anti-join to the batch's
    * own keys is a no-op on the join and turns the read into a pushed
    * IN-list (bucket/row-group pruned under [[withPushdownInWindow]]).
    * Empty batch → empty slice; over [[MaxPruneKeys]] → the unpruned
    * frame (the full scan is the cheaper plan anyway). One definition
    * so a cap/semantics fix cannot silently diverge between operators. */
  def keySlice(df: DataFrame, key: String, ids: IndexedSeq[Long]): DataFrame =
    if (ids.isEmpty) df.filter(lit(false))
    else if (ids.length > MaxPruneKeys) df
    else df.filter(col(key).isin(ids: _*))

  /** The decided-set slice of a change ledger: [[keySlice]] on doc_id,
    * pushed natively via [[withPushdownInWindow]] and pinned; over the
    * cap the unpruned scan stays LAZY — a localCheckpoint would pin the
    * entire corpus-sized ledger to executor storage. */
  def decidedSlice(spark: SparkSession, ledger: DataFrame,
      batchIds: IndexedSeq[Long]): DataFrame =
    withPushdownInWindow(spark) {
      if (batchIds.length > MaxPruneKeys) ledger
      else keySlice(ledger, "doc_id", batchIds).localCheckpoint(true)
    }

  /** Bucket-layout-aligned append shared by every store-backed streaming
    * operator ([[StreamDedup]], [[StreamAnnIndex]]): repartition on the
    * table's LIVE bucket columns/count (it drifts upward across
    * compaction rebucketings) so each task carries exactly one bucket
    * id — an append adds at most one file per NON-EMPTY bucket instead
    * of tasks × buckets; a flat legacy table keeps the batch-sized
    * sorted single-file append. The bucketed writer enforces the
    * catalog sort spec per bucket file, so both layouts stay
    * stats-tight on the probe key. Deliberate trade-off vs the flat
    * layout's one file per append: a micro-batch spread across B
    * buckets writes up to min(|batch|, B) small files per table, so
    * the inter-compaction file pile grows B× faster — the price of
    * the Exchange-free store joins and bucket-pruned probes the
    * layout buys; each operator's compactStore cadence owns the pile,
    * and at deployment scale batches outweigh bucket counts, amortizing
    * the per-file cost back out. */
  def appendToStore(spark: SparkSession, table: String,
      df: DataFrame, sortCols: Seq[String]): Unit = {
    val spec = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec
    val laid = spec match {
      case Some(s) =>
        df.repartition(s.numBuckets, s.bucketColumnNames.map(col): _*)
      case None =>
        df.coalesce(1).sortWithinPartitions(sortCols.head, sortCols.tail: _*)
    }
    laid.write.insertInto(table)
  }

  /** Shared threshold-store compaction body — ONE implementation for
    * every operator that pairs key-ordered data tables with a
    * per-batch thresholds snapshot ([[StreamMix]], [[StreamMixTokens]],
    * [[StreamDsir]]), so a retention/staging fix cannot silently
    * diverge between them. Each data table is rewritten ordered on its
    * probe key; thr is TRIMMED to the trailing `retainThrBatches`
    * snapshots via compactTable's staged retention filter — survivors
    * land on disk in the staging table BEFORE the live table is
    * touched, so the recovery-critical state never has a crash window
    * where the dropped rows' table is its only copy — then ordered on
    * batch_id. */
  def compactThresholdStore(spark: SparkSession,
      dataTables: Seq[(String, Seq[String])], thrT: String,
      targetFileBytes: Long, retainThrBatches: Int): Map[String, (Int, Int)] = {
    // >= 2, not >= 1: healthy-path recovery reads only the trailing
    // snapshot, but a crash-after-thr replay of the NEWEST batch N
    // recomputes its state from snapshot N-1 — trimming to N alone
    // would make that replay recompute from scratch, fail the
    // foreign-checkpoint consistency guard, and permanently wedge the
    // stream (the snapshot it needs is deleted; no prefix or
    // checkpoint fix recovers it).
    require(retainThrBatches >= 2,
      "retainThrBatches: a crash-after-thr replay of the newest batch " +
        "recovers from its PREDECESSOR snapshot — keep >= 2")
    // Retention by RANK over the DISTINCT stored batch ids, never by id
    // arithmetic: batch ids are NOT contiguous in the thr table (a
    // batch whose pool filter leaves nothing writes no snapshot), so a
    // `max - (retain-1)` range cut could land inside a gap and delete
    // the PREDECESSOR snapshot the newest batch's crash-after-thr
    // replay recovers from — wedging (mixers) or, worse, degrading the
    // recovery to the no-history sentinel (selector).
    val keepIds = spark.table(thrT).select(col("batch_id")).distinct()
      .orderBy(col("batch_id").desc).limit(retainThrBatches)
      .collect().map(_.getLong(0))
    val thrCut: Option[String] =
      if (keepIds.isEmpty) None // empty store — nothing to trim
      else Some(s"batch_id >= ${keepIds.min}")
    dataTables.map { case (t, ord) =>
      t -> graft.sources.TableOps.compactTable(spark, t,
        targetFileBytes, orderBy = ord)
    }.toMap + (thrT -> graft.sources.TableOps.compactTable(spark, thrT,
      targetFileBytes, orderBy = Seq("batch_id"), where = thrCut))
  }

  /** [[compactThresholdStore]] with the mixers' table layout. */
  def compactMixStore(spark: SparkSession, docsT: String, ledgerT: String,
      thrT: String, targetFileBytes: Long,
      retainThrBatches: Int): Map[String, (Int, Int)] =
    compactThresholdStore(spark,
      Seq(docsT -> Seq("source", "skey", "doc_id"), ledgerT -> Seq("doc_id")),
      thrT, targetFileBytes, retainThrBatches)
}
