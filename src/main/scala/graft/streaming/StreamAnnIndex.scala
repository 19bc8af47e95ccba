package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Similarity

/** ONLINE maintenance of the persisted IVF-PQ index — the ingest half
  * of the ANN family's train-once/persist/serve split (the serve half
  * is `Similarity.annServeStream`/`annServeStreamBlueGreen`): new
  * vectors arrive as a streaming DataFrame of (vec_id, embedding), each
  * micro-batch is encoded against the FROZEN resident model (coarse
  * cell argmin + cell-residual PQ codes — `Similarity.ivfPqEncode`, the
  * "FAISS add" loop: training happened once, offline, on the base
  * corpus via `Similarity.annIndexWrite`/`annIndexWriteFrom`), and the
  * fresh codes are appended to the bucketed `<prefix>_codes` store the
  * serve paths already read. Cell quality for streamed-in vectors is
  * whatever the frozen Voronoi partition gives — exactly the production
  * trade `annIvfIncremental` documents, monitored via `e_ann_recall`
  * and answered by retraining + `annServeStreamBlueGreen` cut-over.
  *
  * Store semantics are INSERT-ONCE on vec_id (the index's primary key):
  * a vec_id already present keeps its standing row — an update is a
  * delete + re-add at the index-rebuild boundary, never an in-place
  * mutation under readers (FAISS `add` posture). Unlike the dedup
  * filter, NO decisions ledger is needed for exactly-once: a vector's
  * (cell, codes) is a pure function of the frozen model, so a replayed
  * batch re-derives bit-identical acknowledgments and the anti-joined
  * append adds nothing — every crash window converges under Spark's
  * batch replay:
  *
  *   - crash before the append: plain re-run.
  *   - crash after a partial append: the replay re-encodes and the
  *     vec_id anti-join admits only the rows that never landed.
  *   - crash after the append, before the sink: the replay finds every
  *     row present, appends nothing, and re-emits the SAME ack frame —
  *     the sink must be idempotent per batchId, the contract checkpoint
  *     recovery already imposes on every foreachBatch writer.
  *
  * Operational contract: the model is resolved per batch through the
  * version-keyed memo (`Similarity.loadIvfPqModel` — an unchanged
  * version costs one catalog metadata fetch, no Spark job), but a
  * REBUILD under a running add stream desyncs the stream's encodes from
  * the new model — stop the add stream across a rebuild, exactly the
  * `annServeStream` restart contract.
  *
  * 100 TB posture: per batch the work is O(|batch| · (k·d + M·K·d))
  * map-side arithmetic (model enters as plan literals), one capped
  * vec_id IN-list probe of the store (bucket/row-group pruned — never
  * a full scan below the cap), and a bucket-aligned append; the
  * standing corpus is never scanned, shuffled, or rewritten on the hot
  * path. [[compactStore]] owns the append file pile and rescales the
  * bucket count with store bytes, the same maintenance contract as
  * [[StreamDedup]]. */
object StreamAnnIndex {
  import StreamStoreOps.MaxPruneKeys

  private def codesT(prefix: String) = s"${prefix}_codes"

  /** One micro-batch: encode against the frozen model, append the
    * not-yet-present rows (anti-joined on vec_id, store side pruned by
    * the batch's own capped id list), and return the batch's ack frame
    * (vec_id, cell, batch_id) — deterministic per batch, so replays
    * re-emit it bit-identically (see the object doc's crash-window
    * analysis). The acked cell is the cell the vector is SERVED from:
    * for a vec_id the insert-once guard found already standing — e.g.
    * a re-submission with a changed embedding — the ack carries the
    * STANDING row's cell, never a fresh encoding the index didn't
    * store. Duplicate vec_ids WITHIN a batch are collapsed to one
    * deterministic winner (smallest embedding under array ordering)
    * before encoding — senders own key uniqueness; the tie-break only
    * pins replay determinism. Exposed package-private so specs can
    * drive replay/crash windows without a running stream. */
  private[graft] def processBatch(spark: SparkSession, prefix: String,
      batch: DataFrame, batchId: Long): DataFrame = {
    val (cents, cb) = Similarity.loadIvfPqModel(spark, prefix)
    StreamStoreOps.withPushdownInWindow(spark) {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("embedding"))
      val encoded = Similarity.ivfPqEncode(
        batch.select(col("vec_id"), col("embedding"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn"),
        cents, cb).localCheckpoint(true)
      // store-side read pruned by the batch's own ids (capped — over
      // the cap the full scan is the cheaper plan anyway); restricting
      // the anti-join's right side to left-side keys is a no-op
      val batchIds = encoded.select(col("vec_id"))
        .limit(MaxPruneKeys + 1).collect().map(_.getLong(0)).toIndexedSeq
      val slice = StreamStoreOps.keySlice(
        spark.table(codesT(prefix))
          .select(col("vec_id"), col("cell").as("standing_cell")),
        "vec_id", batchIds)
      val fresh = encoded
        .join(slice, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("cell"), col("codes"))
        .localCheckpoint(true)
      StreamStoreOps.appendToStore(spark, codesT(prefix), fresh, Seq("cell"))
      // Append-revision stamp: blue-green serve loops key their codes
      // re-list on (rebuild id, store rev), so new vectors become
      // servable at the next serve-batch boundary WITHOUT a restart
      // (Similarity.codesVersion). Stamped on every non-empty batch —
      // not just fresh appends — so the crash window "files landed,
      // stamp didn't" heals on the batch's replay instead of leaving
      // the rows invisible to running serve fleets indefinitely.
      if (batchIds.nonEmpty)
        spark.sql(s"ALTER TABLE ${codesT(prefix)} SET TBLPROPERTIES " +
          s"('graft.store.rev' = '${java.util.UUID.randomUUID()}')"): Unit
      // Ack cell = the cell the vector is SERVED from: the STANDING
      // row's cell when the insert-once guard kept it (a re-submitted
      // vec_id with a changed embedding must not be acked into a cell
      // the index never stored), the fresh encoding's otherwise. Read
      // after the append, both branches agree for this batch's fresh
      // rows, so the frame stays deterministic under replay.
      encoded.select(col("vec_id"), col("cell"))
        .join(slice, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("standing_cell"), col("cell")).as("cell"))
        .withColumn("batch_id", lit(batchId))
    }
  }

  /** Bucketed compaction of the codes store — collapses the per-append
    * file pile back to one right-sized file per non-empty bucket and
    * rescales the bucket count with store bytes (the
    * [[StreamDedup.bucketsFor]] growth policy; the CREATE-time count
    * fits the base build). Run with the add stream idle, same contract
    * as every in-place lake maintenance job here. */
  def compactStore(spark: SparkSession, prefix: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val r = graft.sources.TableOps.compactBucketedTable(spark, codesT(prefix),
      newBuckets = Some(StreamDedup.bucketsFor(
        graft.sources.TableOps.tableDataBytes(spark, codesT(prefix)),
        targetFileBytes)))
    // the rewrite replaced every FILE under an unchanged identity
    // (compaction preserves the graft.* properties) — bump the append
    // revision so running blue-green fleets re-list proactively instead
    // of through the missing-file retry path
    spark.sql(s"ALTER TABLE ${codesT(prefix)} SET TBLPROPERTIES " +
      s"('graft.store.rev' = '${java.util.UUID.randomUUID()}')"): Unit
    r
  }

  /** Start the online index-add loop over a streaming (vec_id,
    * embedding) DataFrame. The persisted index (model tables + codes
    * store) must exist — build it with `Similarity.annIndexWrite` /
    * `annIndexWriteFrom` over the training corpus first. `sink`
    * receives each batch's ack frame and its batchId and must be
    * idempotent per batchId (standard foreachBatch recovery contract —
    * see the object doc). */
  def streamingIndexAdd(vectors: DataFrame, prefix: String = "ann_ivfpq",
      checkpoint: Option[String] = None)
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(processBatch(batch.sparkSession, prefix, batch, batchId), batchId)
      }
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Registry replay twin (`e_ann_index_streamed`, oracled by
    * `Similarity.annIndexStreamedSql`): train + persist the index over
    * the BASE corpus only (vec_id % 5 != 0, the `annIvfIncremental`
    * split), stream the remaining 20% through the REAL store-backed
    * [[processBatch]] in two waves, then answer the standard 30-query
    * single-probe lookup from the final store — each neighbor labeled
    * base/new so the result itself proves the streamed-in rows are
    * retrievable. The whole fold runs inside the build-once guard
    * keyed to its source dir (`ensureFromSource` — the guard property
    * lands only after the last wave, so a crashed partial fold
    * rebuilds from scratch); repeat invocations pay serve cost only,
    * the production posture. */
  def annIndexStreamed(spark: SparkSession, sfDir: String): DataFrame = {
    val prefix = "annx_replay"
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    Similarity.ensureFromSource(spark, codesT(prefix), sfDir) {
      Similarity.annIndexWriteFrom(spark,
        emb.filter(col("vec_id") % 5 =!= 0), prefix)
      (0 until 2).foreach { wave =>
        processBatch(spark, prefix,
          emb.filter(col("vec_id") % 5 === 0)
            .filter(pmod(floor(col("vec_id") / 5), lit(2)) === wave),
          wave.toLong): Unit
      }
    }
    val (cents, cb) = Similarity.loadIvfPqModel(spark, prefix)
    Similarity.ivfPqScore(emb, spark.table(codesT(prefix)), cents, cb,
        probes = 1)
      .withColumn("src", when(col("neighbor_id") % 5 === 0, lit("new"))
        .otherwise(lit("base")))
  }
}
