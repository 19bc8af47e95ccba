package graft

import graft.streaming.StreamMixTokens
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamMixTokensSpec extends SparkSpec {

  private def dropStore(prefix: String): Unit =
    Seq("docs", "ledger", "thr").foreach(t =>
      graft.sources.TableOps.dropWithLocation(spark, s"${prefix}_$t"))

  private def rowsOf(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), col("source"), col("in_partial"), col("batch_id"))
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getLong(3)))
    .toSet

  /** The registry fixture's arrival shape (same waves as
    * `corpusMixIncr`), carrying text for token extraction. */
  private def wavedDocs = Tables.documents(spark, sf001)
    .withColumn("wave", pmod(floor(col("doc_id") / 20), lit(4L)).cast("int"))
    .select(col("doc_id"), col("source"), col("text"), col("wave"))

  /** (in_partial, copies) per doc under the batch token law over the
    * wave-j arrival prefix. */
  private def lawAt(j: Int): Map[Long, (Boolean, Long)] =
    ext.TextAnalysis.corpusMixTokensOn(
      wavedDocs.filter(col("wave") <= j)
        .select(col("doc_id"), col("source"), col("text")), "epoch42")
      .select(col("doc_id"), col("in_partial"), col("copies"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2)))
      .toMap

  test("streamed emissions + thresholds fold to the batch token law, wave for wave") {
    dropStore("smt_eq")
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val lawByWave = (0 until 4).map(lawAt)
    val byWave = wavedDocs.collect()
      .map(r => (r.getInt(3), (r.getLong(0), r.getString(1), r.getString(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toIndexedSeq).toMap
    val srcOf = byWave.values.flatten.map(t => t._1 -> t._2).toMap
    val emitted =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Boolean, Long)]
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamMixTokens.streamingMixTokens(
      mem.toDF().toDF("doc_id", "source", "text"), prefix = "smt_eq") {
      (out, _) => rowsOf(out).foreach(emitted.add(_): Unit)
    }
    (0 until 4).foreach { w =>
      mem.addData(byWave(w): _*)
      q.processAllAvailable()
      val arr = emitted.toArray(Array.empty[(Long, String, Boolean, Long)])
      // fold: latest in_partial per doc + this wave's epoch counts.
      // The appends ran in foreachBatch's CLONED session; a consumer
      // reading the thr snapshot from another session refreshes first
      // (standard cross-session table-cache contract).
      spark.catalog.refreshTable("smt_eq_thr")
      val state = arr.groupBy(_._1).view.mapValues(_.maxBy(_._4)._3).toMap
      val fe = spark.table("smt_eq_thr").filter(col("batch_id") === w.toLong)
        .select(col("source"), col("full_epochs")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val arrived = byWave.filter(_._1 <= w).values.flatten.map(_._1).toSet
      arrived.foreach { id =>
        val (lawP, lawC) = lawByWave(w)(id)
        assert(state.get(id) == Some(lawP),
          s"wave $w doc $id: in_partial stream=${state.get(id)} law=$lawP")
        assert(fe(srcOf(id)) + (if (state(id)) 1L else 0L) == lawC,
          s"wave $w doc $id: copies fold diverged from the law")
      }
      // O(flips) emission: old-doc rows this wave == the law's flip count
      if (w > 0) {
        val freshIds = byWave(w).map(_._1).toSet
        val oldEmits = arr.filter(e => e._4 == w.toLong && !freshIds(e._1))
        val flips = lawByWave(w - 1).keysIterator.count(id =>
          lawByWave(w)(id)._1 != lawByWave(w - 1)(id)._1)
        assert(oldEmits.length == flips,
          s"wave $w: ${oldEmits.length} old-doc emissions vs $flips law flips")
      }
    }
    q.stop()
    // the per-doc ledger records only CHANGES
    emitted.toArray(Array.empty[(Long, String, Boolean, Long)])
      .groupBy(_._1).values.foreach { es =>
        es.sortBy(_._4).map(_._3).toSeq.sliding(2).foreach {
          case Seq(a, b) => assert(a != b, "ledger recorded a non-change")
          case _ => ()
        }
      }
    // fixture sanity: copies must move through EPOCH changes alone for
    // some doc (unchanged in_partial, changed copies) — the case whose
    // emission cost must be O(|sources|), not O(corpus)
    val epochMoved = (0 until 3).exists { w =>
      lawByWave(w).exists { case (id, (p, c)) =>
        lawByWave(w + 1).get(id).exists { case (p2, c2) => p2 == p && c2 != c }
      }
    }
    assert(epochMoved, "fixture never moved full_epochs — test inert")
    dropStore("smt_eq")
  }

  test("a source whose only docs carry NULL text gets zero epochs, not a crash") {
    dropStore("smt_z")
    import spark.implicits._
    // src987's entire arrival is NULL-text (a source name the fixture
    // never uses): tok is NULL, the accumulated token count is 0, and
    // the quota law's division must resolve to zero servable epochs
    // (the batch law's NULL-propagation outcome) — a bare division
    // killed the stream with an ArithmeticException
    val batch = Seq((9000001L, "src987", null: String),
        (9000002L, "src987", null: String))
      .toDF("doc_id", "source", "text")
      .unionByName(wavedDocs.filter(col("wave") === 0)
        .select(col("doc_id"), col("source"), col("text")))
    val out = StreamMixTokens.processBatch(spark, "smt_z", batch, 0L)
    val z = out.filter(col("source") === "src987").collect()
    assert(z.length == 2, s"expected 2 src987 emissions, got ${z.length}")
    assert(z.forall(!_.getBoolean(2)),
      "a zero-token source must keep nothing (epochs 0, empty partial)")
    // the healthy sources still decide (sanity: the guard didn't mask them)
    assert(out.filter(col("source") =!= "src987").count() > 0)
    // the BATCH law over the same frame takes the same guarded branch
    // (corpusMixTokensOn's CASE WHEN t_s = 0) — a bare `b_s div t_s`
    // raised DIVIDE_BY_ZERO under ANSI instead of agreeing with the
    // stream's zero-copies outcome
    val lawZ = ext.TextAnalysis.corpusMixTokensOn(batch, "epoch42")
      .filter(col("source") === "src987")
      .select(col("doc_id"), col("in_partial"), col("copies")).collect()
    assert(lawZ.length == 2, s"batch law lost src987 rows: ${lawZ.length}")
    assert(lawZ.forall(r => !r.getBoolean(1) && r.getLong(2) == 0L),
      "batch law must give a zero-token source zero copies, like the stream")
    dropStore("smt_z")
  }

  test("within-batch duplicate doc_ids collapse to one deterministic winner") {
    import spark.implicits._
    // doc 42 redelivered in ONE batch under two (source, text) variants:
    // the winner must be the smallest (source, tok) — ('src1', 2 toks)
    // beats ('src2', 1 tok) — REGARDLESS of arrival order, or a
    // crash-after-thr replay could recompute different token sums and
    // wedge the recovery-binding equality guard.
    val variants = Seq((42L, "src1", "a b"), (42L, "src2", "a"))
    for ((order, i) <- Seq(variants, variants.reverse).zipWithIndex) {
      val pfx = s"smt_dup$i"
      dropStore(pfx)
      val batch = order.toDF("doc_id", "source", "text")
        .repartition(4) // scatter so dropDuplicates' pick would be order-dependent
      StreamMixTokens.processBatch(spark, pfx, batch, 0L)
      val docs = spark.table(s"${pfx}_docs")
        .select(col("doc_id"), col("source"), col("tok")).collect()
      assert(docs.length == 1, s"duplicate doc_id not collapsed: ${docs.length}")
      assert(docs.head.getString(1) == "src1" && docs.head.getLong(2) == 2L,
        s"order $i picked ${docs.head}, not the deterministic (src1, 2) winner")
      dropStore(pfx)
    }
  }

  test("a replayed batch re-emits identical changes and leaves all tables unchanged") {
    dropStore("smt_rp")
    val w0 = wavedDocs.filter(col("wave") === 0)
      .select(col("doc_id"), col("source"), col("text"))
    val w1 = wavedDocs.filter(col("wave") === 1)
      .select(col("doc_id"), col("source"), col("text"))
    val e0 = rowsOf(StreamMixTokens.processBatch(spark, "smt_rp", w0, 0L))
    val e1 = rowsOf(StreamMixTokens.processBatch(spark, "smt_rp", w1, 1L))
    val counts = Seq("docs", "ledger", "thr")
      .map(t => t -> spark.table(s"smt_rp_$t").count()).toMap
    assert(rowsOf(StreamMixTokens.processBatch(spark, "smt_rp", w0, 0L)) == e0)
    assert(rowsOf(StreamMixTokens.processBatch(spark, "smt_rp", w1, 1L)) == e1)
    Seq("docs", "ledger", "thr").foreach(t =>
      assert(spark.table(s"smt_rp_$t").count() == counts(t),
        s"replay grew smt_rp_$t"))
    dropStore("smt_rp")
  }

  test("crash residue in both windows (thr-only; thr+docs) converges to the clean delta") {
    Seq("smt_crA", "smt_crB", "smt_crC").foreach(dropStore)
    val w0 = wavedDocs.filter(col("wave") === 0)
      .select(col("doc_id"), col("source"), col("text"))
    val w1 = wavedDocs.filter(col("wave") === 1)
      .select(col("doc_id"), col("source"), col("text"))
    StreamMixTokens.processBatch(spark, "smt_crA", w0, 0L).count(): Unit
    val cleanDelta = rowsOf(StreamMixTokens.processBatch(spark, "smt_crA", w1, 1L))
    // window 1: batch-1 thresholds landed, docs/ledger did not
    StreamMixTokens.processBatch(spark, "smt_crB", w0, 0L).count(): Unit
    spark.table("smt_crA_thr").filter(col("batch_id") === 1L)
      .write.insertInto("smt_crB_thr")
    val deltaB = rowsOf(StreamMixTokens.processBatch(spark, "smt_crB", w1, 1L))
    assert(deltaB == cleanDelta,
      s"thr-only crash replay diverged: only-replay=${(deltaB -- cleanDelta).take(3)} " +
        s"only-clean=${(cleanDelta -- deltaB).take(3)}")
    // window 2: thresholds AND docs landed, ledger did not
    StreamMixTokens.processBatch(spark, "smt_crC", w0, 0L).count(): Unit
    spark.table("smt_crA_thr").filter(col("batch_id") === 1L)
      .write.insertInto("smt_crC_thr")
    spark.table("smt_crA_docs")
      .join(w1.select(col("doc_id")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("skey"), col("tok"))
      .write.insertInto("smt_crC_docs")
    val deltaC = rowsOf(StreamMixTokens.processBatch(spark, "smt_crC", w1, 1L))
    assert(deltaC == cleanDelta,
      s"thr+docs crash replay diverged: only-replay=${(deltaC -- cleanDelta).take(3)} " +
        s"only-clean=${(cleanDelta -- deltaC).take(3)}")
    Seq("smt_crB", "smt_crC").foreach { p =>
      Seq("docs", "ledger").foreach { t =>
        val a = spark.table(s"smt_crA_$t")
        val x = spark.table(s"${p}_$t")
        assert(a.exceptAll(x).isEmpty && x.exceptAll(a).isEmpty,
          s"${p}_$t diverged from the clean run")
      }
      assert(spark.table(s"${p}_docs").groupBy(col("doc_id")).count()
        .filter(col("count") > 1).count() == 0,
        s"$p crash replay duplicated docs")
    }
    Seq("smt_crA", "smt_crB", "smt_crC").foreach(dropStore)
  }

  test("registry twin corpusMixTokensStreamed matches the final batch law and resets idempotently") {
    def copiesMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("copies0"), col("copies1"),
        col("copies2"), col("copies3"))
      .collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i =>
        if (r.isNullAt(i)) None else Some(r.getLong(i))))
      .toMap
    val streamed = copiesMap(StreamMixTokens.corpusMixTokensStreamed(spark, sf001))
    // final wave equals the full-corpus batch operator
    val full = ext.TextAnalysis.corpusMixTokens(spark, sf001)
      .select(col("doc_id"), col("copies"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.keySet == full.keySet)
    streamed.foreach { case (id, per) =>
      assert(per(3) == Some(full(id)),
        s"doc $id: final copies streamed=${per(3)} batch=${full(id)}") }
    // intermediate waves equal the per-prefix law
    (0 until 3).foreach { j =>
      val law = lawAt(j)
      streamed.foreach { case (id, per) =>
        assert(per(j) == law.get(id).map(_._2),
          s"doc $id wave $j: streamed=${per(j)} law=${law.get(id).map(_._2)}")
      }
    }
    // second invocation resets the scratch store and reproduces itself
    assert(copiesMap(StreamMixTokens.corpusMixTokensStreamed(spark, sf001)) == streamed)
    // the threshold-derived audit equals the final fold
    val audit = StreamMixTokens.currentCopies(spark, "cmxt_replay")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(audit.size == streamed.size)
    audit.foreach { case (id, c) =>
      assert(Some(c) == streamed(id)(3), s"currentCopies doc $id") }
  }

  test("compactStore preserves state, trims thr history, and subsequent batches serve identically") {
    dropStore("smt_cp"); dropStore("smt_cq")
    val waves = (0 until 4).map(w => wavedDocs.filter(col("wave") === w)
      .select(col("doc_id"), col("source"), col("text")))
    (0 to 1).foreach { w =>
      StreamMixTokens.processBatch(spark, "smt_cp", waves(w), w.toLong).count(): Unit
      StreamMixTokens.processBatch(spark, "smt_cq", waves(w), w.toLong).count(): Unit
    }
    val res = StreamMixTokens.compactStore(spark, "smt_cp", 8L * 1024 * 1024)
    res.foreach { case (t, (before, after)) =>
      assert(after <= before, s"$t grew under compaction") }
    (2 to 3).foreach { w =>
      val a = rowsOf(StreamMixTokens.processBatch(spark, "smt_cp", waves(w), w.toLong))
      val b = rowsOf(StreamMixTokens.processBatch(spark, "smt_cq", waves(w), w.toLong))
      assert(a == b, s"post-compaction batch $w diverged")
    }
    StreamMixTokens.compactStore(spark, "smt_cp", retainThrBatches = 2)
    val thrBatches = spark.table("smt_cp_thr")
      .select(col("batch_id")).distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(thrBatches == Seq(2L, 3L), s"retention kept $thrBatches")
    // next batch recovers from the trailing snapshot; audit still obeys
    // the full token law over the whole accumulated corpus
    val extra = waves(0)
      .select((col("doc_id") + lit(500000L)).as("doc_id"), col("source"),
        col("text"))
    StreamMixTokens.processBatch(spark, "smt_cp", extra, 4L).count(): Unit
    val audit = StreamMixTokens.currentCopies(spark, "smt_cp")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val lawDocs = wavedDocs.select(col("doc_id"), col("source"), col("text"))
      .unionByName(extra)
    val law = ext.TextAnalysis.corpusMixTokensOn(lawDocs, "epoch42")
      .select(col("doc_id"), col("copies"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(audit.keySet == law.keySet)
    audit.foreach { case (id, c) =>
      assert(c == law(id), s"post-retention doc $id: audit=$c law=${law(id)}") }
    dropStore("smt_cp"); dropStore("smt_cq")
  }
}
