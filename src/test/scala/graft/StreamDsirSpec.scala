package graft

import graft.ext.TextAnalysis
import graft.streaming.StreamDsir
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamDsirSpec extends SparkSpec {

  private def dropStore(prefix: String): Unit =
    Seq("model", "scores", "thr", "ledger").foreach(t =>
      graft.sources.TableOps.dropWithLocation(spark, s"${prefix}_$t"))

  private def rowsOf(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), col("gkey"), col("kept"), col("batch_id"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    .toSet

  /** The registry fixture's arrival shape (same waves as the other
    * streamed twins), carrying text for the frozen-model scoring. */
  private def wavedDocs = Tables.documents(spark, sf001)
    .withColumn("wave", pmod(floor(col("doc_id") / 20), lit(4L)).cast("int"))
    .select(col("doc_id"), col("source"), col("text"), col("wave"))

  test("live stream folds to the replay twin; final kept equals the batch resample") {
    dropStore("sds_eq")
    import spark.implicits._
    implicit val sq = spark.sqlContext
    StreamDsir.modelWrite(spark, "sds_eq", Tables.documents(spark, sf001))
    val byWave = wavedDocs.collect()
      .map(r => (r.getInt(3), (r.getLong(0), r.getString(1), r.getString(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toIndexedSeq).toMap
    val emitted =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Boolean, Long)]
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamDsir.streamingDsir(
      mem.toDF().toDF("doc_id", "source", "text"), prefix = "sds_eq") {
      (out, _) => rowsOf(out).foreach(emitted.add(_): Unit)
    }
    (0 until 4).foreach { w => mem.addData(byWave(w): _*); q.processAllAvailable() }
    q.stop()
    val arr = emitted.toArray(Array.empty[(Long, Long, Boolean, Long)])
    // latest verdict per doc == the registered twin's final kept
    spark.catalog.refreshTable("sds_eq_scores")
    spark.catalog.refreshTable("sds_eq_ledger")
    spark.catalog.refreshTable("sds_eq_thr")
    val live = arr.groupBy(_._1).view.mapValues(_.maxBy(_._4)._3).toMap
    val twin = StreamDsir.dsirStreamed(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(twin.map(_._1).toSet == live.keySet,
      "live stream and twin decided different doc sets")
    twin.foreach { case (id, _, _, _, kept) =>
      assert(live(id) == kept, s"doc $id: live ${live(id)} != twin $kept")
    }
    // the running top-k invariant lands exactly on the batch resample
    val batchSel = TextAnalysis
      .dsirResampleOn(Tables.documents(spark, sf001), "dsir42").collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    twin.foreach { case (id, _, _, _, kept) =>
      assert(batchSel(id) == kept,
        s"doc $id: twin kept $kept != batch resample ${batchSel(id)}")
    }
    // admissions-then-eviction shape: any doc admitted then not kept
    // must have exactly 2 ledger rows (true, then false) — the
    // monotone threshold can flip a doc at most once
    val perDoc = arr.groupBy(_._1)
    perDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._4).map(_._3).toSeq
      assert(sorted.length <= 2 && (sorted.length < 2 || sorted == Seq(true, false)),
        s"doc $id verdict sequence $sorted violates admit-once/evict-once")
    }
    dropStore("sds_eq"); dropStore("dsr_replay")
  }

  test("a replayed batch re-emits identical changes and leaves all tables unchanged") {
    dropStore("sds_rp")
    StreamDsir.modelWrite(spark, "sds_rp", Tables.documents(spark, sf001))
    val w0 = wavedDocs.filter(col("wave") === 0)
      .select(col("doc_id"), col("source"), col("text"))
    val w1 = wavedDocs.filter(col("wave") === 1)
      .select(col("doc_id"), col("source"), col("text"))
    StreamDsir.processBatch(spark, "sds_rp", w0, 0L).count(): Unit
    val first = rowsOf(StreamDsir.processBatch(spark, "sds_rp", w1, 1L))
    val counts = Seq("scores", "thr", "ledger")
      .map(t => t -> spark.table(s"sds_rp_$t").count()).toMap
    val replay = rowsOf(StreamDsir.processBatch(spark, "sds_rp", w1, 1L))
    assert(replay == first, "replay emitted different changes")
    Seq("scores", "thr", "ledger").foreach { t =>
      assert(spark.table(s"sds_rp_$t").count() == counts(t),
        s"replay grew sds_rp_$t")
    }
    dropStore("sds_rp")
  }

  test("crash residue in both windows (thr-only; thr+scores) converges to the clean delta") {
    Seq("sds_crA", "sds_crB", "sds_crC").foreach(dropStore)
    val docs = Tables.documents(spark, sf001)
    val w0 = wavedDocs.filter(col("wave") === 0)
      .select(col("doc_id"), col("source"), col("text"))
    val w1 = wavedDocs.filter(col("wave") === 1)
      .select(col("doc_id"), col("source"), col("text"))
    // clean run on A
    StreamDsir.modelWrite(spark, "sds_crA", docs)
    StreamDsir.processBatch(spark, "sds_crA", w0, 0L).count(): Unit
    val cleanDelta = rowsOf(StreamDsir.processBatch(spark, "sds_crA", w1, 1L))
    // B: crash window 1 — batch-1 thresholds landed, scores/ledger did
    // not; the crashed attempt's thr row is deterministic, so A's is a
    // faithful copy of the residue
    StreamDsir.modelWrite(spark, "sds_crB", docs)
    StreamDsir.processBatch(spark, "sds_crB", w0, 0L).count(): Unit
    spark.table("sds_crA_thr").filter(col("batch_id") === 1L)
      .write.insertInto("sds_crB_thr")
    val deltaB = rowsOf(StreamDsir.processBatch(spark, "sds_crB", w1, 1L))
    assert(deltaB == cleanDelta, "thr-only crash replay diverged")
    // C: crash window 2 — thresholds AND scores landed, ledger did not
    StreamDsir.modelWrite(spark, "sds_crC", docs)
    StreamDsir.processBatch(spark, "sds_crC", w0, 0L).count(): Unit
    spark.table("sds_crA_thr").filter(col("batch_id") === 1L)
      .write.insertInto("sds_crC_thr")
    spark.table("sds_crA_scores").filter(col("batch_id") === 1L)
      .write.insertInto("sds_crC_scores")
    val deltaC = rowsOf(StreamDsir.processBatch(spark, "sds_crC", w1, 1L))
    assert(deltaC == cleanDelta, "thr+scores crash replay diverged")
    Seq("sds_crB", "sds_crC").foreach { p =>
      Seq("scores", "ledger", "thr").foreach { t =>
        val a = spark.table(s"sds_crA_$t")
        val x = spark.table(s"${p}_$t")
        assert(a.exceptAll(x).isEmpty && x.exceptAll(a).isEmpty,
          s"${p}_$t diverged from the clean run")
      }
      assert(spark.table(s"${p}_scores").groupBy(col("doc_id")).count()
        .filter(col("count") > 1).count() == 0,
        s"$p crash replay duplicated scores")
    }
    Seq("sds_crA", "sds_crB", "sds_crC").foreach(dropStore)
  }

  test("threshold is monotone, selection is the running top-k, store never re-admits") {
    dropStore("sds_mono")
    StreamDsir.modelWrite(spark, "sds_mono", Tables.documents(spark, sf001))
    var lastThr = (Long.MinValue, Long.MaxValue)
    (0 until 4).foreach { w =>
      StreamDsir.processBatch(spark, "sds_mono",
        wavedDocs.filter(col("wave") === lit(w))
          .select(col("doc_id"), col("source"), col("text")),
        w.toLong).count(): Unit
      val t = spark.table("sds_mono_thr")
        .filter(col("batch_id") === w.toLong)
        .select(col("t_key"), col("t_doc"), col("n_sel")).head()
      val thr = (t.getLong(0), t.getLong(1))
      // threshold order follows the selection law (gkey desc, doc_id
      // asc): a HIGHER threshold has a larger t_key, or an equal t_key
      // with a SMALLER t_doc — compare on (t_key, -t_doc)
      def rank(p: (Long, Long)) = (p._1, -p._2)
      assert(implicitly[Ordering[(Long, Long)]]
        .compare(rank(thr), rank(lastThr)) >= 0 ||
        lastThr == (Long.MinValue, Long.MaxValue),
        s"wave $w threshold regressed: $lastThr -> $thr")
      lastThr = thr
      // selection == an independent top-k re-rank of the scores store
      val scores = spark.table("sds_mono_scores")
        .select(col("doc_id"), col("gkey")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val expect = scores.sortBy(s => (-s._2, s._1)).take(100).map(_._1).toSet
      val got = StreamDsir.currentSelected(spark, "sds_mono")
        .filter(col("selected")).select(col("doc_id")).collect()
        .map(_.getLong(0)).toSet
      assert(got == expect,
        s"wave $w: selected set != running top-k (|got|=${got.size})")
      assert(t.getLong(2) == got.size, s"wave $w: n_sel != |selected|")
    }
    dropStore("sds_mono")
  }

  test("compactStore preserves state and subsequent batches serve identically") {
    dropStore("sds_cp"); dropStore("sds_cq")
    val docs = Tables.documents(spark, sf001)
    Seq("sds_cp", "sds_cq").foreach { p =>
      StreamDsir.modelWrite(spark, p, docs)
      (0 until 2).foreach { w =>
        StreamDsir.processBatch(spark, p,
          wavedDocs.filter(col("wave") === lit(w))
            .select(col("doc_id"), col("source"), col("text")),
          w.toLong).count(): Unit
      }
    }
    val res = StreamDsir.compactStore(spark, "sds_cp")
    assert(res.values.forall { case (_, after) => after >= 1 })
    (2 until 4).foreach { w =>
      val a = rowsOf(StreamDsir.processBatch(spark, "sds_cp",
        wavedDocs.filter(col("wave") === lit(w))
          .select(col("doc_id"), col("source"), col("text")), w.toLong))
      val b = rowsOf(StreamDsir.processBatch(spark, "sds_cq",
        wavedDocs.filter(col("wave") === lit(w))
          .select(col("doc_id"), col("source"), col("text")), w.toLong))
      assert(a == b, s"wave $w diverged after compaction")
    }
    dropStore("sds_cp"); dropStore("sds_cq")
  }

  test("thr retention keeps the trailing snapshots by RANK across batch-id gaps") {
    dropStore("sds_gap")
    import spark.implicits._
    StreamDsir.modelWrite(spark, "sds_gap", Tables.documents(spark, sf001))
    StreamDsir.processBatch(spark, "sds_gap",
      wavedDocs.filter(col("wave") === 0)
        .select(col("doc_id"), col("source"), col("text")), 0L).count(): Unit
    // batch 1 is all target-source: empty emission, NO thr snapshot —
    // the id sequence in the thr table now has a gap
    StreamDsir.processBatch(spark, "sds_gap",
      Seq((900001L, "src0", "a b"), (900002L, "src1", "c d"))
        .toDF("doc_id", "source", "text"), 1L).count(): Unit
    StreamDsir.processBatch(spark, "sds_gap",
      wavedDocs.filter(col("wave") === 1)
        .select(col("doc_id"), col("source"), col("text")), 2L).count(): Unit
    StreamDsir.compactStore(spark, "sds_gap", retainThrBatches = 2)
    val ids = spark.table("sds_gap_thr")
      .select(col("batch_id")).distinct().collect().map(_.getLong(0)).toSet
    // rank-based retention must keep snapshots {0, 2} — an id-range cut
    // (batch_id >= max-1) would land in the gap and delete snapshot 0,
    // the predecessor a crash-after-thr replay of batch 2 recovers from
    assert(ids == Set(0L, 2L),
      s"retention trimmed the predecessor across the id gap: kept $ids")
    dropStore("sds_gap")
  }

  test("a store whose predecessor snapshot is missing refuses instead of mass-evicting") {
    dropStore("sds_ms"); dropStore("sds_msA")
    val docs = Tables.documents(spark, sf001)
    val w0 = wavedDocs.filter(col("wave") === 0)
      .select(col("doc_id"), col("source"), col("text"))
    val w1 = wavedDocs.filter(col("wave") === 1)
      .select(col("doc_id"), col("source"), col("text"))
    // A supplies the deterministic batch-1 thr residue
    StreamDsir.modelWrite(spark, "sds_msA", docs)
    StreamDsir.processBatch(spark, "sds_msA", w0, 0L).count(): Unit
    StreamDsir.processBatch(spark, "sds_msA", w1, 1L).count(): Unit
    StreamDsir.modelWrite(spark, "sds_ms", docs)
    StreamDsir.processBatch(spark, "sds_ms", w0, 0L).count(): Unit
    // crash window 1 residue for batch 1 — but with the batch-0
    // predecessor snapshot GONE (an over-trimmed / foreign thr history)
    graft.sources.TableOps.resetTable(spark, "sds_ms_thr",
      spark.table("sds_msA_thr").filter(col("batch_id") === 1L)
        .select(col("batch_id"), col("t_key"), col("t_doc"), col("n_sel")))
    val ex = intercept[IllegalArgumentException] {
      StreamDsir.processBatch(spark, "sds_ms", w1, 1L)
    }
    assert(ex.getMessage.contains("predecessor snapshot is missing"),
      s"wrong refusal: ${ex.getMessage}")
    dropStore("sds_ms"); dropStore("sds_msA")
  }

  test("a missing frozen model refuses loudly; target-source arrivals are not candidates") {
    dropStore("sds_nm")
    import spark.implicits._
    val ex = intercept[IllegalArgumentException] {
      StreamDsir.processBatch(spark, "sds_nm",
        Seq((1L, "src2", "a b")).toDF("doc_id", "source", "text"), 0L)
    }
    assert(ex.getMessage.contains("modelWrite"))
    dropStore("sds_nm")
    dropStore("sds_tg")
    StreamDsir.modelWrite(spark, "sds_tg", Tables.documents(spark, sf001))
    val out = StreamDsir.processBatch(spark, "sds_tg",
      Seq((1L, "src0", "a b"), (2L, "src1", "c d"), (3L, "src2", "e f"))
        .toDF("doc_id", "source", "text"), 0L)
    val ids = out.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L),
      s"target-domain docs must not enter the pool: $ids")
    dropStore("sds_tg")
  }
}
