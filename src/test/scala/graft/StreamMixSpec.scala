package graft

import graft.streaming.StreamMix
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamMixSpec extends SparkSpec {

  private def dropStore(prefix: String): Unit =
    Seq("docs", "ledger", "thr").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_$t"): Unit)

  private def rowsOf(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), col("source"), col("kept"), col("batch_id"))
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getLong(3)))
    .toSet

  /** The registry fixture's arrival shape: wave = (doc_id div 20) mod 4,
    * seed "incr42" — identical to `corpusMixIncr`, so the stream's folds
    * are checked against the DuckDB-oracled law. */
  private def wavedDocs = Tables.documents(spark, sf001)
    .withColumn("wave", pmod(floor(col("doc_id") / 20), lit(4L)).cast("int"))
    .select(col("doc_id"), col("source"), col("wave"))

  test("streaming mix emissions fold to the oracled incremental twin, wave for wave") {
    dropStore("sm_eq")
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // expected per-wave kept flags from the oracled batch twin
    val expected = ext.TextAnalysis.corpusMixIncrOn(wavedDocs, "incr42", 4)
      .collect()
      .map(r => r.getLong(0) -> (0 until 4).map(k =>
        if (r.isNullAt(5 + k)) None else Some(r.getBoolean(5 + k))))
      .toMap
    val byWave = wavedDocs.collect()
      .map(r => (r.getInt(2), (r.getLong(0), r.getString(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toIndexedSeq).toMap
    val emitted =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Boolean, Long)]
    val mem = MemoryStream[(Long, String)]
    val q = StreamMix.streamingMix(
      mem.toDF().toDF("doc_id", "source"), prefix = "sm_eq", seed = "incr42") {
      (out, _) => rowsOf(out).foreach(emitted.add(_): Unit)
    }
    (0 until 4).foreach { w =>
      mem.addData(byWave(w): _*)
      q.processAllAvailable()
      // fold emissions so far: each doc's latest verdict at batch <= w
      val state = emitted.toArray(Array.empty[(Long, String, Boolean, Long)])
        .groupBy(_._1).view.mapValues(_.maxBy(_._4)._3).toMap
      val arrived = byWave.filter(_._1 <= w).values.flatten.map(_._1).toSet
      assert(state.keySet == arrived ||
        state.keySet.subsetOf(arrived), // docs with no emission yet would be a fold bug
        s"wave $w: emissions cover ${state.size} docs vs ${arrived.size} arrived")
      arrived.foreach { id =>
        assert(state.get(id) == expected(id)(w),
          s"wave $w doc $id: stream=${state.get(id)} twin=${expected(id)(w)}")
      }
    }
    q.stop()
    // changes only: consecutive emissions for one doc always flip
    val byDoc = emitted.toArray(Array.empty[(Long, String, Boolean, Long)])
      .groupBy(_._1).values
    byDoc.foreach { es =>
      es.sortBy(_._4).map(_._3).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a != b, "ledger recorded a non-change")
        case _ => ()
      }
    }
    dropStore("sm_eq")
  }

  test("a replayed batch re-emits identical changes and leaves all tables unchanged") {
    dropStore("sm_rp")
    val w0 = wavedDocs.filter(col("wave") === 0)
      .select(col("doc_id"), col("source"))
    val w1 = wavedDocs.filter(col("wave") === 1)
      .select(col("doc_id"), col("source"))
    val e0 = rowsOf(StreamMix.processBatch(spark, "sm_rp", w0, 0L, "incr42"))
    val e1 = rowsOf(StreamMix.processBatch(spark, "sm_rp", w1, 1L, "incr42"))
    val counts = Seq("docs", "ledger", "thr")
      .map(t => t -> spark.table(s"sm_rp_$t").count()).toMap
    // replay both batches: identical emissions, no table growth
    assert(rowsOf(StreamMix.processBatch(spark, "sm_rp", w0, 0L, "incr42")) == e0)
    assert(rowsOf(StreamMix.processBatch(spark, "sm_rp", w1, 1L, "incr42")) == e1)
    Seq("docs", "ledger", "thr").foreach(t =>
      assert(spark.table(s"sm_rp_$t").count() == counts(t),
        s"replay grew sm_rp_$t"))
    dropStore("sm_rp")
  }

  test("crash residue in both windows (thr-only; thr+docs) converges to the clean delta") {
    Seq("sm_crA", "sm_crB", "sm_crC").foreach(dropStore)
    val w0 = wavedDocs.filter(col("wave") === 0)
      .select(col("doc_id"), col("source"))
    val w1 = wavedDocs.filter(col("wave") === 1)
      .select(col("doc_id"), col("source"))
    // clean run on A
    StreamMix.processBatch(spark, "sm_crA", w0, 0L, "incr42").count(): Unit
    val cleanDelta = rowsOf(StreamMix.processBatch(spark, "sm_crA", w1, 1L, "incr42"))
    // B: crash window 1 — batch-1 thresholds landed, docs/ledger did not.
    // The crashed attempt's thr rows are deterministic, so A's are a
    // faithful copy of what the crash left behind.
    StreamMix.processBatch(spark, "sm_crB", w0, 0L, "incr42").count(): Unit
    spark.table("sm_crA_thr").filter(col("batch_id") === 1L)
      .write.insertInto("sm_crB_thr")
    val deltaB = rowsOf(StreamMix.processBatch(spark, "sm_crB", w1, 1L, "incr42"))
    assert(deltaB == cleanDelta,
      s"thr-only crash replay diverged: only-replay=${(deltaB -- cleanDelta).take(3)} " +
        s"only-clean=${(cleanDelta -- deltaB).take(3)}")
    // C: crash window 2 — thresholds AND docs landed, ledger did not
    StreamMix.processBatch(spark, "sm_crC", w0, 0L, "incr42").count(): Unit
    spark.table("sm_crA_thr").filter(col("batch_id") === 1L)
      .write.insertInto("sm_crC_thr")
    spark.table("sm_crA_docs")
      .join(w1.select(col("doc_id")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("skey"))
      .write.insertInto("sm_crC_docs")
    val deltaC = rowsOf(StreamMix.processBatch(spark, "sm_crC", w1, 1L, "incr42"))
    assert(deltaC == cleanDelta,
      s"thr+docs crash replay diverged: only-replay=${(deltaC -- cleanDelta).take(3)} " +
        s"only-clean=${(cleanDelta -- deltaC).take(3)}")
    // convergence: every table holds the same content as the clean run,
    // and the docs table has no duplicates
    Seq("sm_crB", "sm_crC").foreach { p =>
      Seq("docs", "ledger").foreach { t =>
        val a = spark.table(s"sm_crA_$t")
        val x = spark.table(s"${p}_$t")
        assert(a.exceptAll(x).isEmpty && x.exceptAll(a).isEmpty,
          s"${p}_$t diverged from the clean run")
      }
      assert(spark.table(s"${p}_docs").groupBy(col("doc_id")).count()
        .filter(col("count") > 1).count() == 0, s"$p crash replay duplicated docs")
    }
    Seq("sm_crA", "sm_crB", "sm_crC").foreach(dropStore)
  }

  test("a foreign batch colliding with a used batch_id refuses instead of swallowing") {
    dropStore("sm_fk")
    val w0 = wavedDocs.filter(col("wave") === 0)
      .select(col("doc_id"), col("source"))
    val w1 = wavedDocs.filter(col("wave") === 1)
      .select(col("doc_id"), col("source"))
    StreamMix.processBatch(spark, "sm_fk", w0, 0L, "incr42").count(): Unit
    // the ADVICE hazard shape: a fresh checkpoint restarts at batch 0
    // against a store whose ledger already used it — the old code
    // silently re-emitted history and dropped the new docs forever
    val mixed = w0.limit(5).unionByName(w1)
    val ex1 = intercept[IllegalArgumentException] {
      StreamMix.processBatch(spark, "sm_fk", mixed, 0L, "incr42")
    }
    assert(ex1.getMessage.contains("different checkpoint"))
    // a purely-new batch at id 0 trips the thresholds-consistency guard
    val ex2 = intercept[IllegalArgumentException] {
      StreamMix.processBatch(spark, "sm_fk", w1, 0L, "incr42")
    }
    assert(ex2.getMessage.toLowerCase.contains("inconsistent") ||
      ex2.getMessage.contains("different checkpoint"))
    dropStore("sm_fk")
  }

  test("a late tiny source collapses quotas and evicts across sources, law-equal") {
    dropStore("sm_ev")
    // wave 0: every source except src3, whole corpus; wave 1: five src3
    // docs — v_src3 = 5·(12/4) = 15 becomes the binding minimum, u12
    // collapses, and previously-kept docs across ALL sources evict.
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"))
    val big = docs.filter(col("source") =!= "src3")
    val tiny = docs.filter(col("source") === "src3")
      .orderBy(col("doc_id")).limit(5)
    val waved = big.withColumn("wave", lit(0))
      .unionByName(tiny.withColumn("wave", lit(1)))
    val expected = ext.TextAnalysis.corpusMixIncrOn(waved, "evict42", 2)
      .collect()
      .map(r => r.getLong(0) -> (0 until 2).map(k =>
        if (r.isNullAt(5 + k)) None else Some(r.getBoolean(5 + k))))
      .toMap
    val e0 = rowsOf(StreamMix.processBatch(spark, "sm_ev", big, 0L, "evict42"))
    e0.foreach { case (id, _, kept, _) =>
      assert(Some(kept) == expected(id)(0), s"wave0 doc $id") }
    val e1 = rowsOf(StreamMix.processBatch(spark, "sm_ev", tiny, 1L, "evict42"))
    // fold: latest verdict per doc across both batches == law at wave 1
    val state = (e0 ++ e1).groupBy(_._1).view.mapValues(
      _.maxBy(_._4)._3).toMap
    expected.foreach { case (id, perWave) =>
      assert(state.get(id) == perWave(1), s"wave1 doc $id") }
    // the collapse must actually have evicted old docs (flip rows exist)
    val evictions = e1.filter { case (id, _, kept, _) =>
      !kept && expected(id)(0) == Some(true) }
    assert(evictions.nonEmpty, "fixture produced no evictions — test inert")
    dropStore("sm_ev")
  }

  test("registry twin corpusMixStreamed equals corpusMixIncr's kept flags and resets idempotently") {
    def keptMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("kept0"), col("kept1"), col("kept2"), col("kept3"))
      .collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i =>
        if (r.isNullAt(i)) None else Some(r.getBoolean(i))))
      .toMap
    val streamed = keptMap(StreamMix.corpusMixStreamed(spark, sf001))
    val incr = ext.TextAnalysis.corpusMixIncr(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> (0 until 4).map(k =>
        if (r.isNullAt(5 + k)) None else Some(r.getBoolean(5 + k))))
      .toMap
    assert(streamed.keySet == incr.keySet)
    streamed.foreach { case (id, flags) =>
      assert(flags == incr(id), s"doc $id: streamed=$flags incr=${incr(id)}") }
    // second invocation resets the scratch store and reproduces itself
    assert(keptMap(StreamMix.corpusMixStreamed(spark, sf001)) == streamed)
    // the threshold-derived audit state equals the final-wave fold
    val audit = StreamMix.currentKept(spark, "cmx_replay")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(audit.size == streamed.size)
    audit.foreach { case (id, k) =>
      assert(Some(k) == streamed(id)(3), s"currentKept doc $id") }
  }

  test("caller-supplied weights mix arbitrary source names law-equal to the fixture twin") {
    dropStore("sm_wa"); dropStore("sm_wb")
    val waves = (0 until 2).map(w => wavedDocs.filter(col("wave") === w)
      .select(col("doc_id"), col("source")))
    // real-world naming the fixture law can't parse
    val renamed = waves.map(_.withColumn("source",
      concat(lit("corpus-"), col("source"))))
    // the default law refuses loudly, naming the srcN contract — never a
    // bare NumberFormatException
    val ex = intercept[IllegalArgumentException] {
      StreamMix.processBatch(spark, "sm_wa", renamed(0), 0L, "incr42")
    }
    assert(ex.getMessage.contains("src<N>"))
    dropStore("sm_wa") // refusal precedes any append; reset the empty store
    // a caller weight function reproduces the fixture twin exactly
    // (skeys depend only on doc_id, so the emissions must agree modulo
    // the name mapping)
    val wts: String => Long =
      s => StreamMix.FixtureWeights(s.stripPrefix("corpus-"))
    (0 to 1).foreach { w =>
      val a = rowsOf(StreamMix.processBatch(
          spark, "sm_wa", renamed(w), w.toLong, "incr42", wts))
        .map { case (id, s, k, b) => (id, s.stripPrefix("corpus-"), k, b) }
      val b = rowsOf(StreamMix.processBatch(
        spark, "sm_wb", waves(w), w.toLong, "incr42"))
      assert(a == b, s"wave $w diverged under renamed sources")
    }
    dropStore("sm_wa"); dropStore("sm_wb")
  }

  test("FixtureWeights reads the first 10 digits, exactly like the batch law") {
    import spark.implicits._
    // an 11-digit suffix: the batch laws parse substring(source, 4, 10)
    // — only the first 10 digits — so the default weight fn must too,
    // or the stream's quotas silently diverge from the oracled twins
    val names = Seq("src12345678901", "src99999999999999", "src7", "src40")
    val lawW = names.toDF("source")
      .select(col("source"),
        (pmod(substring(col("source"), 4, 10).cast("long"), lit(4L)) + lit(1L))
          .as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    names.foreach { n =>
      assert(StreamMix.FixtureWeights(n) == lawW(n),
        s"weight for '$n': fn ${StreamMix.FixtureWeights(n)} != law ${lawW(n)}")
    }
  }

  test("within-batch duplicate doc_ids collapse to the smallest-source winner") {
    import spark.implicits._
    // one doc_id redelivered under two sources in one batch: the
    // deterministic winner (smallest source) must hold for either
    // arrival order, or a crash-after-thr replay can recompute
    // different per-source counts and wedge the consistency guard
    val variants = Seq((42L, "src1"), (42L, "src2"))
    for ((order, i) <- Seq(variants, variants.reverse).zipWithIndex) {
      val pfx = s"sm_dup$i"
      dropStore(pfx)
      val batch = order.toDF("doc_id", "source").repartition(4)
      StreamMix.processBatch(spark, pfx, batch, 0L, "mix42")
      val docs = spark.table(s"${pfx}_docs")
        .select(col("doc_id"), col("source")).collect()
      assert(docs.length == 1 && docs.head.getString(1) == "src1",
        s"order $i kept ${docs.mkString(",")}, not the deterministic src1 winner")
      dropStore(pfx)
    }
  }

  test("a weight outside the divide-12 law refuses loudly; quoted seeds parse") {
    dropStore("sm_wv")
    val wave = wavedDocs.filter(col("wave") === 0)
      .select(col("doc_id"), col("source"))
    // 5 does not divide 12: integer 12/5 = 2 would silently distort the
    // mix ratio; 13+ would zero every quota (mass eviction); 0 divides
    // by zero — all three must refuse with the law named, never corrupt
    Seq(0L, 5L, 13L).foreach { bad =>
      val ex = intercept[IllegalArgumentException] {
        StreamMix.processBatch(spark, "sm_wv", wave, 0L, "incr42", _ => bad)
      }
      assert(ex.getMessage.contains("divisor of 12"), s"weight $bad")
      dropStore("sm_wv")
    }
    // a caller seed containing a quote must not break expr parsing (the
    // seed rides through lit(), not string interpolation)
    val out = StreamMix.processBatch(spark, "sm_wv", wave, 0L, "it's-2026")
    assert(out.count() > 0)
    dropStore("sm_wv")
  }

  test("compactStore preserves state and subsequent batches serve identically") {
    dropStore("sm_cp"); dropStore("sm_cq")
    val waves = (0 until 4).map(w => wavedDocs.filter(col("wave") === w)
      .select(col("doc_id"), col("source")))
    // two stores fed identically; one compacted mid-stream
    val e0 = (0 to 1).map(w => rowsOf(
      StreamMix.processBatch(spark, "sm_cp", waves(w), w.toLong, "incr42")))
    (0 to 1).foreach(w =>
      StreamMix.processBatch(spark, "sm_cq", waves(w), w.toLong, "incr42").count(): Unit)
    val filesBefore = StreamMix.compactStore(spark, "sm_cp", 8L * 1024 * 1024)
    filesBefore.foreach { case (t, (before, after)) =>
      assert(after <= before, s"$t grew under compaction") }
    (2 to 3).foreach { w =>
      val a = rowsOf(StreamMix.processBatch(spark, "sm_cp", waves(w), w.toLong, "incr42"))
      val b = rowsOf(StreamMix.processBatch(spark, "sm_cq", waves(w), w.toLong, "incr42"))
      assert(a == b, s"post-compaction batch $w diverged")
    }
    // thr retention: trim history to the trailing TWO snapshots (the
    // minimum — a crash-after-thr replay of the newest batch recovers
    // from its predecessor); the next batch recovers from the tail and
    // the audit state still obeys the full-rank law over the whole
    // accumulated corpus
    intercept[IllegalArgumentException] {
      StreamMix.compactStore(spark, "sm_cp", retainThrBatches = 1)
    }
    StreamMix.compactStore(spark, "sm_cp", retainThrBatches = 2)
    val thrBatches = spark.table("sm_cp_thr")
      .select(col("batch_id")).distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(thrBatches == Seq(2L, 3L), s"retention kept $thrBatches")
    val extra = wavedDocs.filter(col("wave") === 0)
      .select((col("doc_id") + lit(500000L)).as("doc_id"), col("source"))
    StreamMix.processBatch(spark, "sm_cp", extra, 4L, "incr42").count(): Unit
    val audit = StreamMix.currentKept(spark, "sm_cp")
      .select(col("doc_id"), col("kept"))
    val law = ext.TextAnalysis.corpusMixOn(
        spark.table("sm_cp_docs").select(col("doc_id"), col("source")), "incr42")
      .select(col("doc_id"), col("kept").as("law_kept"))
    assert(audit.join(law, Seq("doc_id"))
      .filter(col("kept") =!= col("law_kept")).count() == 0L,
      "post-retention batch diverged from the corpusMix law")
    dropStore("sm_cp"); dropStore("sm_cq")
    e0.size: Unit
  }
}
