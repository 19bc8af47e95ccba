package graft

import graft.streaming.StreamMix
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamMixSpec extends SparkSpec {

  private def dropStore(prefix: String): Unit =
    Seq("docs", "ledger").foreach(t =>
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

  test("a replayed batch re-emits identical changes and leaves both tables unchanged") {
    dropStore("sm_rp")
    val w0 = wavedDocs.filter(col("wave") === 0)
      .select(col("doc_id"), col("source"))
    val w1 = wavedDocs.filter(col("wave") === 1)
      .select(col("doc_id"), col("source"))
    val e0 = rowsOf(StreamMix.processBatch(spark, "sm_rp", w0, 0L, "incr42"))
    val e1 = rowsOf(StreamMix.processBatch(spark, "sm_rp", w1, 1L, "incr42"))
    val counts = Seq("docs", "ledger")
      .map(t => t -> spark.table(s"sm_rp_$t").count()).toMap
    // replay both batches: identical emissions, no table growth
    assert(rowsOf(StreamMix.processBatch(spark, "sm_rp", w0, 0L, "incr42")) == e0)
    assert(rowsOf(StreamMix.processBatch(spark, "sm_rp", w1, 1L, "incr42")) == e1)
    Seq("docs", "ledger").foreach(t =>
      assert(spark.table(s"sm_rp_$t").count() == counts(t),
        s"replay grew sm_rp_$t"))
    dropStore("sm_rp")
  }

  test("crash residue between the docs append and the ledger append converges") {
    dropStore("sm_crA"); dropStore("sm_crB")
    val w0 = wavedDocs.filter(col("wave") === 0)
      .select(col("doc_id"), col("source"))
    val w1 = wavedDocs.filter(col("wave") === 1)
      .select(col("doc_id"), col("source"))
    // clean run on A
    StreamMix.processBatch(spark, "sm_crA", w0, 0L, "incr42").count(): Unit
    val cleanDelta = rowsOf(StreamMix.processBatch(spark, "sm_crA", w1, 1L, "incr42"))
    // B: batch 0, then simulate a crash mid-batch-1 — docs landed,
    // ledger did not, nothing emitted
    StreamMix.ensureStore(spark, "sm_crB")
    StreamMix.processBatch(spark, "sm_crB", w0, 0L, "incr42").count(): Unit
    w1.write.insertInto("sm_crB_docs")
    // the replay must produce the exact delta the clean run produced
    val replayDelta = rowsOf(StreamMix.processBatch(spark, "sm_crB", w1, 1L, "incr42"))
    assert(replayDelta == cleanDelta,
      s"crash replay diverged: only-replay=${(replayDelta -- cleanDelta).take(3)} " +
        s"only-clean=${(cleanDelta -- replayDelta).take(3)}")
    // and the docs table holds no duplicates
    assert(spark.table("sm_crB_docs").groupBy(col("doc_id")).count()
      .filter(col("count") > 1).count() == 0, "crash replay duplicated docs")
    dropStore("sm_crA"); dropStore("sm_crB")
  }
}
