package graft

import graft.ext.TextAnalysis
import graft.streaming.{StreamDrift, StreamDsir}
import org.apache.spark.sql.functions._

/** Corpus-matched DsirBuckets calibration (round-20, closing SCALING.md
  * §8b's hand-tuning gap) — the two-scale contract from the verdict:
  * the rule picks the gate-scale 512 on the gate corpora and the
  * probe-validated wide B on a vocabulary-grown replica, plus the loud
  * B-consistency guards that keep a frozen store from being scored or
  * monitored under a different B than it was fit at. */
class DsirCalibrationSpec extends SparkSpec {

  private def docsAt(dir: String) = Tables.documents(spark, dir)
    .select(col("doc_id"), col("source"), col("text"))

  /** The ScaleUpBench replica fixture's vocabulary-growth law, mirrored
    * at spec scale: K copies, every token prefixed `c<i>_` so the K
    * vocabularies are disjoint (ScaleUpBench.materializeReplica). */
  private def prefixedReplica(k: Int) = {
    val base = docsAt(sf001)
    val dOff = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    (0 until k).map { i =>
      base.withColumn("doc_id", col("doc_id") + lit(i.toLong * dOff))
        .withColumn("text", array_join(
          transform(split(col("text"), " "), t => concat(lit(s"c${i}_"), t)),
          " "))
    }.reduce(_ unionByName _)
  }

  test("calibration picks the gate-scale 512 at both gate SFs, deterministically") {
    assert(TextAnalysis.dsirCalibratedBuckets(docsAt(sf001)) == 512,
      "sf0.001 (~960 distinct grams) must calibrate to the 512 floor-adjacent pick")
    assert(TextAnalysis.dsirCalibratedBuckets(docsAt(sf01)) == 512,
      "sf0.01 (~960 distinct grams) must calibrate to 512")
    assert(TextAnalysis.dsirCalibratedBuckets(docsAt(sf001)) == 512,
      "HLL++ pick must be stable across runs")
  }

  test("calibration scales with vocabulary: a 16x disjoint-prefix replica lands in the paper range") {
    // ~960 x 16 ≈ 15.3k distinct grams → pow2 floor 8192: the remedy B
    // the registry's d_dsir_weights_wide oracles, reached by RULE here
    assert(TextAnalysis.dsirCalibratedBuckets(prefixedReplica(16)) == 8192)
  }

  test("calibration clamps: floor 512 on a near-empty corpus, cap 65536 on a huge vocabulary") {
    import spark.implicits._
    val tiny = Seq((1L, "src0", "a b")).toDF("doc_id", "source", "text")
    assert(TextAnalysis.dsirCalibratedBuckets(tiny) == 512)
    // 20k docs x 10 globally-unique tokens → ~200k unigrams + ~180k
    // bigrams distinct → pow2 floor 262144 → capped at 65536 (the
    // largest broadcast model the scale probe measured)
    val huge = spark.range(20000).select(
      col("id").as("doc_id"), lit("src5").as("source"),
      array_join(transform(sequence(lit(0), lit(9)),
        i => concat(lit("t"), (col("id") * 10 + i).cast("string"))), " ")
        .as("text"))
    assert(TextAnalysis.dsirCalibratedBuckets(huge) == 65536)
  }

  test("dsirScore refuses a frozen model fit at a different B") {
    val docs = docsAt(sf001)
    val model512 = TextAnalysis.dsirModel(docs) // default B = 512 rows
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.dsirScore(docs, model512, "cal42", buckets = 1024).count()
    }
    assert(e.getMessage.contains("512") && e.getMessage.contains("1024"),
      s"mismatch refusal must name both Bs: ${e.getMessage}")
  }

  test("StreamDsir scores a store at its OWN fit-time B and refuses a mismatched one") {
    val pfx = "cal_sds"
    Seq("model", "scores", "thr", "ledger").foreach(t =>
      graft.sources.TableOps.dropWithLocation(spark, s"${pfx}_$t"))
    val docs = docsAt(sf001)
    StreamDsir.modelWrite(spark, pfx, docs, buckets = 1024)
    // matched B works end-to-end and lands the selection law
    val out = StreamDsir.processBatch(spark, pfx, docs, 0L, "cal42",
      buckets = 1024)
    assert(out.filter(col("kept")).count() == TextAnalysis.DsirK.toLong)
    // a JVM that reverts to the default B must fail loudly, not score
    val e = intercept[IllegalArgumentException] {
      StreamDsir.processBatch(spark, pfx,
        docs.withColumn("doc_id", col("doc_id") + lit(1000000L)),
        1L, "cal42")
    }
    assert(e.getMessage.contains("1024"),
      s"refusal must carry the store's fit-time B: ${e.getMessage}")
    Seq("model", "scores", "thr", "ledger").foreach(t =>
      graft.sources.TableOps.dropWithLocation(spark, s"${pfx}_$t"))
  }

  test("StreamDrift refuses a frozen model whose B differs from this JVM's DsirBuckets") {
    val pfx = "cal_drf"
    Seq("model", "counts", "applied").foreach(t =>
      graft.sources.TableOps.dropWithLocation(spark, s"${pfx}_$t"))
    val docs = docsAt(sf001)
    StreamDrift.ensureStore(spark, pfx)
    StreamDrift.modelWrite(spark, pfx, docs)
    StreamDrift.processBatch(spark, pfx, docs, 0L).count(): Unit
    // simulate the cross-JVM env flip the advice names: the persisted
    // model's dense spine no longer matches this JVM's DsirBuckets
    val truncated = spark.table(s"${pfx}_model").limit(100)
      .localCheckpoint(true)
    graft.sources.TableOps.resetTable(spark, s"${pfx}_model", truncated)
    val e = intercept[IllegalArgumentException] {
      StreamDrift.currentDrift(spark, pfx).count()
    }
    assert(e.getMessage.contains("100") &&
      e.getMessage.contains(TextAnalysis.DsirBuckets.toString),
      s"refusal must name both Bs: ${e.getMessage}")
    Seq("model", "counts", "applied").foreach(t =>
      graft.sources.TableOps.dropWithLocation(spark, s"${pfx}_$t"))
  }
}
