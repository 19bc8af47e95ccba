package graft

import org.apache.spark.sql.functions._
import graft.streaming.{StreamDedup, StreamDsir, StreamMix, StreamMixTokens}

/** Cross-JVM warehouse-residue proofing (the r17 suite flake: a stale
  * `sd_cpa_bands` directory left by the snapshot-time JVM made the
  * next run's `CREATE TABLE IF NOT EXISTS` silently adopt the old data
  * files). Every streaming `ensureStore` now routes through
  * `TableOps.ensureFreshLocation`: an UNCATALOGED table whose managed
  * location survives on disk gets the location deleted before the
  * create. These tests simulate the previous-JVM shape — data on disk,
  * no catalog entry, schema-compatible so adoption would be silent —
  * and assert the store comes up EMPTY. */
class ResidueSpec extends SparkSpec {

  private def warehouseFile(table: String): java.io.File =
    new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      table.toLowerCase)

  /** Simulate a dead JVM's residue: parquet rows at the managed
    * location, catalog entry gone. */
  private def pollute(table: String, df: org.apache.spark.sql.DataFrame): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite").parquet(warehouseFile(table).getPath)
    assert(warehouseFile(table).exists())
  }

  test("StreamDedup.ensureStore drops uncataloged residue instead of adopting it") {
    import spark.implicits._
    val prefix = "sd_residue"
    pollute(s"${prefix}_bands",
      Seq((99L, 0, "stale")).toDF("doc_id", "band_idx", "band"))
    pollute(s"${prefix}_toks",
      Seq((99L, Seq("stale"))).toDF("doc_id", "toks"))
    pollute(s"${prefix}_decisions",
      Seq((99L, "srcX", true, -1L, 0L))
        .toDF("doc_id", "source", "kept", "matched_old", "batch_id"))
    StreamDedup.ensureStore(spark, prefix)
    Seq("bands", "toks", "decisions").foreach { t =>
      assert(spark.table(s"${prefix}_$t").count() === 0L,
        s"${prefix}_$t adopted stale residue rows")
    }
  }

  test("Mix/MixTokens/Dsir ensureStore are residue-proof on their thr tables") {
    import spark.implicits._
    val cases = Seq[(String, String => Unit)](
      "smx_residue" -> (p => StreamMix.ensureStore(spark, p)),
      "smt_residue" -> (p => StreamMixTokens.ensureStore(spark, p)),
      "sds_residue" -> (p => StreamDsir.ensureStore(spark, p)))
    cases.foreach { case (prefix, ensure) =>
      // thr is the table every batch reads its state from — one stale
      // row there mis-thresholds the whole stream, so probe that one
      // with an arbitrary (schema-agnostic) residue frame
      pollute(s"${prefix}_thr", Seq((1L, 2L)).toDF("a", "b"))
      ensure(prefix)
      assert(spark.table(s"${prefix}_thr").count() === 0L,
        s"${prefix}_thr adopted stale residue rows")
    }
  }

  test("cataloged tables keep their data through ensureFreshLocation") {
    import spark.implicits._
    val t = "residue_keep"
    graft.sources.TableOps.resetTable(spark, t,
      Seq((1L, "live")).toDF("id", "v"))
    graft.sources.TableOps.ensureFreshLocation(spark, t)
    assert(spark.table(t).count() === 1L)
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
