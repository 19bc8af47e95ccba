package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Schema evolution across parquet generations — the table-lifecycle
  * primitive every long-lived lake hits: a column is ADDED partway
  * through a table's life, so the directory holds a mix of old (narrow)
  * and new (wide) footers, and a reader must present ONE schema with
  * explicit NULLs for the pre-drift files.
  *
  * Spark-first shape: `spark.read.option("mergeSchema", true)` does the
  * footer reconciliation in a distributed job at planning time (one task
  * per footer — the reason mergeSchema is opt-in and a 100 TB deployment
  * pins the merged schema in a metastore after ONE reconciliation pass
  * rather than re-merging per query; both forms are exercised here and
  * spec-asserted equal). Column pruning and predicate pushdown still
  * reach both file generations — a filter on a pre-drift column prunes
  * row groups in old and new files alike.
  *
  * The two generations derive deterministically from `orders` (old
  * footers: orderkeys with `o_orderkey % 3 != 0`, original columns; new
  * footers: the `% 3 == 0` rows plus an `o_channel` column), so the
  * DuckDB oracle can rebuild the exact merged result from the original
  * parquet with a CASE — no drifted fixture needed driver-side.
  */
object SchemaDrift {
  // per-JVM scratch root ([[Scratch]]): on a SHARED tmp path two JVMs
  // could interleave the two-generation build (overwrite, overwrite,
  // append, append = every wide row doubled) and the completion marker
  // — whose content is the SOURCE fingerprint, not a content hash —
  // would then validate the corrupt fixture forever
  private[graft] def driftPath(sfDir: String): String =
    s"${Scratch.root("graft_drift").getPath}/" +
      s"${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}/orders"

  /** Idempotent materialization of the mixed-footer directory: generation
    * 1 overwrites (narrow schema), generation 2 appends (wide schema).
    * An underscore-prefixed marker (invisible to the parquet reader)
    * stamps a COMPLETED two-generation build; when present AND its
    * content matches the SOURCE table's fingerprint (size + mtime of
    * `orders.parquet` — the testdata is regenerated in place between
    * rounds, so a path-keyed marker alone would pin a stale fixture and
    * make the oracle, rebuilt from the FRESH orders, fail confusingly)
    * the rewrite is skipped, so repeated invocations — including bench
    * passes — time the mergeSchema read, not the fixture build. A
    * half-built directory (crash between the two writes) has no marker
    * and rebuilds; a source regeneration changes the fingerprint and
    * rebuilds. */
  def ordersDrifted(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val path = driftPath(sfDir)
    val marker = java.nio.file.Paths.get(path, "_GRAFT_DRIFT_COMPLETE")
    val src = new java.io.File(sfDir, "orders.parquet")
    val fingerprint = s"${src.length}:${src.lastModified}"
    val current = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == fingerprint
    if (!current) {
      orders.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(path)
      orders.filter(pmod(col("o_orderkey"), lit(3)) === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          concat(lit("ch_"), pmod(col("o_orderkey"), lit(4))).as("o_channel"))
        .write.mode("append").parquet(path)
      java.nio.file.Files.write(marker, fingerprint.getBytes("UTF-8")): Unit
    }
    spark.read.option("mergeSchema", "true").parquet(path)
  }

  /** The registered query: the merged view of the drifted table, with the
    * post-drift column NULL exactly where the footer predates it. */
  def schemaDrift(spark: SparkSession, sfDir: String): DataFrame =
    ordersDrifted(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_channel"))

  /** Oracle rebuilds the merged result from the ORIGINAL parquet: the
    * drift membership (`% 3`) and the derived channel are deterministic,
    * so the CASE reproduces the pre-drift NULLs bit-for-bit. */
  val schemaDriftSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |       CASE WHEN o_orderkey % 3 = 0
      |            THEN 'ch_' || CAST(o_orderkey % 4 AS VARCHAR)
      |            ELSE NULL END AS o_channel
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin
}
