package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** JSON-lines source variant — the third scan format beside parquet/CSV
  * and ORC (reference S1 generalized; NDJSON is what the reference's
  * NGSI-LD notifications are made of, so the batch engine should read it
  * too). The round-trip is lossless under an EXPLICIT schema (dates
  * re-parse from ISO strings, doubles print at full precision), which the
  * spec asserts — but unlike parquet/ORC, a JSON scan has no column
  * pruning or predicate pushdown: every byte of every row is parsed
  * before any filter runs. That asymmetry is the design point at 100 TB:
  * JSON is an INGEST format — land it, convert to columnar once
  * (`CsvBatchIngest` posture), and answer queries from the columnar copy.
  * The operator keeps the query-from-JSON path anyway because one-shot
  * exploratory scans over landed JSON are a real workload, and the
  * explicit-schema read avoids the double-pass schema inference a naive
  * `spark.read.json` pays.
  */
object JsonSource {
  // per-JVM scratch root with exit sweep — the overwrite-vs-read
  // concurrency contract lives in ONE place ([[Scratch]])
  private def jsonPath(sfDir: String): String =
    s"${Scratch.root("graft_json").getPath}/" +
      s"${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}/orders"

  /** Idempotent NDJSON materialization of `orders` + explicit-schema
    * read-back (overwrite keeps it deterministic and self-contained). */
  def ordersJson(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.orders(spark, sfDir)
    val path = jsonPath(sfDir)
    src.write.mode("overwrite").json(path)
    spark.read.schema(src.schema).json(path)
  }

  /** Filter + aggregate answered from the JSON scan. Same query shape as
    * [[OrcSource.orcScan]] so the two formats' plans diff cleanly: the
    * ORC plan shows PushedFilters, the JSON plan shows the filter ABOVE a
    * full parse — the documented reason to convert early. */
  def jsonScan(spark: SparkSession, sfDir: String): DataFrame =
    ordersJson(spark, sfDir)
      .filter(col("o_totalprice") > 150000)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")) + lit(1e-9), 2).as("total_price"))

  /** Oracle over the original parquet — valid because the JSON round-trip
    * is lossless under the explicit schema. */
  val jsonScanSql: String =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |       round(sum(o_totalprice) + 1e-9, 2) AS total_price
      |FROM orders
      |WHERE o_totalprice > 150000
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin
}
