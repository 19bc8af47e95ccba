package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Parquet carries the schema, so
  * no `inferSchema` is needed; scans are columnar and Catalyst pushes
  * filters/projections into the reader (the reference's Hive-over-HBase
  * layer could do neither — see SURVEY.md §4).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * natively. Read it as a nanosecond long (legacy conf) and truncate to
    * microseconds with integer division — `ts div 1000` stays in long
    * arithmetic; a double-based `/1000` would lose precision above 2^53 ns
    * and could shift timestamps by a microsecond. DuckDB truncates ns→µs
    * the same way, so oracle comparisons line up exactly.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsRaw(spark, sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** `events` with `ts` still the raw nanosecond long from parquet.
    * Time-range predicates meant to reach the scan (PushedFilters +
    * row-group pruning) must be applied HERE, against the raw column —
    * after the `timestamp_micros(ts div 1000)` conversion they sit on a
    * derived column and cannot push down. See ReferenceQueries.q1.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` at SESSION BUILD
    * (all mains and SparkSpec set it): a reader must not mutate global
    * session conf as a side effect, and the conf only takes effect
    * reliably when set before the first parquet read anyway. */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
