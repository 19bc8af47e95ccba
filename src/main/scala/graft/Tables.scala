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
  /** `events.ts` has drifted across testdata generations: originally
    * parquet TIMESTAMP(NANOS) (which Spark reads as a nanosecond long
    * under `spark.sql.legacy.parquet.nanosAsLong=true`), later
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark reads as
    * TIMESTAMP_NTZ). A long-lived lake hits exactly this (see
    * SchemaDrift), so the loader adapts on the footer's declared type
    * rather than pinning one generation:
    *
    *   - long nanos → truncate to µs with INTEGER division (`ts div
    *     1000` stays in long arithmetic; a double `/1000` would lose
    *     precision above 2^53 ns and could shift a timestamp by 1 µs);
    *   - TIMESTAMP_NTZ → reinterpret the wall-clock as UTC (sessions
    *     run with spark.sql.session.timeZone=UTC, so the cast is a
    *     pure type change, not an instant shift).
    *
    * Either way callers see one stable type: TimestampType in µs, UTC.
    * DuckDB applies the same ns→µs truncation / NTZ-as-UTC reading, so
    * oracle comparisons line up exactly. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = eventsRaw(spark, sfDir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** `events` with `ts` still the NATIVE footer type of the scan (long
    * nanos or TIMESTAMP_NTZ, generation-dependent — see events above).
    * Time-range predicates meant to reach the scan (PushedFilters +
    * row-group pruning) must be applied HERE, against the raw column —
    * applied after the µs conversion they sit on a derived expression
    * and cannot push down. See ReferenceQueries.q1.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` at SESSION
    * BUILD for the nanos generation (all mains and SparkSpec set it; a
    * reader must not mutate global session conf as a side effect, and
    * the conf only takes effect reliably when set before the first
    * parquet read anyway). The conf is inert for µs footers. */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
