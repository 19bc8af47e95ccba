package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch CSV ingestion with the reference loader's semantics
  * (`/root/reference/insert.py:64-97`), re-expressed as ONE distributed
  * job instead of a per-row RPC loop (SURVEY.md §3.1):
  *
  *   - headerless tab-separated `{Room}_{Sensor}.csv` files, schema
  *     imposed at read time (never inferred) — `insert.py:74`;
  *   - malformed lines (≠2 fields / non-numeric) and null rows are
  *     dropped — `insert.py:77`, `real_time_data_simulator.py:137-139`;
  *   - (room, sensor) identity comes from the FILENAME, extracted with
  *     `input_file_name()` — `insert.py:35-47`;
  *   - optional seeded Bernoulli sample (reference `LOAD_PERCENTAGE`,
  *     `insert.py:79-81`);
  *   - output is the canonical relational schema of the reference's Hive
  *     layer (`hive.py:31-44`): entityid, temperature, humidity (INT),
  *     brightness, ts — one row per reading with only its own sensor
  *     column populated (the reference's sparse HBase puts), written
  *     partitioned by room so per-room queries prune instead of naming
  *     six physical tables.
  *
  * Unlike the reference (which overwrites event time with a synthetic
  * wall-clock stamp, `insert.py:28-33`), the engine PRESERVES the CSV
  * epoch as event time `ts` — SURVEY.md ST6/§7.4 decision.
  */
object CsvBatchIngest {

  /** (epoch_seconds, value) — imposed, never inferred (files are headerless). */
  val readingSchema: StructType = StructType(Seq(
    StructField("epoch", LongType, nullable = true),
    StructField("value", DoubleType, nullable = true)))

  /** Read every sensor CSV under `dir` into the normalized long form
    * (room, sensor, ts, value), dropping malformed/null rows. */
  def readRaw(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("mode", "PERMISSIVE")
      .schema(readingSchema)
      .csv(s"$dir/*.csv")
      .withColumn("file", input_file_name())
      .withColumn("room", regexp_extract(col("file"), "([A-Za-z0-9]+)_([A-Za-z]+)\\.csv$", 1))
      .withColumn("sensor", lower(regexp_extract(col("file"), "([A-Za-z0-9]+)_([A-Za-z]+)\\.csv$", 2)))
      .na.drop(Seq("epoch", "value")) // malformed lines parse to null under PERMISSIVE
      .select(col("room"), col("sensor"),
        timestamp_seconds(col("epoch")).as("ts"), col("value"))

  /** Normalized long form → the reference's canonical wide schema with
    * sparse sensor columns (each reading fills exactly one). */
  def toCanonical(raw: DataFrame): DataFrame =
    raw.select(
      col("room").as("entityid"),
      when(col("sensor") === "temperature", col("value")).as("temperature"),
      when(col("sensor") === "humidity", col("value")).cast(IntegerType).as("humidity"),
      when(col("sensor") === "brightness", col("value")).as("brightness"),
      col("ts"),
      col("room"))

  /** Full pipeline: read → (optional seeded sample) → canonicalize →
    * write partitioned by room. One shuffle-free job: the sample and
    * projection are map-side; partitionBy splits writer output by the
    * low-cardinality room column. */
  def ingest(spark: SparkSession, inDir: String, outPath: String,
             fraction: Double = 1.0, seed: Long = 42L): Unit = {
    val raw = readRaw(spark, inDir)
    val sampled = if (fraction < 1.0) raw.sample(withReplacement = false, fraction, seed) else raw
    toCanonical(sampled)
      .write.mode("overwrite")
      .partitionBy("room")
      .parquet(outPath)
  }
}
