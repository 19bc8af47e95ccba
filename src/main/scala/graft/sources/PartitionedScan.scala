package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dynamic partition pruning (DPP) end-to-end — the single biggest scan
  * lever at 100 TB: a fact table laid out as one directory per day (the
  * canonical lake layout; SURVEY.md §1.3 folds the reference's per-room
  * physical tables into exactly this shape) joined against a FILTERED
  * dimension must read only the partitions the dimension's surviving
  * keys name — pruning decided at RUNTIME from the dim side's values,
  * not statically, because the dim filter (`is weekday`) is not a
  * predicate on the fact table at all.
  *
  * Spark-first: no custom machinery — `partitionBy("day")` at write
  * time plus a plain equi-join is everything Catalyst needs to insert a
  * `dynamicpruningexpression(day IN broadcast-subquery)` into the fact
  * scan's PartitionFilters (spec-asserted). At 1000 executors this is
  * the difference between scanning 30 days and scanning the ~22 the dim
  * admits — and at a year of history with a one-week dim filter, a 50×
  * scan cut no static optimizer could find.
  */
object PartitionedScan {

  /** Idempotent day-partitioned materialization of `events` (one
    * directory per calendar day, the steady-state ingest layout). A
    * table property records the source dir, so repeated invocations —
    * including bench passes — reuse the existing layout instead of
    * re-running the full parquet rewrite; only a source-dir change (a
    * different SF) triggers the rebuild. */
  def eventsByDay(spark: SparkSession, sfDir: String): DataFrame = {
    val canonical = new java.io.File(sfDir).getCanonicalPath
    val current = spark.catalog.tableExists("events_by_day") &&
      spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("events_by_day"))
        .properties.get("graft.source.dir").contains(canonical)
    if (!current) {
      TableOps.resetTable(spark, "events_by_day",
        Tables.events(spark, sfDir)
          .withColumn("day", to_date(col("ts"))),
        partitionCols = Seq("day"))
      spark.sql("ALTER TABLE events_by_day SET TBLPROPERTIES " +
        s"('graft.source.dir' = '$canonical')")
    }
    spark.table("events_by_day")
  }

  /** The registered query: per-day activity restricted to WEEKDAYS,
    * where "weekday" lives only in the dimension — epoch-day modular
    * arithmetic (1970-01-01 + 3 ≡ Monday 0) keeps the flag engine-
    * portable. The dim derives from the raw parquet scan, the fact from
    * the day-partitioned table, so the join's pruning must happen
    * dynamically. */
  def partitionPruned(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = eventsByDay(spark, sfDir)
    val weekdays = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day")).distinct()
      .filter(expr("pmod(datediff(day, DATE '1970-01-01') + 3, 7) <= 4"))
    fact.join(broadcast(weekdays), Seq("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        graft.ops.Num.r4(avg(col("value"))).as("avg_value"))
  }

  /** Oracle rebuilds the same weekday restriction from the original
    * parquet (the partitioned table is a pure re-layout of it). */
  val partitionPrunedSql: String =
    """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
      |wk AS (SELECT day FROM days
      |       WHERE ((day - DATE '1970-01-01') + 3) % 7 <= 4)
      |SELECT e.day, count(*) AS n_events,
      |       round(avg(e.value) + 1e-9, 4) AS avg_value
      |FROM (SELECT CAST(ts AS DATE) AS day, value FROM events) e
      |JOIN wk USING (day)
      |GROUP BY e.day
      |ORDER BY e.day""".stripMargin
}
