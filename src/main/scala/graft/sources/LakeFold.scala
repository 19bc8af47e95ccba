package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Day-fold maintenance for the streamed lake — the missing composition
  * between the streaming day sink (`StreamIngest.startDaySink`: a
  * FileStreamSink whose `_spark_metadata` log pins exact file names, so
  * compaction must NEVER rewrite files under it) and the catalog lake
  * table (`PartitionedScan.eventsByDay`-shaped: plain day-partitioned
  * directories, compactable with `TableOps.compactPartition`).
  *
  * Steady state: the stream appends small per-batch files into
  * `day=<event-date>` directories; once a day is CLOSED (strictly older
  * than the watermark — no in-flight batch can still append to it),
  * [[foldClosedDays]] copies its rows into the catalog lake and compacts
  * the folded partition there. The sink's metadata log is never
  * rewritten; a folded day's sink directory is cold data that
  * [[retireFoldedSinkDays]] drops wholesale — every read in this module
  * stays correct afterwards because listing comes from the log, the
  * sink read pins the lake's schema (no inference footer-open), and
  * partition pruning drops retired days before any file opens.
  *
  * Idempotence is by ANTI-JOIN, not by marker: a fold appends only the
  * sink rows whose key is absent from the lake's same-day partition, so
  * a re-run after ANY crash — including a death mid-append that left a
  * subset of task files committed — appends exactly the missing rows and
  * converges. The per-day completion property
  * (`graft.folded.days` on the lake table) is an optimization that lets
  * later runs and [[combinedRead]] skip settled days, never a
  * correctness input.
  *
  * 100 TB posture: one fold touches one day of data (the anti-join keys
  * shuffle one day's rows against one lake partition — static partition
  * pruning on both sides), compaction rewrites one partition directory,
  * and the days loop is driver-side over a bounded list of calendar
  * days, not data.
  */
object LakeFold {

  private[graft] def foldedDays(spark: SparkSession, lakeTable: String): Seq[String] =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(lakeTable))
      .properties.get("graft.folded.days")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  private def markFolded(spark: SparkSession, lakeTable: String, day: String): Unit = {
    val all = (foldedDays(spark, lakeTable) :+ day).distinct.sorted
    spark.sql(s"ALTER TABLE $lakeTable SET TBLPROPERTIES " +
      s"('graft.folded.days' = '${all.mkString(",")}')")
  }

  /** The sink's committed rows — `spark.read.parquet` on a FileStreamSink
    * directory resolves files through `_spark_metadata`, so half-written
    * or uncommitted-batch files are invisible by construction. The read
    * takes the LAKE's schema explicitly: schema inference opens some
    * data file's footer, and after [[retireFoldedSinkDays]] the first
    * log entry may point at a deleted file — with the schema pinned, no
    * file is touched until execution, by which point partition pruning
    * has dropped every retired day. */
  private def sinkRows(spark: SparkSession, sinkPath: String,
      lakeTable: String): DataFrame =
    spark.read.schema(spark.table(lakeTable).schema).parquet(sinkPath)

  /** The sink's day partitions, from DIRECTORY NAMES, not a data scan: a
    * full-sink `distinct(day)` query would open every committed file,
    * which fails once retired days' files are gone — the directory
    * listing is metadata-only and equally authoritative (a `day=` dir
    * exists iff some batch wrote there; a dir holding only
    * never-committed files yields zero committed rows downstream, which
    * folds as an empty day — harmless either way). */
  private[graft] def sinkDays(spark: SparkSession, sinkPath: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(sinkPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toIndexedSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("day="))
      .map(_.stripPrefix("day="))
      .sorted
  }

  /** Fold ONE day from the sink into the lake: append the day's sink
    * rows that are not already in the lake's same-day partition (keyed
    * on `keyCols`, defaulting to every lake column — full-row identity).
    * Exposed package-side so the crash spec can drive a partial fold.
    * Returns the number of rows appended. */
  private[graft] def foldDay(spark: SparkSession, sinkPath: String,
      lakeTable: String, day: String,
      keyCols: Seq[String] = Nil): Long = {
    val lake = spark.table(lakeTable)
    val cols = lake.columns.toIndexedSeq
    val keys = if (keyCols.nonEmpty) keyCols else cols
    val dayRows = sinkRows(spark, sinkPath, lakeTable)
      .filter(col("day").cast("string") === day)
      .select(cols.map(col): _*) // table column order: insertInto is positional
    val existing = lake.filter(col("day").cast("string") === day)
    val missing = dayRows.join(existing.select(keys.map(col): _*), keys, "left_anti")
    val n = missing.count()
    if (n > 0) missing.write.insertInto(lakeTable)
    n
  }

  /** Fold every sink day STRICTLY older than `watermarkDay` into
    * `lakeTable`, oldest first; compact each folded partition; record
    * completion. Re-runnable at any point: fully-folded days are skipped
    * via the completion property, partially-folded days (crash residue)
    * finish via the anti-join, and compaction's own stage+swap recovery
    * handles a death mid-rewrite (`TableOps.stagePartitionCompaction`).
    * Returns the days folded by THIS run (settled days don't reappear). */
  def foldClosedDays(spark: SparkSession, sinkPath: String, lakeTable: String,
      watermarkDay: String, keyCols: Seq[String] = Nil,
      targetFileBytes: Long = 128L * 1024 * 1024): Seq[String] = {
    val settled = foldedDays(spark, lakeTable).toSet
    val closed = sinkDays(spark, sinkPath)
      .filter(_ < watermarkDay)
      .filterNot(settled)
    closed.foreach { day =>
      foldDay(spark, sinkPath, lakeTable, day, keyCols): Unit
      TableOps.compactPartition(spark, lakeTable, "day", day, targetFileBytes): Unit
      markFolded(spark, lakeTable, day)
    }
    closed
  }

  /** The query-facing combined lake: catalog table ∪ the sink's
    * not-yet-settled days. Exact under EVERY fold state — the sink side
    * anti-joins away rows a partial fold already landed in the lake, so
    * a crash between append and completion-marking cannot surface
    * duplicates. Cost note: the anti-join's lake side is restricted to
    * unsettled days (static partition pruning), which at steady state is
    * the open tail — the bulk of the lake joins nothing. */
  def combinedRead(spark: SparkSession, sinkPath: String, lakeTable: String,
      keyCols: Seq[String] = Nil): DataFrame = {
    val lake = spark.table(lakeTable)
    val cols = lake.columns.toIndexedSeq
    val keys = if (keyCols.nonEmpty) keyCols else cols
    val settled = foldedDays(spark, lakeTable)
    val open = {
      val s = sinkRows(spark, sinkPath, lakeTable).select(cols.map(col): _*)
      if (settled.isEmpty) s
      else s.filter(!col("day").cast("string").isin(settled: _*))
    }
    val lakeUnsettled =
      if (settled.isEmpty) lake
      else lake.filter(!col("day").cast("string").isin(settled: _*))
    lake.unionByName(
      open.join(lakeUnsettled.select(keys.map(col): _*), keys, "left_anti"))
  }

  /** Retire the sink directories of SETTLED days — the retention job the
    * fold's lifecycle story promises. A folded day's sink files are cold
    * duplicates of lake data; deleting the `day=` directory reclaims the
    * space. The `_spark_metadata` log keeps naming the deleted files,
    * which is safe by construction everywhere in this module: file
    * LISTING comes from the log (no filesystem access to data files),
    * [[sinkRows]] pins the lake schema so inference opens no footer, and
    * every downstream read is partition-pruned to unsettled days before
    * any file opens. What retirement does FORECLOSE is un-pruned direct
    * reads of the sink path by outside code — after retiring, the sink
    * is no longer a standalone queryable table; [[combinedRead]] is the
    * query surface (which is true of any sink whose settled days have
    * moved to the lake). Only days already marked folded on the lake
    * table are eligible; returns the days whose directories were
    * actually deleted this run (a re-run is a no-op). */
  def retireFoldedSinkDays(spark: SparkSession, sinkPath: String,
      lakeTable: String): Seq[String] = {
    val settled = foldedDays(spark, lakeTable).toSet
    val base = new org.apache.hadoop.fs.Path(sinkPath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    sinkDays(spark, sinkPath).filter(settled).filter { day =>
      fs.delete(new org.apache.hadoop.fs.Path(base, s"day=$day"), true)
    }
  }
}
