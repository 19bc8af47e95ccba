package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog/table lifecycle operators — the engine analog of the
  * reference's DDL surface (SURVEY.md S5/S6):
  *
  *   - reference S5: idempotent drop-if-exists + create per table
  *     (`insert.py:49-62`, `subscriber.py:66-75`);
  *   - reference S6: `CREATE EXTERNAL TABLE … STORED BY HBaseStorageHandler`
  *     (`hive.py:29-44`) — here a managed/`path`-based parquet table in the
  *     session catalog, partitioned instead of per-room physical tables.
  *
  * These run against the session catalog (in-memory by default, Hive
  * metastore when the session enables it) — the DDL is identical either
  * way, which is the point: the reference needed HBase+Hive plumbing for
  * this; the engine needs one `saveAsTable`.
  */
object TableOps {

  /** DROP IF EXISTS + clear the managed location. The drop alone is not
    * idempotent ACROSS JVMs with the in-memory catalog: a fresh session
    * has no catalog entry to drop, but the previous run's warehouse
    * directory survives on disk and `saveAsTable` then refuses with
    * LOCATION_ALREADY_EXISTS. (A shared Hive metastore remembers the
    * table instead, making the plain drop sufficient — this helper keeps
    * the reset idempotent under both catalogs.) */
  private def dropWithLocation(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val path = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true): Unit
  }

  /** Idempotent reset: drop-if-exists then recreate from a DataFrame,
    * partitioned by the given columns (the reference's six per-room
    * tables become one partitioned table, SURVEY.md §1.3). */
  def resetTable(spark: SparkSession, name: String, df: DataFrame,
                 partitionCols: Seq[String] = Nil): Unit = {
    dropWithLocation(spark, name)
    val writer = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .saveAsTable(name)
  }

  /** External-table registration over an existing parquet location
    * (closest analog of the reference's external tables: metadata only,
    * data stays in place). */
  def registerExternal(spark: SparkSession, name: String, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING parquet LOCATION '$path'")
  }

  /** Bucketed table write: co-locates rows by join key so that joins and
    * aggregations between tables bucketed the same way need NO shuffle —
    * the 100 TB replacement for repartitioning per query. Requires the
    * session catalog (bucket metadata lives there). */
  def resetBucketedTable(spark: SparkSession, name: String, df: DataFrame,
                         bucketCol: String, nBuckets: Int): Unit =
    resetBucketedTable(spark, name, df, Seq(bucketCol), nBuckets)

  /** Composite-key form: joins keyed on ALL bucket columns (in order)
    * between same-bucketed tables plan without an Exchange. */
  def resetBucketedTable(spark: SparkSession, name: String, df: DataFrame,
                         bucketCols: Seq[String], nBuckets: Int): Unit = {
    dropWithLocation(spark, name)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)
  }

  /** Small-file compaction — the standing lake-maintenance job every
    * 100 TB deployment runs: streaming ingest and per-batch writes leave
    * thousands of KB-sized parquet files per table (each costing a task,
    * a footer read, and an open at scan time); compaction rewrites the
    * table into ⌈bytes / targetFileBytes⌉ right-sized files. The rewrite
    * goes to a staging table first and swaps in via RENAME, so a reader
    * never sees a half-written table. Returns (filesBefore, filesAfter).
    * At cluster scale the same op runs per partition-predicate slice;
    * here it covers the whole (unpartitioned) table. */
  def compactTable(spark: SparkSession, name: String,
                   targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).toIndexedSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    }
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    // Partitioned tables keep their data under per-partition
    // SUBDIRECTORIES; compacting through a flat rewrite would silently
    // discard the partitioning (and the flat listing would see zero
    // files and "compact" to one). Refuse loudly — the partitioned form
    // of this job compacts one partition-predicate slice at a time.
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val subdirs = fs.listStatus(loc).filter(_.isDirectory)
    require(subdirs.isEmpty,
      s"compactTable($name): table has partition subdirectories " +
        s"(${subdirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
        "compact per partition slice instead of flattening the layout")
    // Same silent-flatten hazard for BUCKETED tables: the staging rewrite
    // goes through resetTable, which drops the bucket spec, and every
    // Exchange-free join keyed on the buckets would silently regain a
    // shuffle. Refuse loudly; a bucketed table is compacted by rewriting
    // through resetBucketedTable with its original spec.
    val bucketSpec = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
      .bucketSpec
    require(bucketSpec.isEmpty,
      s"compactTable($name): table is bucketed (${bucketSpec.orNull}) — a " +
        "flat rewrite would drop the bucket layout; recompact via " +
        "resetBucketedTable with the original spec instead")
    val before = dataFiles(loc)
    val nOut = math.max(1L,
      (before.map(_.getLen).sum + targetFileBytes - 1) / targetFileBytes).toInt
    val staging = s"${name}_compacting"
    resetTable(spark, staging, spark.table(name).repartition(nOut))
    dropWithLocation(spark, name)
    spark.sql(s"ALTER TABLE $staging RENAME TO $name")
    (before.length, dataFiles(new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)).length)
  }

  /** Reference S11 (`hive.py:12-17`): engine config introspection. */
  def versionInfo(spark: SparkSession): Seq[(String, String)] = Seq(
    "spark.version" -> spark.version,
    "scala.version" -> scala.util.Properties.versionNumberString)
}
