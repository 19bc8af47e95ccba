package graft

import graft.sources.{LakeFold, TableOps}
import graft.streaming.StreamIngest
import org.apache.spark.sql.functions._

/** Day-fold maintenance: streaming day sink → catalog lake.
  *
  * The scenario the operator exists for: a stream lands 3 event-time
  * days into the FileStreamSink lake (whose `_spark_metadata` forbids
  * in-place compaction), the watermark closes 2 of them, and the fold
  * moves exactly those into the catalog table where compaction is
  * legal — idempotently, surviving a mid-fold crash, with the combined
  * read exact throughout and dynamic partition pruning intact on the
  * folded table.
  */
class LakeFoldSpec extends SparkSpec {

  private def notif(room: String, temp: Double, at: String): String =
    s"""{"data":[{"id":"urn:ngsi-ld:$room:$room","type":"$room",
       |"temperature":{"type":"Property","value":$temp,"observedAt":"$at"}}]}"""
      .stripMargin.replace("\n", "")

  private def addInputFile(dir: String, name: String, lines: Seq[String]): Unit = {
    val tmp = java.nio.file.Paths.get(dir, s".$name.tmp")
    java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def fileNotifications(inDir: String) =
    StreamIngest.parseNotifications(
      spark.readStream.option("maxFilesPerTrigger", 1).text(inDir).toDF("json"))

  /** Stream 3 days × 2 readings into a fresh day sink; return its path.
    * 2017-03-05 Sun / 03-06 Mon / 03-07 Tue. */
  private def buildSink(base: String): String = {
    val inDir = s"$base/in"; new java.io.File(inDir).mkdirs()
    // two input files → at least two micro-batches → multiple small
    // parquet files per day directory, the layout folding exists to fix
    addInputFile(inDir, "f0.txt", Seq(
      notif("Kitchen", 10.0, "2017-03-05T08:00:00+00:00"),
      notif("Bedroom", 11.0, "2017-03-05T09:00:00+00:00"),
      notif("Kitchen", 12.0, "2017-03-06T08:00:00+00:00")))
    addInputFile(inDir, "f1.txt", Seq(
      notif("Bedroom", 13.0, "2017-03-06T09:00:00+00:00"),
      notif("Kitchen", 14.0, "2017-03-07T08:00:00+00:00"),
      notif("Bedroom", 15.0, "2017-03-07T09:00:00+00:00")))
    val q = StreamIngest.startDaySink(
      fileNotifications(inDir), s"$base/sink", s"$base/ckpt")
    q.processAllAvailable()
    q.stop()
    s"$base/sink"
  }

  /** Fresh empty catalog lake with the sink's schema, day-partitioned. */
  private def resetLake(sinkPath: String, lakeTable: String): Unit =
    TableOps.resetTable(spark, lakeTable,
      spark.read.parquet(sinkPath).limit(0), partitionCols = Seq("day"))

  private def lakeDays(lakeTable: String): Set[String] =
    spark.table(lakeTable).select(col("day").cast("string"))
      .distinct().collect().map(_.getString(0)).toSet

  test("foldClosedDays moves exactly the closed days and is idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft_fold").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake")

    // watermark closes 03-05 and 03-06; 03-07 stays open in the sink
    val folded = LakeFold.foldClosedDays(spark, sink, "fold_lake", "2017-03-07")
    assert(folded == Seq("2017-03-05", "2017-03-06"), s"folded $folded")
    assert(lakeDays("fold_lake") == Set("2017-03-05", "2017-03-06"))
    assert(spark.table("fold_lake").count() == 4)

    // re-run: settled days are skipped, nothing duplicates
    val again = LakeFold.foldClosedDays(spark, sink, "fold_lake", "2017-03-07")
    assert(again.isEmpty, s"re-fold touched $again")
    assert(spark.table("fold_lake").count() == 4)

    // combined read = every sink row exactly once, folded or open
    val combined = LakeFold.combinedRead(spark, sink, "fold_lake")
    assert(combined.count() == 6)
    val byDay = combined.groupBy(col("day").cast("string").as("d"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDay == Map(
      "2017-03-05" -> 2L, "2017-03-06" -> 2L, "2017-03-07" -> 2L), s"$byDay")
  }

  test("a mid-fold crash re-run converges without duplicates") {
    val base = java.nio.file.Files.createTempDirectory("graft_foldcrash").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake_crash")

    // Simulate a job that died mid-append: a SUBSET of day 03-05's rows
    // (one of two) is already committed in the lake, no completion mark.
    spark.read.parquet(sink)
      .filter(col("day").cast("string") === "2017-03-05")
      .filter(col("room") === "Kitchen")
      .select(spark.table("fold_lake_crash").columns.map(col): _*)
      .write.insertInto("fold_lake_crash")
    assert(spark.table("fold_lake_crash").count() == 1)

    // The combined read is exact even in this half-folded state — the
    // open-side anti-join suppresses the already-landed row.
    assert(LakeFold.combinedRead(spark, sink, "fold_lake_crash").count() == 6)

    // Re-run folds the MISSING rows only, then the still-closed sibling
    val folded = LakeFold.foldClosedDays(spark, sink, "fold_lake_crash", "2017-03-07")
    assert(folded == Seq("2017-03-05", "2017-03-06"))
    assert(spark.table("fold_lake_crash").count() == 4)
    val day5 = spark.table("fold_lake_crash")
      .filter(col("day").cast("string") === "2017-03-05")
    assert(day5.count() == 2, "crashed day must converge to exactly 2 rows")
    assert(day5.select("room").distinct().count() == 2)
    assert(LakeFold.combinedRead(spark, sink, "fold_lake_crash").count() == 6)
  }

  test("folded partitions are compacted and DPP survives on the combined lake") {
    val base = java.nio.file.Files.createTempDirectory("graft_folddpp").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake_dpp")
    LakeFold.foldClosedDays(spark, sink, "fold_lake_dpp", "2017-03-07"): Unit

    // compaction: each folded day directory holds exactly one data file
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "fold_lake_dpp")
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("2017-03-05", "2017-03-06").foreach { d =>
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(warehouse, s"day=$d"))
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
      assert(files.length == 1, s"day=$d not compacted: ${files.length} files")
    }

    // DPP: a weekday-dim join over the folded catalog table must still
    // prune day directories at runtime (Sunday 03-05 pruned out)
    val fact = spark.table("fold_lake_dpp")
    val weekdays = spark.table("fold_lake_dpp")
      .select(col("day")).distinct()
      .filter(expr("pmod(datediff(day, DATE '1970-01-01') + 3, 7) <= 4"))
    val joined = fact.join(broadcast(weekdays), Seq("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamicpruningexpression in the folded lake's fact scan:\n$plan")
    val got = joined.collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got == Map("2017-03-06" -> 2L), s"weekday join over folded lake: $got")

    // and the combined read still answers the full 3-day question
    val all = LakeFold.combinedRead(spark, sink, "fold_lake_dpp")
      .groupBy(col("day").cast("string").as("d"))
      .agg(sum(col("value")).as("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(all == Map("2017-03-05" -> 21.0, "2017-03-06" -> 25.0,
      "2017-03-07" -> 29.0), s"$all")
  }

  test("an uncommitted-only day never settles; a later replay commit converges") {
    // The data-loss edge: a stream dies mid-batch leaving day=03-04 with
    // files NOT in _spark_metadata. Settling that day would hide the
    // rows a RESTARTED stream later commits there (Structured Streaming
    // replays the failed batch), and retirement would then delete the
    // only copy. The fold must leave it unsettled and converge when the
    // replayed commit lands.
    val base = java.nio.file.Files.createTempDirectory("graft_folduncommit").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake_uc")

    // fabricate the crash residue: a parquet file in day=2017-03-04 that
    // no metadata-log entry names (copied from a committed day, so the
    // writer schema matches)
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcFile = fs.listStatus(new org.apache.hadoop.fs.Path(sink, "day=2017-03-05"))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_")).head.getPath
    val ucDir = new org.apache.hadoop.fs.Path(sink, "day=2017-03-04")
    fs.mkdirs(ucDir)
    org.apache.hadoop.fs.FileUtil.copy(fs, srcFile, fs,
      new org.apache.hadoop.fs.Path(ucDir, "part-uncommitted.parquet"),
      false, spark.sparkContext.hadoopConfiguration)

    // fold: 03-05/03-06 settle; 03-04 is examined (it IS closed) but
    // must NOT settle — zero committed rows, no lake partition
    val folded = LakeFold.foldClosedDays(spark, sink, "fold_lake_uc", "2017-03-07")
    assert(folded == Seq("2017-03-05", "2017-03-06"), s"folded $folded")
    assert(LakeFold.foldedDays(spark, "fold_lake_uc") ==
      Seq("2017-03-05", "2017-03-06"))
    // the uncommitted file stays invisible to the query surface
    assert(LakeFold.combinedRead(spark, sink, "fold_lake_uc").count() == 6)
    // retirement is takeWhile-prefix: the unsettled 03-04 gates it, so
    // nothing is deleted while a replay could still commit to 03-04
    assert(LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_uc").isEmpty,
      "retirement must pause at the unsettled day")

    // the restarted stream replays: same checkpoint, a new input file
    // carrying the 03-04 reading — batch commits into day=2017-03-04
    addInputFile(s"$base/in", "f2.txt",
      Seq(notif("Kitchen", 9.0, "2017-03-04T08:00:00+00:00")))
    val q = StreamIngest.startDaySink(
      fileNotifications(s"$base/in"), sink, s"$base/ckpt")
    q.processAllAvailable()
    q.stop()

    // now the day folds, settles, and retirement proceeds through it
    val folded2 = LakeFold.foldClosedDays(spark, sink, "fold_lake_uc", "2017-03-07")
    assert(folded2 == Seq("2017-03-04"), s"replayed day fold: $folded2")
    assert(LakeFold.combinedRead(spark, sink, "fold_lake_uc").count() == 7)
    assert(LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_uc") ==
      Seq("2017-03-04", "2017-03-05", "2017-03-06"))
    assert(LakeFold.combinedRead(spark, sink, "fold_lake_uc").count() == 7)
  }

  test("retiring folded sink days keeps every read exact") {
    // The lifecycle's last step: folded days' sink directories are cold
    // duplicates — retire them and prove the module's whole read surface
    // still answers exactly, even though the sink's _spark_metadata log
    // still names the deleted files.
    val base = java.nio.file.Files.createTempDirectory("graft_foldret").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake_ret")
    LakeFold.foldClosedDays(spark, sink, "fold_lake_ret", "2017-03-07"): Unit

    val retired = LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_ret")
    assert(retired == Seq("2017-03-05", "2017-03-06"), s"retired $retired")
    // bounded bookkeeping: the retired prefix left the per-day list and
    // was absorbed into the O(1) floor — a daily fold+retire cadence
    // must not grow one comma entry per day forever
    assert(LakeFold.foldedDays(spark, "fold_lake_ret").isEmpty,
      "retired days must leave graft.folded.days")
    assert(LakeFold.retiredFloor(spark, "fold_lake_ret").contains("2017-03-06"))
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(sink, "day=2017-03-05")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(sink, "day=2017-03-06")),
      "retired day directories still on disk")
    assert(fs.exists(new org.apache.hadoop.fs.Path(sink, "day=2017-03-07")),
      "open day directory must survive retention")

    // combined read: folded days answer from the lake, the open day from
    // the sink's surviving files — exact despite the stale log entries
    def byDay(): Map[String, Long] =
      LakeFold.combinedRead(spark, sink, "fold_lake_ret")
        .groupBy(col("day").cast("string").as("d")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDay() == Map(
      "2017-03-05" -> 2L, "2017-03-06" -> 2L, "2017-03-07" -> 2L))

    // a re-run retires nothing and folding is still a no-op
    assert(LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_ret").isEmpty)
    assert(LakeFold.foldClosedDays(spark, sink, "fold_lake_ret", "2017-03-07").isEmpty)

    // the watermark later closes 03-07: the fold must still work from
    // the retired sink (directory-listed days, pruned file reads)
    val folded2 = LakeFold.foldClosedDays(spark, sink, "fold_lake_ret", "2017-03-08")
    assert(folded2 == Seq("2017-03-07"), s"late fold $folded2")
    assert(spark.table("fold_lake_ret").count() == 6)
    assert(LakeFold.foldedDays(spark, "fold_lake_ret") == Seq("2017-03-07"),
      "the newly folded, unretired day is the only listed entry")
    assert(LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_ret") ==
      Seq("2017-03-07"))
    assert(LakeFold.foldedDays(spark, "fold_lake_ret").isEmpty &&
      LakeFold.retiredFloor(spark, "fold_lake_ret").contains("2017-03-07"))
    // everything now lives in the lake; the combined read agrees
    assert(byDay() == Map(
      "2017-03-05" -> 2L, "2017-03-06" -> 2L, "2017-03-07" -> 2L))
  }
}
