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

  test("foldFromStream derives the closed-day floor from the live watermark") {
    // The self-driving tick: no caller-supplied watermark string — the
    // closed-day floor comes from the RUNNING query's own event-time
    // watermark (lastProgress), and one foldFromStream call folds,
    // compacts, and retires everything that floor closes.
    val base = java.nio.file.Files.createTempDirectory("graft_foldwm").toString
    val inDir = s"$base/in"; new java.io.File(inDir).mkdirs()
    addInputFile(inDir, "f0.txt", Seq(
      notif("Kitchen", 10.0, "2017-03-05T08:00:00+00:00"),
      notif("Bedroom", 11.0, "2017-03-05T09:00:00+00:00"),
      notif("Kitchen", 12.0, "2017-03-06T08:00:00+00:00")))
    addInputFile(inDir, "f1.txt", Seq(
      notif("Bedroom", 13.0, "2017-03-06T09:00:00+00:00"),
      notif("Kitchen", 14.0, "2017-03-07T08:00:00+00:00"),
      notif("Bedroom", 15.0, "2017-03-07T09:00:00+00:00")))
    val q = StreamIngest.startDaySink(
      fileNotifications(inDir).withWatermark("event_ts", "1 second"),
      s"$base/sink", s"$base/ckpt")
    q.processAllAvailable()
    // two more 03-08 files: the watermark trails the max event time by
    // one batch, so a second 03-08 batch guarantees the REPORTED
    // watermark has crossed into 03-08 whichever semantics the engine
    // version uses
    addInputFile(inDir, "f2.txt",
      Seq(notif("Attic", 16.0, "2017-03-08T08:00:00+00:00")))
    q.processAllAvailable()
    addInputFile(inDir, "f3.txt",
      Seq(notif("Attic", 17.0, "2017-03-08T09:00:00+00:00")))
    q.processAllAvailable()
    resetLake(s"$base/sink", "fold_lake_wm")

    val wd = LakeFold.watermarkDay(q)
    assert(wd.exists(_ >= "2017-03-08"), s"watermark day $wd")
    val folded = LakeFold.foldFromStream(spark, q, s"$base/sink", "fold_lake_wm")
    val expect = Seq("2017-03-05", "2017-03-06", "2017-03-07")
      .filter(d => wd.exists(d < _))
    assert(folded == expect, s"folded $folded, watermark day $wd")
    // TWO-PHASE retirement: the days THIS tick settled keep their sink
    // files until the next tick, so a reader that planned before the
    // settle still finds them — they are listed, not yet floored
    assert(LakeFold.foldedDays(spark, "fold_lake_wm") == folded)
    assert(LakeFold.retiredFloor(spark, "fold_lake_wm").isEmpty)
    val fs = new org.apache.hadoop.fs.Path(s"$base/sink")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$base/sink", s"day=${folded.head}")),
      "a just-settled day's sink dir must survive its own settling tick")
    assert(LakeFold.combinedRead(spark, s"$base/sink", "fold_lake_wm").count() == 8)

    // next tick: nothing new to fold, the previously-settled prefix
    // retires, bookkeeping collapses into the floor
    assert(LakeFold.foldFromStream(spark, q, s"$base/sink", "fold_lake_wm").isEmpty)
    q.stop()
    assert(LakeFold.foldedDays(spark, "fold_lake_wm").isEmpty)
    assert(LakeFold.retiredFloor(spark, "fold_lake_wm").contains(folded.last))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/sink", s"day=${folded.head}")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$base/sink", "day=2017-03-08")))
    assert(LakeFold.combinedRead(spark, s"$base/sink", "fold_lake_wm").count() == 8)
    // a stopped query's last progress still yields the floor → the tick
    // stays a safe no-op once everything is settled and retired
    assert(LakeFold.foldFromStream(spark, q, s"$base/sink", "fold_lake_wm").isEmpty)
  }

  test("soak: concurrent append, fold, retire, and combined reads stay exact") {
    // The steady state run AS a steady state: one thread streams new
    // days in, one folds on the live watermark, one retires settled
    // days, two read the combined surface — all concurrently. Every
    // successful read must be exact (no duplicate reading, row count
    // within the commit bounds captured around it); a read that trips
    // over a file retired/compacted between its plan and its execution
    // is the documented retry-on-conflict case, counted and retried,
    // never a pass.
    import java.util.concurrent.ConcurrentLinkedQueue
    import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
    import scala.util.control.NonFatal

    val base = java.nio.file.Files.createTempDirectory("graft_foldsoak").toString
    val inDir = s"$base/in"; new java.io.File(inDir).mkdirs()
    val sink = s"$base/sink"
    addInputFile(inDir, "seed.txt", Seq(
      notif("Kitchen", 10.0, "2017-03-05T08:00:00+00:00"),
      notif("Bedroom", 11.0, "2017-03-05T09:00:00+00:00")))
    val q = StreamIngest.startDaySink(
      fileNotifications(inDir).withWatermark("event_ts", "1 second"),
      sink, s"$base/ckpt")
    q.processAllAvailable()
    resetLake(sink, "fold_lake_soak")

    val errors = new ConcurrentLinkedQueue[Throwable]
    val committed = new AtomicInteger(2)
    val running = new AtomicBoolean(true)
    val conflicts = new AtomicInteger(0)
    val readsOk = new AtomicInteger(0)
    def spawn(name: String)(body: => Unit): Thread = {
      val t = new Thread(() =>
        try body catch { case NonFatal(e) => errors.add(e): Unit }, name)
      t.start(); t
    }

    val lastDay = 15
    val appender = spawn("soak-append") {
      var v = 100.0
      (6 to lastDay).foreach { d =>
        val day = f"2017-03-$d%02d"
        addInputFile(inDir, s"d$d.txt", Seq(
          notif("Kitchen", v, s"${day}T08:00:00+00:00"),
          notif("Bedroom", v + 1, s"${day}T09:00:00+00:00")))
        v += 2
        q.processAllAvailable()
        committed.addAndGet(2): Unit
      }
    }
    val folder = spawn("soak-fold") {
      while (running.get) {
        LakeFold.foldFromStream(spark, q, sink, "fold_lake_soak",
          retire = false): Unit
        Thread.sleep(50)
      }
    }
    val retirer = spawn("soak-retire") {
      while (running.get) {
        LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_soak"): Unit
        Thread.sleep(70)
      }
    }
    val readers = (1 to 2).map { i =>
      spawn(s"soak-read-$i") {
        while (running.get) {
          val before = committed.get
          // retry-on-conflict, but NEVER retry an exactness failure:
          // the collect is inside the catch scope, the asserts outside
          val got =
            try Some(LakeFold.combinedRead(spark, sink, "fold_lake_soak")
              .select(col("room"), col("value"), col("day").cast("string"))
              .collect().toSeq)
            catch { case NonFatal(_) => conflicts.incrementAndGet(); None }
          got.foreach { rows =>
            val after = committed.get
            assert(rows.distinct.size == rows.size,
              s"duplicate readings in combined read: ${rows.groupBy(identity)
                .filter(_._2.size > 1).keys}")
            assert(rows.size >= before && rows.size <= after,
              s"combined read ${rows.size} outside commit bounds [$before,$after]")
            readsOk.incrementAndGet(): Unit
          }
        }
      }
    }

    appender.join(120000)
    Thread.sleep(500) // let fold/retire/read overlap the final commits
    running.set(false)
    (Seq(folder, retirer) ++ readers).foreach(_.join(60000))

    assert(errors.isEmpty, s"soak thread failures: ${errors.toArray.toSeq}")
    assert(readsOk.get > 0, "no reader ever completed a successful read")
    // quiesced: one final tick settles everything the watermark closed,
    // then the combined surface must hold exactly every committed row
    LakeFold.foldFromStream(spark, q, sink, "fold_lake_soak"): Unit
    q.stop()
    val total = committed.get
    val rows = LakeFold.combinedRead(spark, sink, "fold_lake_soak")
      .select(col("room"), col("value"), col("day").cast("string"))
      .collect().toSeq
    assert(rows.size == total, s"final combined read ${rows.size} != $total")
    assert(rows.distinct.size == rows.size)
    // the soak genuinely exercised the lifecycle: days folded AND retired
    assert(LakeFold.retiredFloor(spark, "fold_lake_soak").exists(_ >= "2017-03-05"),
      "no day was retired during or after the soak")
    assert(spark.table("fold_lake_soak").count() > 0)
    info(s"soak: ${readsOk.get} exact reads, ${conflicts.get} retried conflicts")
  }

  test("late events committed into a SETTLED day are re-folded, never lost") {
    // Spark enforces watermarks only at stateful operators — the day
    // sink is stateless, so an event later than the watermark delay is
    // still COMMITTED into its already-settled day. The defense chain
    // under test: retirement refuses the grown day (its sink copy is
    // the only copy of the late rows), the next fold re-folds it
    // exactly, and the rows surface in the combined read — at no point
    // are they silently hidden and deleted.
    val base = java.nio.file.Files.createTempDirectory("graft_foldlate").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake_late")
    val folded = LakeFold.foldClosedDays(spark, sink, "fold_lake_late", "2017-03-07")
    assert(folded == Seq("2017-03-05", "2017-03-06"))

    // the restarted stream commits a LATE event into settled 03-06
    addInputFile(s"$base/in", "late.txt",
      Seq(notif("Attic", 99.0, "2017-03-06T23:00:00+00:00")))
    val q = StreamIngest.startDaySink(
      fileNotifications(s"$base/in"), sink, s"$base/ckpt")
    q.processAllAvailable()
    q.stop()

    // interim visibility gap (documented): the settled day is served
    // from the lake, which does not have the late row yet — 6, not 7.
    // The gap closes at the next fold tick; what is FORBIDDEN is the
    // row being deleted while only the sink has it:
    assert(LakeFold.combinedRead(spark, sink, "fold_lake_late").count() == 6)
    // retirement retires the intact 03-05 but REFUSES the grown 03-06
    assert(LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_late") ==
      Seq("2017-03-05"), "retirement must stop at the grown day")
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(sink, "day=2017-03-06")),
      "the grown day's sink files are the only copy of the late row — " +
        "they must survive retirement")

    // the next fold tick detects the growth and re-folds the day
    val refolded = LakeFold.foldClosedDays(spark, sink, "fold_lake_late", "2017-03-07")
    assert(refolded == Seq("2017-03-06"), s"re-fold touched $refolded")
    assert(spark.table("fold_lake_late").count() == 5)
    val rows = LakeFold.combinedRead(spark, sink, "fold_lake_late")
      .select(col("room"), col("value"), col("day").cast("string")).collect().toSeq
    assert(rows.size == 7 && rows.distinct.size == 7, s"${rows.size} rows")
    // absorbed: retirement now proceeds through the re-settled day
    assert(LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_late") ==
      Seq("2017-03-06"))
    assert(LakeFold.combinedRead(spark, sink, "fold_lake_late").count() == 7)
  }

  test("a day resurrected AFTER retirement halts maintenance loudly") {
    // The one late-data case that cannot be absorbed: the day's sink
    // files were already deleted, so its metadata-log entries name dead
    // files and a log-resolved re-fold is impossible. Both maintenance
    // entry points must fail with a sizing diagnostic instead of
    // letting the next retirement delete the only copy of the rows.
    val base = java.nio.file.Files.createTempDirectory("graft_foldres").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake_res")
    LakeFold.foldClosedDays(spark, sink, "fold_lake_res", "2017-03-07"): Unit
    assert(LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_res") ==
      Seq("2017-03-05", "2017-03-06"))

    // a VERY late event recreates retired day=2017-03-06
    addInputFile(s"$base/in", "verylate.txt",
      Seq(notif("Attic", 77.0, "2017-03-06T23:30:00+00:00")))
    val q = StreamIngest.startDaySink(
      fileNotifications(s"$base/in"), sink, s"$base/ckpt")
    q.processAllAvailable()
    q.stop()

    val e1 = intercept[IllegalArgumentException] {
      LakeFold.foldClosedDays(spark, sink, "fold_lake_res", "2017-03-08")
    }
    assert(e1.getMessage.contains("2017-03-06") &&
      e1.getMessage.toLowerCase.contains("retired"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_res")
    }
    assert(e2.getMessage.contains("2017-03-06"), e2.getMessage)

    // the mechanized recovery: salvage direct-reads the resurrected
    // directory (bypassing its poisoned metadata-log entries), folds
    // the late row into the lake, deletes the directory, and thereby
    // clears the halt
    val salvaged = LakeFold.salvageResurrectedDay(
      spark, sink, "fold_lake_res", "2017-03-06")
    assert(salvaged == 1, s"expected the 1 late row, salvaged $salvaged")
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(sink, "day=2017-03-06")),
      "salvage must delete the resurrected directory")
    // combined read is exact: the original 6 rows + the salvaged late one
    val rows = LakeFold.combinedRead(spark, sink, "fold_lake_res")
      .select(col("room"), col("value"), col("day").cast("string"))
      .collect().toSeq
    assert(rows.size == 7 && rows.distinct.size == 7,
      s"expected 7 distinct rows after salvage, got ${rows.size}")
    assert(rows.exists(r => r.getString(0) == "Attic" && r.getDouble(1) == 77.0),
      "the salvaged late row must surface in the combined read")
    // maintenance resumes: both entry points run clean again
    assert(LakeFold.foldClosedDays(spark, sink, "fold_lake_res", "2017-03-08")
      == Seq("2017-03-07"))
    LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_res"): Unit
    // a re-salvage (nothing resurrected any more) is a 0-row no-op
    assert(LakeFold.salvageResurrectedDay(
      spark, sink, "fold_lake_res", "2017-03-06") == 0L)
    // and salvage refuses a day ordinary maintenance can still absorb
    val e3 = intercept[IllegalArgumentException] {
      LakeFold.salvageResurrectedDay(spark, sink, "fold_lake_res", "2017-03-09")
    }
    assert(e3.getMessage.contains("foldClosedDays"), e3.getMessage)
  }

  test("growth detection baselines on LOG-COMMITTED files, not raw listings") {
    // The counted-but-not-folded race: a data file can exist in a day
    // directory BEFORE it is committed to the sink's metadata log (the
    // sink writes files first, commits the batch after). A raw
    // directory-listing baseline counts such a file even though the
    // log-resolved fold cannot see it — so when its commit later lands
    // (adding no new file), the growth detector never fires and
    // retirement deletes the only copy of committed rows. The committed
    // counter must therefore ignore orphan (un-logged) files entirely:
    // they neither inflate the settle-time baseline nor block
    // retirement, and only their COMMIT moves the count.
    val base = java.nio.file.Files.createTempDirectory("graft_foldorph").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake_orph")
    val committed = LakeFold.committedDayFileCounts(spark, sink)
    assert(committed.keySet == Set("2017-03-05", "2017-03-06", "2017-03-07"),
      s"unexpected committed days: $committed")

    // drop an ORPHAN parquet data file into 03-06 (written, never
    // committed — the mid-race state). It is a copy of a real sink part
    // file, so it carries the writer schema like genuine crash residue
    // (an alien-schema file would — correctly — trip the drift probe).
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphanSrc = fs
      .listStatus(new org.apache.hadoop.fs.Path(sink, "day=2017-03-07"))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .head.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, orphanSrc,
      fs, new org.apache.hadoop.fs.Path(sink, "day=2017-03-06/orphan.parquet"),
      false, spark.sparkContext.hadoopConfiguration): Unit
    assert(LakeFold.committedDayFileCount(spark, sink, "2017-03-06") ==
      committed("2017-03-06"),
      "an un-committed file must not move the committed count")

    // settle both closed days WITH the orphan present: the recorded
    // baseline is the committed count, so the orphan neither triggers a
    // spurious re-fold nor blocks retirement
    assert(LakeFold.foldClosedDays(spark, sink, "fold_lake_orph", "2017-03-07")
      == Seq("2017-03-05", "2017-03-06"))
    assert(LakeFold.foldClosedDays(spark, sink, "fold_lake_orph", "2017-03-07")
      .isEmpty, "an orphan file must not read as growth")
    assert(LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_orph") ==
      Seq("2017-03-05", "2017-03-06"),
      "an orphan file must not block retirement — it is not committed data")
    assert(LakeFold.combinedRead(spark, sink, "fold_lake_orph").count() == 6)
  }

  test("a mid-write newest day cannot fail combinedRead's drift probe") {
    // At day rollover the newest unsettled dir's only file can be
    // mid-write with no parquet footer yet — healthy operation. The
    // read-side drift probe must treat it as no-schema-yet and fall
    // back to the next-newest day; the FOLD path keeps the loud
    // failure (there the day is closed, so all-torn is crash residue).
    val base = java.nio.file.Files.createTempDirectory("graft_foldroll").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake_roll")
    LakeFold.foldClosedDays(spark, sink, "fold_lake_roll", "2017-03-07"): Unit

    // rollover into 03-08: the dir exists with ONE footerless file
    val dir = java.nio.file.Paths.get(sink, "day=2017-03-08")
    java.nio.file.Files.createDirectories(dir): Unit
    java.nio.file.Files.write(dir.resolve("part-inflight.parquet"),
      "no footer yet".getBytes("UTF-8")): Unit

    // probe falls back to 03-07 (readable, matching) and the read works
    assert(LakeFold.combinedRead(spark, sink, "fold_lake_roll").count() == 6)

    // once the watermark CLOSES that day, the fold fails loudly on it
    val e = intercept[IllegalStateException] {
      LakeFold.foldClosedDays(spark, sink, "fold_lake_roll", "2017-03-09")
    }
    assert(e.getMessage.contains("2017-03-08") &&
      e.getMessage.contains("part-inflight.parquet"), e.getMessage)
  }

  test("a reader slower than the retire lag re-plans and succeeds exactly") {
    // Two-phase retirement protects any reader faster than one tick; a
    // SLOWER reader holds a plan whose file list names sink files that
    // retire under it. The documented contract — the read fails with
    // missing-file (never silently wrong) and a re-invoked combinedRead
    // re-plans against the new bookkeeping and succeeds exactly — is
    // asserted here end to end.
    val base = java.nio.file.Files.createTempDirectory("graft_foldslow").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake_slow")

    // the slow reader PLANS while 03-05/03-06 are still unsettled: the
    // open side's file list includes their sink files
    val slow = LakeFold.combinedRead(spark, sink, "fold_lake_slow")

    // tick 1 — fold + two-phase retirement (just-settled days excluded):
    // the reader is within one tick of its plan, so it must SUCCEED
    val folded = LakeFold.foldClosedDays(spark, sink, "fold_lake_slow", "2017-03-07")
    assert(LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_slow",
      exclude = folded.toSet).isEmpty)
    assert(slow.count() == 6,
      "a reader one tick behind must still read exactly (two-phase lag)")

    // tick 2 — the settled prefix actually retires; the stale plan now
    // names deleted files and must fail LOUDLY, not return partial rows
    assert(LakeFold.retireFoldedSinkDays(spark, sink, "fold_lake_slow") ==
      Seq("2017-03-05", "2017-03-06"))
    val e = intercept[Exception] { slow.count() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[java.io.FileNotFoundException] ||
      c.getMessage != null && c.getMessage.toLowerCase.contains("file")),
      s"expected a missing-file failure, got $e")

    // the retry contract: re-invoking combinedRead re-plans and is exact
    val again = LakeFold.combinedRead(spark, sink, "fold_lake_slow")
      .select(col("room"), col("value"), col("day").cast("string")).collect().toSeq
    assert(again.size == 6 && again.distinct.size == 6)
  }

  test("a torn data file cannot wedge the fold; an all-torn day fails naming it") {
    // A writer that dies MID-WRITE (not just mid-commit) leaves a file
    // with no parquet footer. The drift check must fall back past it to
    // a readable sibling — and only when a day has NO readable data file
    // at all may it fail, loudly, naming the residue.
    val base = java.nio.file.Files.createTempDirectory("graft_foldtorn").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake_torn")
    def writeGarbage(day: String, name: String): Unit = {
      val dir = java.nio.file.Paths.get(sink, s"day=$day")
      java.nio.file.Files.createDirectories(dir): Unit
      java.nio.file.Files.write(dir.resolve(name),
        "this is not a parquet file".getBytes("UTF-8")): Unit
    }
    writeGarbage("2017-03-05", "part-torn.parquet")

    // the torn file sits beside committed ones: schema probing falls
    // back to a readable footer and the fold completes normally (the
    // torn file itself is invisible to the data read — no log entry)
    val folded = LakeFold.foldClosedDays(spark, sink, "fold_lake_torn", "2017-03-07")
    assert(folded == Seq("2017-03-05", "2017-03-06"), s"folded $folded")
    assert(spark.table("fold_lake_torn").count() == 4)

    // an ALL-torn day has no schema to check and blocks with a named
    // culprit instead of an opaque parquet error
    writeGarbage("2017-03-04", "part-torn2.parquet")
    val e = intercept[IllegalStateException] {
      LakeFold.foldClosedDays(spark, sink, "fold_lake_torn", "2017-03-07")
    }
    assert(e.getMessage.contains("2017-03-04") &&
      e.getMessage.contains("part-torn2.parquet"), e.getMessage)
  }

  test("schema drift in a LATER closed day fails before that day folds") {
    // Each closed day can carry a different writer schema (a restarted
    // stream with an evolved schema): the drift check runs per day, so
    // a drifted day sorting AFTER healthy ones still fails loudly —
    // after the healthy prefix folded, before the drifted day moves.
    val base = java.nio.file.Files.createTempDirectory("graft_folddrift").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake_drift")
    // a drifted-writer day between 03-06 and 03-07 (string-sorted):
    // one parquet file whose columns are nothing like the lake's
    val driftSrc = s"$base/drift_src"
    spark.range(1).selectExpr("id AS weird_col").write.parquet(driftSrc)
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(driftSrc))
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_")).head.getPath
    val driftDay = new org.apache.hadoop.fs.Path(sink, "day=2017-03-06x")
    fs.mkdirs(driftDay)
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
      new org.apache.hadoop.fs.Path(driftDay, part.getName), false,
      spark.sparkContext.hadoopConfiguration)

    val e = intercept[IllegalArgumentException] {
      LakeFold.foldClosedDays(spark, sink, "fold_lake_drift", "2017-03-07")
    }
    assert(e.getMessage.contains("2017-03-06x") &&
      e.getMessage.contains("weird_col"), e.getMessage)
    // the healthy prefix DID fold before the failure — per-day checking
    // gates each day on its own schema, not the whole run on the first
    assert(LakeFold.foldedDays(spark, "fold_lake_drift") ==
      Seq("2017-03-05", "2017-03-06"))
    assert(spark.table("fold_lake_drift").count() == 4)
  }

  test("combinedRead's drift probe inspects the live day, not the NULL-day partition") {
    // '__HIVE_DEFAULT_PARTITION__' sorts after every date, is never
    // settled, and its files can long predate a schema evolution — the
    // probe must skip it, or its old matching footer masks a DRIFTED
    // live day and the open side silently NULL-fills the new column
    val base = java.nio.file.Files.createTempDirectory("graft_foldnull").toString
    val sink = buildSink(base)
    resetLake(sink, "fold_lake_nullp")
    LakeFold.foldClosedDays(spark, sink, "fold_lake_nullp", "2017-03-08"): Unit
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(sink).getFileSystem(conf)
    def firstPart(dir: org.apache.hadoop.fs.Path) =
      fs.listStatus(dir).filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")).head.getPath
    // NULL-day dir carrying a READABLE, lake-matching footer (a folded
    // day's sink file — still on disk, retirement hasn't run)
    val matching = firstPart(new org.apache.hadoop.fs.Path(sink, "day=2017-03-05"))
    val nullDay = new org.apache.hadoop.fs.Path(sink,
      "day=__HIVE_DEFAULT_PARTITION__")
    fs.mkdirs(nullDay)
    org.apache.hadoop.fs.FileUtil.copy(fs, matching, fs,
      new org.apache.hadoop.fs.Path(nullDay, matching.getName), false, conf)
    // the newest REAL unsettled day arrives from a drifted writer
    val driftSrc = s"$base/drift_src"
    spark.range(1).selectExpr("id AS weird_col").write.parquet(driftSrc)
    val drifted = firstPart(new org.apache.hadoop.fs.Path(driftSrc))
    val liveDay = new org.apache.hadoop.fs.Path(sink, "day=2017-03-08")
    fs.mkdirs(liveDay)
    org.apache.hadoop.fs.FileUtil.copy(fs, drifted, fs,
      new org.apache.hadoop.fs.Path(liveDay, drifted.getName), false, conf)
    // the probe must fail naming the LIVE day — stopping at the default
    // partition's matching footer was the silent pre-fix outcome
    val e = intercept[IllegalArgumentException] {
      LakeFold.combinedRead(spark, sink, "fold_lake_nullp")
    }
    assert(e.getMessage.contains("2017-03-08") &&
      e.getMessage.contains("weird_col"), e.getMessage)
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
