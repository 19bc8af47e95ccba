package graft

import graft.streaming.{SensorReading, StreamIngest}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

/** End-to-end streaming replay (SURVEY.md §3.2 dataflow): the reference's
  * own measurement CSVs are re-shaped into simulator-style NGSI-LD
  * notification envelopes (`real_time_data_simulator.py:40-52` PATCH
  * payload inside the subscriber's `{"data":[…]}` notification), replayed
  * through a file-source stream one micro-batch per file, run through
  * parse → per-entity throttle → checkpointed room-partitioned sink, and
  * the landed table is then queried with the reference's Q2 shape
  * (`hive.py` hourly average). Every stage's output is cross-checked
  * against a plain-Scala sequential model of the same semantics, so this
  * one spec ties the whole ingest dataflow together.
  */
class ReplayStreamSpec extends SparkSpec {
  private val measurements = "/root/reference/Measurements"
  private val GapMs = 600000L // 10-minute per-entity throttle

  private def iso(epochS: Long): String =
    java.time.LocalDateTime.ofEpochSecond(epochS, 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss'+00:00'"))

  private def readCsv(room: String, sensor: String, n: Int): Seq[(String, String, Long, Double)] = {
    val src = scala.io.Source.fromFile(s"$measurements/${room}_$sensor.csv")
    try src.getLines().flatMap { l =>
      l.split("\t") match {
        case Array(ts, v) =>
          try Some((room, sensor.toLowerCase, ts.trim.toLong, v.trim.toDouble))
          catch { case _: Throwable => None }
        case _ => None
      }
    }.take(n).toList
    finally src.close()
  }

  private def notif(room: String, sensor: String, epochS: Long, v: Double): String =
    s"""{"data":[{"id":"urn:ngsi-ld:$room:$room","type":"$room","$sensor":""" +
      s"""{"type":"Property","value":$v,"observedAt":"${iso(epochS)}"}}]}"""

  test("CSV replay through stream parse, throttle, sink matches the sequential model") {
    import spark.implicits._
    // Chronological replay of two rooms' sensors, chunked into 4 files =
    // 4 micro-batches (mtimes pinned so the file source preserves order).
    val readings = (readCsv("Kitchen", "Temperature", 200) ++
      readCsv("Bathroom", "Humidity", 200)).sortBy(r => (r._3, r._1))
    val inDir = Files.createTempDirectory("graft_replay_in")
    val chunk = (readings.size + 3) / 4
    readings.grouped(chunk).zipWithIndex.foreach { case (rs, i) =>
      val p = inDir.resolve(f"notif_$i%03d.json")
      Files.write(p, rs.map(r => notif(r._1, r._2, r._3, r._4))
        .mkString("\n").getBytes("UTF-8"))
      Files.setLastModifiedTime(p, FileTime.fromMillis(1000000000000L + i * 60000L))
    }

    val base = Files.createTempDirectory("graft_replay_out").toString
    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .text(inDir.toString)
      .toDF("json")
    val throttled = StreamIngest.throttle(
      StreamIngest.parseNotifications(stream).as[SensorReading], GapMs)
    val q = StreamIngest.startSink(throttled.toDF(), s"$base/data", s"$base/ckpt")
    q.processAllAvailable()
    q.stop()

    // Sequential model: per entity, keep a reading iff >= GapMs after the
    // last KEPT one, scanning in event-time order (the replay is
    // chronological, so batch boundaries cannot reorder an entity's rows).
    val expected = readings.groupBy(_._1).flatMap { case (_, rs) =>
      var lastKeptMs = Long.MinValue
      rs.sortBy(_._3).filter { r =>
        val tMs = r._3 * 1000
        val keep = lastKeptMs == Long.MinValue || tMs - lastKeptMs >= GapMs
        if (keep) lastKeptMs = tMs
        keep
      }
    }.toSeq

    val landed = spark.read.parquet(s"$base/data").cache()
    assert(landed.count() == expected.size,
      s"landed ${landed.count()} vs model ${expected.size}")
    // Spot-check the exact kept row set for one entity.
    val gotKitchen = landed.filter(col("room") === "Kitchen")
      .select("event_ts").collect().map(_.getTimestamp(0).getTime / 1000).sorted.toSeq
    val expKitchen = expected.filter(_._1 == "Kitchen").map(_._3).sorted
    assert(gotKitchen == expKitchen)

    // Reference Q2 shape over the landed table vs the model's aggregate.
    val got = landed.filter(col("sensor") === "temperature")
      .groupBy(hour(col("event_ts")).as("h"))
      .agg(avg("value").as("a"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val expByHour = expected.filter(_._2 == "temperature")
      .groupBy(r => ((r._3 % 86400) / 3600).toInt)
      .map { case (h, vs) => h -> vs.map(_._4).sum / vs.size }
    assert(got.keySet == expByHour.keySet)
    got.foreach { case (h, a) =>
      assert(math.abs(a - expByHour(h)) < 1e-9, s"hour $h: $a vs ${expByHour(h)}")
    }
    landed.unpersist()
  }
}
