package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-up datum for the 100 TB posture (round-11 task): the
  * plan-shape arguments in SCALING.md say the headline operators grow
  * ~linearly in input size; this main MEASURES one point of that curve
  * instead of arguing it. It materializes a K× (default 10×) replica of
  * the two fact tables the headline set touches —
  *
  *   - `events`: K salted copies (event_id / user_id offset per copy so
  *     keys stay unique; ts / value / type untouched so filter
  *     selectivity and group cardinality scale the way a real K× corpus
  *     would), raw `ts` column copied UNCONVERTED so the replica keeps
  *     the driver generation's footer type and `q1_time_filter`'s
  *     raw-column pushdown path is exercised identically;
  *   - `documents`: K copies with doc_id offset and every TOKEN prefixed
  *     by a per-copy salt, so copies are NOT near-duplicates of each
  *     other — the MinHash band graph decomposes into K disjoint
  *     replicas of the original and candidate volume grows K×, not K²×
  *     (unsalted copies would collide on every band and manufacture a
  *     quadratic candidate blowup that says nothing about real scaling)
  *
  * — and times the four reference queries plus the banded dedup pipeline
  * against a layout-parity x1 rewrite and the xK replica (same writer,
  * same file-size regime: xK gets K× the output files). Median of `runs`
  * timed passes after one warm-up, same protocol as Bench's extended
  * set. Writes BENCH_SCALEUP.json (x1 secs, xK secs, ratio per query);
  * materialization is untimed.
  *
  * Usage: sbt "runMain graft.ScaleUpBench"  (SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_SCALEUP_FACTOR, SPARK_GRAFT_SCALEUP_RUNS override.)
  */
object ScaleUpBench {

  private val queries = Seq(
    "q1_time_filter", "q2_hourly_avg", "q3_union_cube", "q4_join_aggs",
    "d_dedup_pipeline")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_FACTOR", "10").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_RUNS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = "/tmp/graft_scaleup"
    val ev = Tables.table(spark, sfDir, "events")
    val docs = Tables.table(spark, sfDir, "documents")

    // layout-parity baseline: the SAME writer produces both sides, so
    // the ratio measures data volume, not file-layout differences
    ev.repartition(8).write.mode("overwrite").parquet(s"$out/x1/events.parquet")
    docs.repartition(8).write.mode("overwrite").parquet(s"$out/x1/documents.parquet")

    // key offsets: one past the current max, per copy
    val evMax = ev.agg(max(col("event_id")), max(col("user_id"))).head()
    val (eOff, uOff) = (evMax.getLong(0) + 1, evMax.getLong(1) + 1)
    val dOff = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val evK = (0 until k).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i.toLong * eOff))
        .withColumn("user_id", col("user_id") + lit(i.toLong * uOff))
    }.reduce(_ unionByName _)
    evK.repartition(8 * k).write.mode("overwrite").parquet(s"$out/x$k/events.parquet")
    val docsK = (0 until k).map { i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * dOff))
        .withColumn("text", array_join(
          transform(split(col("text"), " "), t => concat(lit(s"c${i}_"), t)), " "))
    }.reduce(_ unionByName _)
    docsK.repartition(8 * k).write.mode("overwrite").parquet(s"$out/x$k/documents.parquet")

    def sweep(dir: String): Seq[(String, Double)] = queries.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        try name -> Bench.timeQuery(fn, spark, dir, runs).median
        catch {
          case e: Throwable =>
            System.err.println(s"[scaleup] $name @ $dir failed: ${e.getMessage}")
            name -> -1.0
        }
      }
    }
    val x1 = sweep(s"$out/x1")
    val xk = sweep(s"$out/x$k")
    val ratio = x1.zip(xk).map { case ((n, a), (_, b)) =>
      n -> (if (a > 0 && b > 0) b / a else -1.0)
    }
    def j(pairs: Seq[(String, Double)]): String =
      pairs.map { case (n, v) => "\"" + n + f"\":$v%.4f" }.mkString("{", ",", "}")
    val line =
      f"""{"sf":"$sfDir","factor":$k,"runs":$runs,"x1":${j(x1)},"x$k":${j(xk)},"ratio":${j(ratio)}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_SCALEUP_OUT", "BENCH_SCALEUP.json")),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
