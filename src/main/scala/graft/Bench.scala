package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main — the engine-side analog of the reference's timing
  * harness (`/root/reference/hive.py:101-136`: warm-up run + timed runs
  * per query). Differences, deliberate:
  *   - results are fully materialized through the `noop` sink (every
  *     column computed and serialized) instead of `.count()`, which would
  *     let Catalyst prune the payload columns and under-report work;
  *   - 1 warm-up + 3 timed runs, reporting the mean (the reference used
  *     30 runs over minutes-long Hive queries; Spark-side runs are
  *     sub-second so 3 suffices for a stable mean).
  *
  * Prints ONE JSON line: {"metric":"total","value":…,"unit":"sec",
  * "queries":{name:sec,…},"sf":…}.
  */
object Bench {
  /** Headline set: the reference's four queries plus one representative
    * per operator family (agg, multiway join, window, distinct, dedup,
    * minhash, text stats, knn). */
  val headline: Seq[String] = Seq(
    "q1_time_filter", "q2_hourly_avg", "q3_union_cube", "q4_join_aggs",
    "q_agg_pricing", "q_join_multiway", "q_window_rank", "q_count_distinct",
    "d_dedup_exact", "d_dedup_minhash", "d_text_stats", "e_knn_brute")

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        try {
          materialize(fn(spark, sfDir)) // warm-up (codegen + file listing)
          val times = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            materialize(fn(spark, sfDir))
            (System.nanoTime() - t0) / 1e9
          }
          name -> times.sum / runs
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            name -> -1.0
        }
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(f"""{"metric":"total","value":$total%.4f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
