package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke driver: runs SparkEntry.entry exactly as the round driver's
  * t1 check does (rows > 0 on sf0.001) and prints the formatted physical
  * plan so partitioning/broadcast decisions can be inspected per round.
  * Usage: sbt "runMain graft.Smoke [queryName]"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = args.headOption match {
      case Some(name) =>
        SparkEntry.queries(name)(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
      case None => SparkEntry.entry(spark)
    }
    df.explain("formatted")
    val rows = df.count()
    println(s"[smoke] rows=$rows")
    df.show(5, truncate = false)
    spark.stop()
  }
}
