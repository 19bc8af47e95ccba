package graft

import graft.ops.ReferenceQueries
import org.apache.spark.sql.functions._

class ReferenceQueriesSpec extends SparkSpec {

  test("q1 returns only rows within one hour of max ts") {
    val df = ReferenceQueries.q1TimeFilter(spark, sf01).cache()
    assert(df.count() > 0)
    val Array(maxAll) = Tables.events(spark, sf01).agg(max("ts")).collect().map(_.getTimestamp(0))
    val minKept = df.agg(min("ts")).collect()(0).getTimestamp(0)
    assert(maxAll.getTime - minKept.getTime <= 3600 * 1000L)
    df.unpersist()
  }

  test("q2 covers all 24 hour buckets with bounded averages") {
    val rows = ReferenceQueries.q2HourlyAvg(spark, sf01).collect()
    assert(rows.length == 24)
    // operators return unsorted results — sort is SparkEntry's job
    assert(rows.map(_.getInt(0)).sorted.toSeq == (0 until 24))
  }

  test("q3 cube grand-total row equals table count") {
    val cube = ReferenceQueries.q3UnionCube(spark, sf01)
    val grand = cube.filter(col("room").isNull && col("hour_bucket").isNull).collect()
    assert(grand.length == 1)
    assert(grand(0).getAs[Long]("count_readings") ==
      Tables.events(spark, sf01).count())
  }

  test("q3 cube per-room subtotals sum to grand total") {
    val cube = ReferenceQueries.q3UnionCube(spark, sf01).cache()
    val perRoom = cube.filter(col("room").isNotNull && col("hour_bucket").isNull)
      .agg(sum("count_readings")).collect()(0).getLong(0)
    val grand = cube.filter(col("room").isNull && col("hour_bucket").isNull)
      .collect()(0).getAs[Long]("count_readings")
    assert(perRoom == grand)
    cube.unpersist()
  }

  test("q4 joins only hours present on both sides") {
    val df = ReferenceQueries.q4JoinAggs(spark, sf001)
    val n = df.count()
    assert(n > 0 && n <= 24)
  }
}
