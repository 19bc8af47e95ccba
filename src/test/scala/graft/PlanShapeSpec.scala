package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Registry-wide plan-shape invariants, swept over EVERY registered
  * query in one pass so a future operator cannot reintroduce a
  * scale-killer silently:
  *
  *  1. No Window with an empty partition spec. An unpartitioned window
  *     funnels its entire input through ONE task (Spark itself warns
  *     `WindowExec: No Partition Defined`) — global top-k must plan as
  *     `TakeOrderedAndProject` (per-partition heaps) instead, with ranks
  *     re-derived inside the bounded result frame.
  *
  *  2. No CartesianProduct in the physical plan. Every cross join in the
  *     engine pairs a large relation with a BROADCAST small side
  *     (1-row aggregates, k-row model state, dimension tables), planning
  *     as BroadcastNestedLoopJoin; a CartesianProductExec means both
  *     sides were materialized and partition-paired — n·m shuffle work
  *     that no operator here should ever need.
  *
  *  3. No oracled query OUTPUTS a wider-than-int64 exact integer
  *     (DecimalType precision > 18). The driver's result hasher is
  *     physical-type-sensitive: a Spark DECIMAL(38,0) output column
  *     hash-mismatches a DuckDB BIGINT even when every value is equal —
  *     the Spark-side mirror of the DuckDB HUGEINT class that kept the
  *     DSIR family driver-red for two rounds (tools/check.py's
  *     FAIL-type gate is the DuckDB side). Wide decimals are fine
  *     INTERNALLY (dsirKl sums in DECIMAL(38,0) for exactness); the
  *     final projection must cast down to BIGINT.
  */
class PlanShapeSpec extends SparkSpec {

  test("no registry query plans an unpartitioned window or a cartesian product") {
    val windowOffenders = Seq.newBuilder[String]
    val cartesianOffenders = Seq.newBuilder[String]
    val wideIntOffenders = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val qe = fn(spark, sf001).queryExecution
      val opt = qe.optimizedPlan
      val badWindow = (opt +: opt.subqueriesAll).flatMap(_.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      })
      if (badWindow.nonEmpty) windowOffenders += name
      val phys = qe.executedPlan
      val badCartesian = (phys +: phys.subqueriesAll).flatMap(_.collect {
        case p if p.nodeName.contains("CartesianProduct") => p
      })
      if (badCartesian.nonEmpty) cartesianOffenders += name
      if (SparkEntry.oracleSql.contains(name))
        qe.analyzed.schema.fields.foreach {
          case f if f.dataType.isInstanceOf[
              org.apache.spark.sql.types.DecimalType] &&
            f.dataType.asInstanceOf[
              org.apache.spark.sql.types.DecimalType].precision > 18 =>
            wideIntOffenders += s"$name.${f.name}: ${f.dataType}"
          case _ => ()
        }
    }
    assert(windowOffenders.result().isEmpty,
      s"unpartitioned Window (single-task global sort) in: " +
        s"${windowOffenders.result().mkString(", ")}")
    assert(cartesianOffenders.result().isEmpty,
      s"un-broadcast CartesianProduct in: " +
        s"${cartesianOffenders.result().mkString(", ")}")
    assert(wideIntOffenders.result().isEmpty,
      s"wider-than-int64 output column (driver hash is type-sensitive; " +
        s"CAST the final projection to BIGINT): " +
        s"${wideIntOffenders.result().mkString(", ")}")
  }

  test("rowsOnly and oracleSql partition the registry exactly") {
    // Every registered query is either oracled or DECLARED rows-only;
    // nothing falls through by omission, and the two sets never overlap.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val r = SparkEntry.rowsOnly
    assert((o intersect r).isEmpty, s"both oracled and rows-only: ${o intersect r}")
    assert((o union r) == q,
      s"unaccounted queries: ${q diff (o union r)}; stale entries: ${(o union r) diff q}")
  }
}
