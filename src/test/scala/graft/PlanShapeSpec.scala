package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Registry-wide plan-shape invariant: no query may plan a Window with an
  * empty partition spec. An unpartitioned window funnels its entire input
  * relation through ONE task (Spark itself warns `WindowExec: No Partition
  * Defined`), which is the canonical single-node scale-killer at 100 TB —
  * global top-k must plan as `TakeOrderedAndProject` (per-partition heaps)
  * instead, with ranks re-derived inside the bounded result frame. This
  * sweep walks the optimized logical plan of EVERY registered query
  * (subqueries included) so a future operator cannot reintroduce the
  * pattern silently. */
class PlanShapeSpec extends SparkSpec {

  test("no registry query plans an unpartitioned window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf001).queryExecution.optimizedPlan
        val bad = (plan +: plan.subqueriesAll).flatMap(_.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        })
        if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window (single-task global sort) in: ${offenders.mkString(", ")}")
  }
}
