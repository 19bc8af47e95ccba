package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native mergeable sketch accumulators — SURVEY.md §7.3's single
  * justified custom-aggregate site. The composable formulations
  * (`TextAnalysis.kmvDistinct`'s window bottom-K, `cmsCellsOf`'s
  * explode+groupBy grid) stay as the documented equivalences in the
  * specs; these TypedImperativeAggregates exist to make the sketches
  * ONE-PASS with fixed-size partial states: each map task folds its rows
  * into a K-entry (KMV) or depth×width (CMS) buffer, and only those tiny
  * buffers move through the merge tree — the mergeable-summaries shape a
  * 1000-executor scan wants, with no per-row shuffle at all.
  */
object SketchAggs {
  private val reg = new Registration

  /** Per-session idempotent SQL registration ([[Registration]]); after
    * this, `expr("kmv_sketch(h)")` / `expr("cms_sketch(h)")` resolve to
    * the native aggregates (the analyzer wraps bare AggregateFunctions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    reg.once(spark) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "kmv_sketch", exprs => KmvSketch(exprs(0)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "cms_sketch", exprs => CmsSketch(exprs(0)), "scala_udf")
    }
}

/** Bottom-K distinct-hash summary (the KMV sketch state): keeps the K
  * smallest DISTINCT long hashes seen, as a sorted-ascending array.
  * Update dedupes via the tree set; merge is union-and-truncate — the
  * standard mergeable bottom-K. `element_at(sk, size(sk))` is hₖ and
  * `size(sk)` is n_seen, exactly the pair the KMV estimator needs, so
  * the aggregate is a drop-in for the rank≤K window formulation while
  * shuffling K values per (partition, group) instead of sorting. */
case class KmvSketch(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects bigint, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // full buffer + h >= current max: h can never enter the bottom-K
      // (an equal-to-max value is already present — the set holds
      // distinct longs), so skip the box + O(log k) insert-then-poll
      // churn that otherwise dominates the map-side fold once the
      // first K distinct hashes have landed
      if (buf.size < k || h < buf.last) {
        buf.add(h)
        if (buf.size > k) buf.pollLast(): Unit
      }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

/** Count-min sketch grid accumulator: a fixed depth×width cell array fed
  * per-occurrence hashes (already reduced mod SlotP). Each update
  * increments one bucket per row via the SAME decorrelated universal
  * hash family the composable grid uses (`Dedup.slotA/slotB`), merge is
  * element-wise addition, and eval flattens row-major — cell (j, b) at
  * index j·width + b — so the result is provably the `cmsCellsOf` grid
  * computed in one pass with a constant-size partial per task. */
case class CmsSketch(
    child: Expression,
    depth: Int = graft.ext.TextAnalysis.CmsDepth,
    width: Int = graft.ext.TextAnalysis.CmsWidth,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects bigint, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  @transient private lazy val as: Array[Long] =
    Array.tabulate(depth)(graft.ext.Dedup.slotA)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(depth)(graft.ext.Dedup.slotB)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < depth) {
        // floorMod, not %: an out-of-contract hash (negative, or an
        // unreduced 60-bit md5_prefix60 whose h·a product overflows
        // Long) must still yield a well-formed bucket — plain % went
        // negative, crashing at j = 0 and silently incrementing
        // ANOTHER depth-row's cell at j >= 1. For in-contract inputs
        // (h in [0, SlotP)) floorMod is bit-identical to %.
        val bucket = java.lang.Math.floorMod(
          java.lang.Math.floorMod(h * as(j) + bs(j), graft.ext.Dedup.SlotP),
          width.toLong).toInt
        buf(j * width + bucket) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}
