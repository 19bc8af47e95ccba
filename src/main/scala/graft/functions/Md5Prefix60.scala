package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 60 bits of md5(s) as a
  * non-negative long — numerically identical to
  * `conv(substring(md5(s), 1, 15), 16, 10)` (the first 15 hex digits of
  * the digest are the first 7.5 bytes big-endian, i.e. the first 8 bytes
  * as an unsigned value shifted right by 4), but computed straight from
  * the digest bytes with no hex-string materialization and no base-16
  * re-parse. This is the MinHash shingle-hash hot path (`Dedup
  * .minhashSlots`): one call per shingle row, measured ~25 % faster than
  * the string round-trip at sf0.1 while the DuckDB oracle — which replays
  * the hex fold — keeps matching bit-for-bit because the VALUE is
  * unchanged.
  *
  * Profiling-justified like [[CosineSimilarity]] (SURVEY.md §7.3): the
  * composable form already works and stays as the documented equivalence
  * in the spec; the custom expression exists only to delete per-row
  * allocations in an operator that sees one row per shingle (≈ tokens ×
  * corpus rows at 100 TB).
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 expects string, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  // MessageDigest instances are not thread-safe; executors run many tasks
  // per JVM, so keep one per thread instead of allocating per row.
  private val digests = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** First 60 bits of md5(bytes of s): first 8 digest bytes big-endian,
    * logically right-shifted 4 — equals the integer value of the first 15
    * hex digits of the standard hex rendering. */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val digest = md.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) {
      acc = (acc << 8) | (digest(i) & 0xffL)
      i += 1
    }
    acc >>> 4
  }

  private val reg = new Registration

  /** Per-session idempotent SQL registration ([[Registration]]); after
    * this, `expr("md5_prefix60(s)")` resolves to the native expression. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    reg.once(spark) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "md5_prefix60", exprs => Md5Prefix60(exprs(0)), "scala_udf")
    }
}
