package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: asymmetric-distance-computation (ADC)
  * scoring — `Σ_m dtabs[m][codes[m]]`, the inner loop of every product-
  * quantization ANN query (Jégou et al., TPAMI 2011: one M-entry code
  * word per corpus row, one M×K lookup table per query).
  *
  * Replaces the composable
  * `aggregate(zip_with(codes, dtabs, (c, t) -> element_at(t, c + 1)), 0D, (acc, v) -> acc + v)`
  * on the hot path: the higher-order form allocates a zipped array per
  * (corpus row × query) pair and runs lambda interpreters OUTSIDE
  * whole-stage codegen, while this is one fused loop inside it — the
  * same rationale as [[CosineSimilarity]]/[[L2Distance]], applied to the
  * PQ family where the expression evaluates |corpus|×|queries| times.
  *
  * NULL contract matches the higher-order form bit-for-bit FOR
  * IN-RANGE codes — the domain `pqQuantize` produces (codes are
  * `array_position` results minus 1, always in [0, K)): mismatched
  * lengths → null (zip_with pads with null and the fold absorbs it),
  * and any null element on either side → null. Accumulation is the
  * same left-to-right double fold. OUT-OF-RANGE codes diverge by
  * design, in adc_sum's favor under this project's ANSI-on sessions:
  * `element_at(t, c + 1)` THROWS for c = -1 (index 0 invalid) and for
  * c past the table end (INVALID_ARRAY_INDEX under ANSI; only with
  * ANSI off does it return null), and indexes from the array END at
  * c ≤ -2 — all nonsense for a PQ code; adc_sum treats ANY
  * out-of-range c as → null instead of killing the query.
  */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_sum expects (array<int>, array<array<double>>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_sum"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tabs = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    if (n != tabs.numElements()) null
    else {
      var s = 0.0
      var i = 0
      var anyNull = false
      while (i < n && !anyNull) {
        if (codes.isNullAt(i) || tabs.isNullAt(i)) anyNull = true
        else {
          val t = tabs.getArray(i)
          val c = codes.getInt(i)
          if (c < 0 || c >= t.numElements() || t.isNullAt(c)) anyNull = true
          else s += t.getDouble(c)
        }
        i += 1
      }
      if (anyNull) null else java.lang.Double.valueOf(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    final org.apache.spark.sql.catalyst.util.ArrayData $t = $b.getArray($i);
         |    final int $c = $a.getInt($i);
         |    if ($c < 0 || $c >= $t.numElements() || $t.isNullAt($c)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += $t.getDouble($c);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

object AdcSum {
  private val reg = new Registration

  /** Per-session idempotent SQL registration ([[Registration]]). */
  def register(spark: SparkSession): Unit = reg.once(spark) {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "adc_sum", exprs => AdcSum(exprs(0), exprs(1)), "scala_udf")
  }
}
