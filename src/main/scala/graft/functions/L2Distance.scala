package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: Euclidean (L2) distance between two
  * numeric array columns, computed in double precision.
  *
  * Companion to [[CosineSimilarity]] — same rationale (the composable
  * `sqrt(aggregate(zip_with(a, b, …)))` allocates a zipped array per row
  * and runs lambda interpreters; this is one fused loop inside
  * whole-stage codegen) — and one generalization: each side may be
  * `array<float>` OR `array<double>`, because distance-to-centroid is the
  * hot pattern ([[graft.ext.Similarity.silhouette]], the IVF family) and
  * centroids are derived double arrays while the corpus is float.
  * Accumulation is the same left-to-right double fold as the
  * higher-order formulation, so swapping this in changes nothing
  * observable and the DuckDB oracles keep verifying it.
  *
  * Mismatched lengths yield null (defensive; fixtures are fixed-dim), and
  * so does a null ELEMENT on either side — matching the NULL propagation
  * of the higher-order `sqrt(aggregate(zip_with(…)))` form this expression
  * is documented bit-identical to (and [[CosineSimilarity]]'s contract).
  */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType) = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_dist expects array<float|double> on both sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_dist"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // hoisted off the interpreted per-row path (|corpus| × |centroids|
  // invocations re-ran two dataType pattern matches each); transient —
  // recomputed once per deserialized task, like every plan-static fact
  @transient private lazy val leftIsFloat = isFloat(left)
  @transient private lazy val rightIsFloat = isFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      val xf = leftIsFloat; val yf = rightIsFloat
      var s = 0.0
      var i = 0
      var anyNull = false
      while (i < n && !anyNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) anyNull = true
        else {
          val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
          val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
          val d = xv - yv
          s += d * d
        }
        i += 1
      }
      if (anyNull) null else java.lang.Double.valueOf(math.sqrt(s))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      def get(arr: String, fl: Boolean) =
        if (fl) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
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
         |    final double $d = ${get(a, isFloat(left))} - ${get(b, isFloat(right))};
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = java.lang.Math.sqrt($s);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)
}

object L2Distance {
  private val reg = new Registration

  /** Per-session idempotent SQL registration ([[Registration]]). */
  def register(spark: SparkSession): Unit = reg.once(spark) {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_dist", exprs => L2Distance(exprs(0), exprs(1)), "scala_udf")
  }
}
