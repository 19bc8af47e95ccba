package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity between two
  * `array<float>` embedding columns, computed in double precision.
  *
  * This is the engine's one custom-Expression hot path (SURVEY.md §7.3):
  * the composable alternative — `aggregate(zip_with(a, b, …))` — builds an
  * intermediate array per row and runs three lambda interpreters; this
  * expression is a single fused loop over the unsafe array data with no
  * allocation, and `doGenCode` keeps it inside whole-stage codegen.
  * Semantics match the higher-order formulation bit-for-bit (same
  * left-to-right double accumulation), so the DuckDB oracles for the knn
  * queries verify it directly.
  *
  * Mismatched lengths yield null (defensive; the fixtures are
  * fixed-dim), and so does a null ELEMENT on either side — matching the
  * NULL propagation of the higher-order form (zip_with over a null slot
  * is null, the aggregate fold then stays null), which previously
  * diverged: ArrayData.getFloat reads a null slot as 0.0f, silently
  * skewing the score instead of nulling it.
  *
  * A ZERO-NORM side also yields null — the family's canonical
  * "similarity undefined" law: a bare division would THROW
  * DIVIDE_BY_ZERO in ANSI Spark (floating-point included — verified
  * empirically) and produce NaN in DuckDB, which sorts ABOVE every
  * real value; null instead sorts last under DESC in both engines
  * (zero vectors are near nothing) and is dropped by `>= threshold`
  * filters. `Similarity.cosineHof` guards its divisors and the DuckDB
  * twins `nullif` theirs so all three forms agree.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      var anyNull = false
      while (i < n && !anyNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) anyNull = true
        else {
          val xv = x.getFloat(i).toDouble
          val yv = y.getFloat(i).toDouble
          dot += xv * yv; nx += xv * xv; ny += yv * yv
        }
        i += 1
      }
      if (anyNull || nx == 0.0 || ny == 0.0) null
      else java.lang.Double.valueOf(dot / math.sqrt(nx) / math.sqrt(ny))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    final double $xv = (double) $a.getFloat($i);
         |    final double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($nx == 0.0 || $ny == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / java.lang.Math.sqrt($nx) / java.lang.Math.sqrt($ny);
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  private val reg = new Registration

  /** Per-session idempotent SQL registration ([[Registration]] — one
    * definition of the once-per-session contract); after this,
    * `expr("cosine_sim(a, b)")` resolves to the native expression.
    * (Production sessions can instead install [[graft.GraftExtensions]]
    * via `spark.sql.extensions`.) */
  def register(spark: SparkSession): Unit = reg.once(spark) {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
  }
}
