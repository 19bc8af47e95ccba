package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{AdcSum, CosineSimilarity, L2Distance}

/** SparkSessionExtensions entry point: install the engine's native
  * functions into any session with
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  * (Driver-created sessions that can't set the conf use
  * `CosineSimilarity.register(spark)` instead — same expression.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("l2_dist"),
      new ExpressionInfo(classOf[L2Distance].getName, "l2_dist"),
      (exprs: Seq[Expression]) => L2Distance(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("adc_sum"),
      new ExpressionInfo(classOf[AdcSum].getName, "adc_sum"),
      (exprs: Seq[Expression]) => AdcSum(exprs(0), exprs(1))))
  }
}
