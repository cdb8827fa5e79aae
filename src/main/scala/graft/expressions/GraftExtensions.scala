package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge

/** Registration of graft's native expressions.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.expressions.GraftExtensions` at
  *    session build time (the SparkSessionExtensions route), or
  *  - `GraftFunctions.register(spark)` programmatically on a live
  *    session.
  *
  * Either way the functions are callable from SQL
  * (`SELECT cosine_similarity(a, b)`) and the typed helpers in
  * `GraftFunctions` are usable from the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => RewriteHofCosine)
  }
}

object GraftFunctions {

  private[graft] val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))

  /** Register every graft function into a live session's registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }

  /** Install graft's optimizer rules on a live session (the
    * programmatic equivalent of the extensions route).
    */
  def installOptimizations(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteHofCosine))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofCosine

  /** Typed DataFrame-API handle on the native cosine expression. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
