package graft.expressions

import graft.SparkSpec
import graft.functions.VectorFns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class RewriteHofCosineSpec extends SparkSpec {

  private def floats(rows: (Seq[Float], Seq[Float])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b) => Row(a, b) }),
      StructType(Seq(StructField("a", ArrayType(FloatType)),
        StructField("b", ArrayType(FloatType)))))

  test("rule rewrites the HOF pattern to the native expression, same results") {
    GraftFunctions.installOptimizations(spark)
    try {
      val d = floats(
        (Seq(1.5f, -2.25f, 3.125f), Seq(4.0f, 5.0f, -6.5f)),
        (Seq(0.5f, 0.25f), Seq(0.5f, 0.25f)))
      val q = d.select(VectorFns.cosine(col("a"), col("b")).as("c"))

      q.queryExecution.optimizedPlan.toString should include("cosine_similarity")
      // float->double input cast is stripped: native expr reads floats
      q.queryExecution.optimizedPlan.toString should not include "aggregate(zip_with"

      val rewritten = q.collect().map(_.getDouble(0))
      val native = d.select(VectorFns.cosineFast(col("a"), col("b"))).collect().map(_.getDouble(0))
      rewritten shouldBe native
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteHofCosine)
    }
  }

  test("non-matching shapes are left alone") {
    GraftFunctions.installOptimizations(spark)
    try {
      val d = floats((Seq(1f, 2f), Seq(3f, 4f)))
      // dot over different arrays than the norms -> must NOT rewrite
      val q = d.select((VectorFns.dot(col("a"), col("b")) /
        (VectorFns.l2Norm(col("a")) * VectorFns.l2Norm(col("a")))).as("x"))
      q.queryExecution.optimizedPlan.toString should not include "cosine_similarity"
      q.collect() // still evaluates
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteHofCosine)
    }
  }
}
