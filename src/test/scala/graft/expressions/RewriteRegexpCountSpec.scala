package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RewriteRegexpCountSpec extends SparkSpec {

  private def cleanup(): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(r => r == RewriteHofCosine || r == RewriteRegexpCount)

  test("size(regexp_extract_all(s, p, 0)) rewrites to regexp_tally, same results") {
    import spark.implicits._
    GraftFunctions.installOptimizations(spark)
    try {
      // parallelized, not a LocalRelation: ConvertToLocalRelation
      // would constant-fold the projection before the plan can show
      // the rewritten expression
      val d = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq("a1 b2 c3", "", "no digits",
          null.asInstanceOf[String]).map(org.apache.spark.sql.Row(_))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("s",
            org.apache.spark.sql.types.StringType))))
      val q = d.select(expr("size(regexp_extract_all(s, '[0-9]', 0))").as("n"))
      q.queryExecution.optimizedPlan.toString should include("regexp_tally")
      q.queryExecution.optimizedPlan.toString should not include "regexp_extract_all"
      val got = q.collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
      // null input propagates null (non-legacy size semantics preserved)
      got.toSeq shouldBe Seq(Some(3), Some(0), Some(0), None)
    } finally cleanup()
  }

  test("group-index and dynamic-pattern forms are left alone") {
    import spark.implicits._
    GraftFunctions.installOptimizations(spark)
    try {
      val d = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row("a1", "[0-9]"))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("s",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("p",
            org.apache.spark.sql.types.StringType))))
      // group index 1 (the spark default) must not rewrite
      val g1 = d.select(expr("size(regexp_extract_all(s, '([a-z])[0-9]'))").as("n"))
      g1.queryExecution.optimizedPlan.toString should not include "regexp_tally"
      // non-literal pattern must not rewrite (tally compiles once)
      val dyn = d.select(expr("size(regexp_extract_all(s, p, 0))").as("n"))
      dyn.queryExecution.optimizedPlan.toString should not include "regexp_tally"
      g1.collect(); dyn.collect()
    } finally cleanup()
  }
}
