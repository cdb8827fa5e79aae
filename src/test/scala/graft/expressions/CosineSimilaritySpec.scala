package graft.expressions

import graft.SparkSpec
import graft.functions.VectorFns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class CosineSimilaritySpec extends SparkSpec {

  private def df(t: DataType, rows: Seq[(Seq[Any], Seq[Any])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b) => Row(a, b) }),
      StructType(Seq(StructField("a", ArrayType(t)), StructField("b", ArrayType(t)))))

  test("matches the HOF formulation bit-for-bit on doubles") {
    val d = df(DoubleType, Seq(
      (Seq(1.0, 2.0, 3.0), Seq(-4.0, 5.5, 6.25)),
      (Seq(0.1, 0.2), Seq(0.3, 0.7))))
    val out = d.select(
      VectorFns.cosineFast(col("a"), col("b")).as("fast"),
      VectorFns.cosine(col("a"), col("b")).as("hof")).collect()
    out.foreach(r => r.getDouble(0) shouldBe r.getDouble(1))
  }

  test("matches the HOF formulation bit-for-bit on floats") {
    val d = df(FloatType, Seq(
      (Seq(1.5f, -2.25f, 3.125f), Seq(4.0f, 5.0f, -6.5f))))
    val out = d.select(
      VectorFns.cosineFast(col("a"), col("b")).as("fast"),
      VectorFns.cosine(col("a"), col("b")).as("hof")).collect()
    out.foreach(r => r.getDouble(0) shouldBe r.getDouble(1))
  }

  test("null array yields null") {
    val d = df(DoubleType, Seq((Seq(1.0), Seq(1.0))))
      .select(VectorFns.cosineFast(lit(null).cast("array<double>"), col("b")))
    d.head().isNullAt(0) shouldBe true
  }

  test("registered SQL function works and rejects bad types") {
    GraftFunctions.register(spark)
    spark.sql("SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head().getDouble(0) shouldBe 1.0
    intercept[Exception] {
      spark.sql("SELECT cosine_similarity('x', 1)").collect()
    }
  }

  test("identical vectors give 1.0 under codegen") {
    val d = df(FloatType, Seq((Seq(0.5f, 0.25f, 0.125f), Seq(0.5f, 0.25f, 0.125f))))
    d.select(VectorFns.cosineFast(col("a"), col("b"))).head().getDouble(0) shouldBe 1.0 +- 1e-12
  }
}
