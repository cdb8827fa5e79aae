package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class VectorFnsSpec extends SparkSpec {

  private def vecs(pairs: (Seq[Double], Seq[Double])*) = {
    import org.apache.spark.sql.types._
    val t = ArrayType(DoubleType)
    spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map { case (a, b) => Row(a, b) }),
      StructType(Seq(StructField("a", t), StructField("b", t))))
  }

  test("dot, norm, cosine on known vectors") {
    val d = vecs((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
    val Row(dot: Double, na: Double, cos: Double) = d.select(
      VectorFns.dot(col("a"), col("b")), VectorFns.l2Norm(col("a")),
      VectorFns.cosine(col("a"), col("b"))).head()
    dot shouldBe 32.0
    na shouldBe math.sqrt(14.0) +- 1e-12
    cos shouldBe 32.0 / (math.sqrt(14) * math.sqrt(77)) +- 1e-12
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val d = vecs((Seq(1.0, 1.0), Seq(1.0, 1.0)), (Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val out = d.select(VectorFns.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    out(0) shouldBe 1.0 +- 1e-12
    out(1) shouldBe 0.0 +- 1e-12
  }

  test("sqDist") {
    val d = vecs((Seq(0.0, 0.0), Seq(3.0, 4.0)))
    d.select(VectorFns.sqDist(col("a"), col("b"))).head().getDouble(0) shouldBe 25.0
  }

  test("srpBucket deterministic and bounded") {
    val d = vecs((Seq.tabulate(8)(_.toDouble), Seq.tabulate(8)(_.toDouble)))
    val Row(b1: Long, b2: Long) = d.select(
      VectorFns.srpBucket(col("a"), 4, 8), VectorFns.srpBucket(col("b"), 4, 8)).head()
    b1 shouldBe b2
    b1 should (be >= 0L and be < 16L)
  }
}
