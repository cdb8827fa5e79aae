package graft.expressions

import graft.SparkSpec
import graft.functions.VectorFns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class SrpBandKeysSpec extends SparkSpec {

  private def df(t: DataType, rows: Seq[Seq[Any]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(v => Row(v))),
      StructType(Seq(StructField("v", ArrayType(t)))))

  private val doubles = Seq.tabulate(10)(i =>
    Seq.tabulate(16)(d => math.sin(i * 2.3 + d * 0.7) * (d + 1)))

  test("matches the HOF formulation exactly on doubles") {
    val out = df(DoubleType, doubles).select(
      VectorFns.srpBandKeysFast(col("v"), 3, 5, 16).as("fast"),
      VectorFns.srpBandKeys(col("v"), 3, 5, 16).as("hof")).collect()
    out.foreach(r => r.getSeq[String](0) shouldBe r.getSeq[String](1))
  }

  test("matches the HOF formulation exactly on floats") {
    val floats = doubles.map(_.map(x => x.asInstanceOf[Double].toFloat))
    val out = df(FloatType, floats).select(
      VectorFns.srpBandKeysFast(col("v"), 2, 8, 16).as("fast"),
      VectorFns.srpBandKeys(col("v"), 2, 8, 16).as("hof")).collect()
    out.foreach(r => r.getSeq[String](0) shouldBe r.getSeq[String](1))
  }

  test("band 0 at r planes equals the single srpBucket value") {
    val out = df(DoubleType, doubles).select(
      VectorFns.srpBandKeysFast(col("v"), 1, 6, 16).getItem(0).as("k"),
      VectorFns.srpBucket(col("v"), 6, 16).as("b")).collect()
    out.foreach(r => r.getString(0) shouldBe s"0:${r.getLong(1)}")
  }

  test("null vector yields null") {
    val out = df(DoubleType, doubles.take(1))
      .select(VectorFns.srpBandKeysFast(lit(null).cast("array<double>"), 2, 4, 16))
      .head()
    out.isNullAt(0) shouldBe true
  }

  test("null element yields null result (not a 0.0-read bucket)") {
    val rows = Seq(Row(Seq[Any](1.0, null, 3.0)), Row(Seq[Any](1.0, 2.0, 3.0)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("v", ArrayType(DoubleType, containsNull = true)))))
    val out = d.select(VectorFns.srpBandKeysFast(col("v"), 2, 4, 3).as("k"))
      .collect()
    out(0).isNullAt(0) shouldBe true
    out(1).isNullAt(0) shouldBe false
    out(1).getSeq[String](0) should have size 2
  }

  test("registered as a SQL function") {
    GraftFunctions.register(spark)
    val keys = spark.sql(
      "SELECT srp_band_keys(array(1.0d, -2.0d, 3.0d), 2, 4, 3) AS k")
      .head().getSeq[String](0)
    keys should have size 2
    keys.head should startWith("0:")
    keys(1) should startWith("1:")
  }
}
