package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class QuantizedOuterFlatSpec extends SparkSpec {

  private def df(t: DataType, rows: Seq[Seq[Any]], nullable: Boolean = false) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(v => Row(v))),
      StructType(Seq(StructField("v", ArrayType(t, containsNull = nullable)))))

  private val doubles = Seq.tabulate(8)(i =>
    Seq.tabulate(6)(d => math.sin(i * 1.9 + d * 0.61) * (d + 0.5)))

  // the interpreted formulation the native expression replaces —
  // bit-identical by construction (floor(x*scale+0.5) then long mult)
  private def hofForm(scale: Long) = {
    val xq = transform(col("v").cast("array<double>"),
      x => floor(x * scale.toDouble + 0.5).cast("long"))
    flatten(transform(xq, xi => transform(xq, xj => xi * xj)))
  }

  test("matches the nested-HOF formulation exactly on doubles") {
    val out = df(DoubleType, doubles).select(
      GraftFunctions.quantizedOuterFlat(col("v"), 128L).as("fast"),
      hofForm(128L).as("hof")).collect()
    out.foreach(r => r.getSeq[Long](0) shouldBe r.getSeq[Long](1))
  }

  test("matches the nested-HOF formulation exactly on floats") {
    val floats = doubles.map(_.map(x => x.asInstanceOf[Double].toFloat))
    val out = df(FloatType, floats).select(
      GraftFunctions.quantizedOuterFlat(col("v"), 128L).as("fast"),
      hofForm(128L).as("hof")).collect()
    out.foreach(r => r.getSeq[Long](0) shouldBe r.getSeq[Long](1))
  }

  test("interpreted eval equals codegen (collect vs driver-side eval)") {
    // force the interpreted path through a no-codegen eval of the same
    // expression and compare against the codegen'd pipeline result
    val expr = QuantizedOuterFlat(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        doubles.head.map(_.asInstanceOf[Double]).toArray,
        ArrayType(DoubleType, containsNull = false)), 128L)
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val codegen = df(DoubleType, doubles.take(1))
      .select(GraftFunctions.quantizedOuterFlat(col("v"), 128L)).head()
      .getSeq[Long](0)
    interp.toSeq shouldBe codegen
  }

  test("shape and values on a hand case") {
    // v = (1.0, -0.5), scale 2 -> q = (2, -1); flat = [4, -2, -2, 1]
    val out = df(DoubleType, Seq(Seq(1.0, -0.5)))
      .select(GraftFunctions.quantizedOuterFlat(col("v"), 2L)).head()
      .getSeq[Long](0)
    out shouldBe Seq(4L, -2L, -2L, 1L)
  }

  test("null vector yields null; null element nulls the result") {
    df(DoubleType, doubles.take(1))
      .select(GraftFunctions.quantizedOuterFlat(
        lit(null).cast("array<double>"), 128L))
      .head().isNullAt(0) shouldBe true
    val rows = Seq(Seq[Any](1.0, null, 3.0), Seq[Any](1.0, 2.0, 3.0))
    val out = df(DoubleType, rows, nullable = true)
      .select(GraftFunctions.quantizedOuterFlat(col("v"), 128L)).collect()
    out(0).isNullAt(0) shouldBe true
    out(1).getSeq[Long](0) should have size 9
  }

  test("stays inside whole-stage codegen (no CodegenFallback)") {
    val plan = df(DoubleType, doubles)
      .select(GraftFunctions.quantizedOuterFlat(col("v"), 128L).as("o"))
      .queryExecution.executedPlan
    // the starred Project = fused into a WholeStageCodegenExec span; a
    // CodegenFallback expression would leave an unstarred Project
    val fused = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    withClue(plan.toString) { fused should not be empty }
  }
}
