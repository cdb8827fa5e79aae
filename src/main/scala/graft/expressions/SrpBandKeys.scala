package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native banded-SRP LSH keys over an `array<float|double>` vector:
  * returns `bands` strings "b:value" where value packs the sign bits of
  * the band's `planesPerBand` hyperplane dot products.
  *
  * The composable formulation (`VectorFns.srpBandKeys`: one
  * `aggregate(zip_with(...))` per plane) is correct but interpreted —
  * bands*planesPerBand HOF passes per row, each paying boxed lambda
  * dispatch and a temp array. This expression is ONE fused primitive
  * loop inside whole-stage codegen: the vector is read once per plane
  * from the unsafe array, the ±1 coefficient matrix once per batch via
  * a broadcast reference object, no allocation beyond the key array.
  *
  * Per-plane accumulation is double-precision in index order —
  * bit-identical to the HOF form and to DuckDB's `list_dot_product`
  * over the same literal planes, so oracle hash-compares are unaffected
  * by the swap. Plane p = b*planesPerBand + j uses
  * `VectorFns.srpCoef(p, d)` — the ONE definition of the constants.
  *
  * Null semantics: null vector -> null (UnaryExpression default); a
  * null ELEMENT also nulls the whole result — the dot products are
  * undefined, and silently reading the element as 0.0 (what the raw
  * unsafe getters do) would bucket the vector arbitrarily. (The HOF
  * form's `when(dot >= 0, ...).otherwise(0)` maps a null dot to a 0
  * bit — an accident of when/otherwise, not a contract; the native
  * form makes the corruption visible as null instead.) Dims clamp to
  * the shorter of (dims, vector length), matching `zip_with`.
  */
case class SrpBandKeys(child: Expression, bands: Int, planesPerBand: Int,
                       dims: Int) extends UnaryExpression {

  require(bands > 0 && planesPerBand > 0 && planesPerBand <= 63,
    s"need 1..63 planes per band (a signed-long bit per plane), got $planesPerBand")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // parquet array schemas default to containsNull=true even when no row
  // holds one — rejecting them outright would break every real read
  // path, so nullable result + runtime element check instead
  private def elementsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull
  override def nullable: Boolean = child.nullable || elementsNullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_band_keys expects an array<float|double> input, got ${other.simpleString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // flattened ±1 coefficient matrix, plane-major: coefs[p*dims + d]
  @transient private lazy val coefs: Array[Double] = {
    val a = new Array[Double](bands * planesPerBand * dims)
    var p = 0
    while (p < bands * planesPerBand) {
      var d = 0
      while (d < dims) {
        a(p * dims + d) = graft.functions.VectorFns.srpCoef(p, d)
        d += 1
      }
      p += 1
    }
    a
  }

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = math.min(dims, xs.numElements())
    if (elementsNullable) {
      var d = 0
      while (d < n) {
        if (xs.isNullAt(d)) return null
        d += 1
      }
    }
    val f = isFloat
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var value = 0L
      var j = 0
      while (j < planesPerBand) {
        val off = (b * planesPerBand + j) * dims
        var acc = 0.0
        var d = 0
        while (d < n) {
          val x = if (f) xs.getFloat(d).toDouble else xs.getDouble(d)
          acc += x * coefs(off + d)
          d += 1
        }
        if (acc >= 0.0) value |= 1L << j
        j += 1
      }
      out(b) = UTF8String.fromString(s"$b:$value")
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("srpCoefs", coefs, "double[]")
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val value = ctx.freshName("value")
      val acc = ctx.freshName("acc")
      // when elements can be null, ev.isNull is a real variable (see
      // `nullable`) — scan first and null the result, matching eval
      val nullScan = if (elementsNullable) {
        val hasNull = ctx.freshName("hasNull")
        s"""
           |boolean $hasNull = false;
           |for (int $d = 0; $d < $n && !$hasNull; $d++) {
           |  if ($a.isNullAt($d)) $hasNull = true;
           |}
           |if ($hasNull) { ${ev.isNull} = true; } else {
         """.stripMargin
      } else ""
      val nullScanClose = if (elementsNullable) "}" else ""
      s"""
         |int $n = java.lang.Math.min($dims, $a.numElements());
         |$nullScan
         |org.apache.spark.unsafe.types.UTF8String[] $keys =
         |  new org.apache.spark.unsafe.types.UTF8String[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $value = 0L;
         |  for (int $j = 0; $j < $planesPerBand; $j++) {
         |    int $off = ($b * $planesPerBand + $j) * $dims;
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $acc += ((double) $a.$get($d)) * $cRef[$off + $d];
         |    }
         |    if ($acc >= 0.0) $value |= (1L << $j);
         |  }
         |  $keys[$b] = org.apache.spark.unsafe.types.UTF8String.fromString($b + ":" + $value);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
         |$nullScanClose
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBandKeys =
    copy(child = newChild)

  override def prettyName: String = "srp_band_keys"
}
