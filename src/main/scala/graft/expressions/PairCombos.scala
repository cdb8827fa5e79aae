package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered pairs (i < j) of a sorted id array, as
  * `array<struct<id_a, id_b>>` — the in-bucket candidate expansion of
  * `Dedup.pairsInBuckets`, natively.
  *
  * The composable form — nested `transform` lambdas over `slice`s,
  * `flatten`ed — produces the identical pair list but pays interpreted
  * lambda dispatch and a slice allocation per element; this is one
  * nested loop. Order matches the HOF form (x fixed, then every later
  * y), so downstream explode/distinct behavior is unchanged.
  *
  * Bucket-size guard: m ids expand to m*(m-1)/2 pairs; a bucket past
  * ~46k ids would overflow the pair array (and means the banding is
  * degenerate — every doc identical under the band key). Failing with
  * the bucket size beats silently allocating gigabytes.
  */
case class PairCombos(child: Expression) extends UnaryExpression {

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id_a", elemType, nullable = false),
      StructField("id_b", elemType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pair_combos expects an array input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PairCombos.combos(input.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val etRef = ctx.addReferenceObj("pairElemType", elemType,
      "org.apache.spark.sql.types.DataType")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.expressions.PairCombos.combos($c, $etRef);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombos =
    copy(child = newChild)

  override def prettyName: String = "pair_combos"
}

object PairCombos {
  def combos(xs: ArrayData, et: DataType): GenericArrayData = {
    val arr = xs.toObjectArray(et)
    val n = arr.length
    require(n <= 46340,
      s"pair_combos bucket has $n ids (${n.toLong * (n - 1) / 2} pairs); " +
        "a bucket this wide means the banding key is degenerate — " +
        "re-band with more key bits instead of expanding it")
    val out = new Array[AnyRef](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(Array[Any](arr(i), arr(j))): InternalRow
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
