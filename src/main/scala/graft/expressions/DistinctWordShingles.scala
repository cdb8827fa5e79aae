package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of a document, natively — the codegen form
  * of `array_distinct(wordShingles(tokens(text), n))` (the shingle-set
  * side of `Dedup.ngramJaccard`).
  *
  * Tokenization is the shared `SignatureExprs.tokenize` (lowercase,
  * maximal non-whitespace runs); shingles are space-joined windows in
  * first-occurrence order, deduped with one linked hash set — exactly
  * `array_distinct`'s order. The HOF chain pays an interpreted lambda
  * per token (filter), per window (transform + slice allocation), and
  * a quadratic-ish array_distinct scan.
  *
  * Null semantics: null text -> EMPTY array, not null — `wordShingles`'
  * size guard is `when(size(toks) >= n, ...).otherwise(empty)` and a
  * null size falls into the otherwise branch. Fewer than n tokens ->
  * empty likewise.
  */
case class DistinctWordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle size must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"distinct_word_shingles expects a string input, got ${other.simpleString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) DistinctWordShingles.EMPTY
    else DistinctWordShingles.shingles(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = ${c.isNull} ?
          graft.expressions.DistinctWordShingles.EMPTY() :
          graft.expressions.DistinctWordShingles.shingles(${c.value}, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctWordShingles =
    copy(child = newChild)

  override def prettyName: String = "distinct_word_shingles"
}

object DistinctWordShingles {
  val EMPTY: GenericArrayData = new GenericArrayData(Array.empty[AnyRef])

  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val toks = SignatureExprs.tokenize(text)
    if (toks.length < n) return EMPTY
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(out)
  }
}
