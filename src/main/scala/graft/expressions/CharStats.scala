package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-distribution statistics, natively — the
  * gibberish / low-diversity screen (binary blobs pasted as text, key
  * dumps, one-character padding floods) that complements the word-level
  * repetition screens (`WordGramStats`, `LineDupStats`):
  *
  *   struct(n_cp        total Unicode code points,
  *          n_distinct  distinct code points among them,
  *          top_cnt     occurrences of the most frequent code point,
  *          sum_sq      Σ count(cp)² over distinct code points)
  *
  * from which callers derive `top_share = top_cnt / n_cp` (padding
  * floods) and the Simpson concentration `Σ p² = sum_sq / n_cp²`
  * (1 − Σp² is the classic diversity index). Both are RATIONAL in the
  * counts — no logarithm — so an external engine reproduces the derived
  * doubles bit-for-bit from the same integers (the q119 oracle's
  * portability contract; Shannon entropy would hang cross-engine
  * hash-matching on libm `ln` ulps).
  *
  * Same design rationale as the other one-pass text expressions: the
  * relational shape (explode characters → count per (doc, cp) →
  * re-aggregate) shuffles the corpus' full CHARACTER volume — an order
  * of magnitude more rows than the token explodes — for a per-row
  * property; this is one pass + one int hash map inside the scan
  * projection. Nothing shuffles at any corpus size.
  *
  * Characters are Unicode code points (what Spark `char_length` and
  * DuckDB `len` both count), not UTF-16 units; a surrogate pair is one
  * character with count 1.
  *
  * Null semantics: null or empty text → (0, 0, 0, 0), NOT null.
  */
case class CharStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharStats.schema
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_stats expects a string input, got ${other.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) CharStats.ZERO
    else CharStats.stats(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        InternalRow ${ev.value} = ${c.isNull} ?
          graft.expressions.CharStats.ZERO() :
          graft.expressions.CharStats.stats(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)

  override def prettyName: String = "char_stats"
}

object CharStats {

  val schema: StructType = StructType(Seq(
    StructField("n_cp", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_cnt", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))

  val ZERO: InternalRow = new GenericInternalRow(Array[Any](0, 0, 0, 0L))

  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    if (s.isEmpty) return ZERO
    val counts = new java.util.HashMap[Integer, Integer]()
    var nCp = 0
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      nCp += 1
      counts.merge(Integer.valueOf(cp), Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      i += Character.charCount(cp)
    }
    var topCnt = 0
    var sumSq = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue
      if (c > topCnt) topCnt = c
      sumSq += c.toLong * c
    }
    new GenericInternalRow(Array[Any](nCp, counts.size, topCnt, sumSq))
  }
}
