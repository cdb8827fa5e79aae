package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Within-document duplicate-LINE statistics, natively — the line-level
  * half of Gopher-style repetition filters (Rae et al. 2021, table A1:
  * "duplicate line fraction" and "duplicate line character fraction"),
  * complementing `WordGramStats`' n-gram half:
  *
  *   struct(n_lines     non-empty lines ('\n'-separated, exact bytes),
  *          n_distinct  distinct line contents among them,
  *          line_chars  total characters across all line instances,
  *          dup_chars   characters in instances BEYOND each line's
  *                      first occurrence)
  *
  * from which callers derive `dup_line_frac = (n_lines - n_distinct) /
  * n_lines` and `dup_char_frac = dup_chars / line_chars`.
  *
  * Same design rationale as `WordGramStats`: the relational shape
  * (explode lines -> count per (doc, line) -> re-aggregate) shuffles
  * the corpus' full line volume twice for a per-row property; this is
  * one pass + one hash map inside the scan projection — nothing
  * shuffles at any corpus size. Lines are compared EXACTLY (no case
  * fold, no trim) and split on '\n' alone ('\r' stays in the line), so
  * an external engine reproduces the counts with a plain
  * string-split — the portability contract the q111 oracle relies on.
  * Character counts are Unicode code points (what Spark `char_length`
  * and DuckDB `len` both count), not UTF-16 units.
  *
  * Null semantics: null text or no non-empty lines -> (0, 0, 0, 0),
  * NOT null.
  */
case class LineDupStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LineDupStats.schema
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"line_dup_stats expects a string input, got ${other.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) LineDupStats.ZERO
    else LineDupStats.stats(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        InternalRow ${ev.value} = ${c.isNull} ?
          graft.expressions.LineDupStats.ZERO() :
          graft.expressions.LineDupStats.stats(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LineDupStats =
    copy(child = newChild)

  override def prettyName: String = "line_dup_stats"
}

object LineDupStats {

  val schema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))

  val ZERO: InternalRow = new GenericInternalRow(Array[Any](0, 0, 0L, 0L))

  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    val counts = new java.util.HashMap[String, Integer]()
    var nLines = 0
    var lineChars = 0L
    val len = s.length
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == '\n') {
        if (i > start) {
          val line = s.substring(start, i)
          nLines += 1
          lineChars += line.codePointCount(0, line.length)
          counts.merge(line, Integer.valueOf(1),
            (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
        }
        start = i + 1
      }
      i += 1
    }
    if (nLines == 0) return ZERO
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue
      if (c > 1)
        dupChars += (c - 1).toLong * e.getKey.codePointCount(0, e.getKey.length)
    }
    new GenericInternalRow(Array[Any](nLines, counts.size, lineChars, dupChars))
  }
}
