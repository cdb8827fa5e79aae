package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native regex match counter.
  *
  * Spark's `regexp_count` is RuntimeReplaceable sugar for
  * `size(regexp_extract_all(str, re, 0))` — the physical plan builds an
  * ArrayData of every match (for a token-count pattern, every token in
  * the document as a fresh UTF8String) only to take its length. This
  * expression is the count alone: one compiled-pattern matcher walk per
  * row, nothing allocated but the matcher. Zero-width patterns (e.g.
  * the `(?=...)` overlapping-trigram lookaheads in `langIdNgram`) are
  * counted per start position, exactly as `Matcher.find` enumerates
  * them — the same walk `regexp_extract_all` does, so counts are
  * identical by construction.
  *
  * The pattern is a constructor constant (every graft call site uses a
  * literal), compiled once per expression instance and shared by the
  * generated code via a reference object.
  *
  * Null semantics: null text -> null (UnaryExpression default), same as
  * `regexp_count`.
  */
case class RegexpTally(child: Expression, pattern: String) extends UnaryExpression {

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"regexp_tally expects a string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    RegexpTally.count(compiled, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("tallyPattern", compiled, "java.util.regex.Pattern")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.expressions.RegexpTally.count($patRef, $c);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RegexpTally =
    copy(child = newChild)

  override def prettyName: String = "regexp_tally"
}

object RegexpTally {
  def count(pattern: java.util.regex.Pattern, text: UTF8String): Int = {
    val m = pattern.matcher(text.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }
}
