package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Within-document n-gram repetition statistics, natively — the
  * per-row quality signals of Gopher-style repetition filters (Rae et
  * al. 2021, "Scaling Language Models", table A1: "duplicate n-gram
  * fraction" and "top n-gram fraction"):
  *
  *   struct(n_grams      total word n-gram windows,
  *          n_distinct   distinct n-grams among them,
  *          top_count    occurrences of the most frequent n-gram)
  *
  * from which callers derive `dup_fraction = 1 - n_distinct/n_grams`
  * and `top_fraction = top_count/n_grams`.
  *
  * The relational formulation (explode shingles -> count per (doc,
  * gram) -> re-aggregate per doc) shuffles the corpus' full n-gram
  * volume TWICE to compute what is a per-row property; this expression
  * is one tokenize + one hash-map pass inside the scan projection —
  * nothing shuffles at any corpus size. Tokenization is the shared
  * `SignatureExprs.tokenize` (lowercase, maximal non-whitespace runs),
  * identical to `DistinctWordShingles` and the MinHash signatures, so
  * n_distinct always equals `size(distinct_word_shingles(text, n))`.
  *
  * Null semantics: null text or fewer than n tokens -> (0, 0, 0), NOT
  * null — the HOF `wordShingles` size guard routes both to the empty
  * array, whose counts are zeros.
  */
case class WordGramStats(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle size must be positive, got $n")

  override def dataType: DataType = WordGramStats.schema
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_gram_stats expects a string input, got ${other.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WordGramStats.ZERO
    else WordGramStats.stats(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        InternalRow ${ev.value} = ${c.isNull} ?
          graft.expressions.WordGramStats.ZERO() :
          graft.expressions.WordGramStats.stats(${c.value}, $n);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordGramStats =
    copy(child = newChild)

  override def prettyName: String = "word_gram_stats"
}

object WordGramStats {

  val schema: StructType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false)))

  val ZERO: InternalRow = new GenericInternalRow(Array[Any](0, 0, 0))

  def stats(text: UTF8String, n: Int): InternalRow = {
    val toks = SignatureExprs.tokenize(text)
    if (toks.length < n) return ZERO
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    val total = toks.length - n + 1
    var i = 0
    while (i < total) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val c = counts.merge(sb.toString, Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      if (c.intValue > top) top = c.intValue
      i += 1
    }
    new GenericInternalRow(Array[Any](total, counts.size, top))
  }
}
