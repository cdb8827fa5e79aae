package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge

/** Registration of graft's native expressions.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.expressions.GraftExtensions` at
  *    session build time (the SparkSessionExtensions route), or
  *  - `GraftFunctions.register(spark)` programmatically on a live
  *    session.
  *
  * Either way the functions are callable from SQL
  * (`SELECT cosine_similarity(a, b)`) and the typed helpers in
  * `GraftFunctions` are usable from the DataFrame API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => RewriteHofCosine)
    ext.injectOptimizerRule(_ => RewriteRegexpCount)
  }
}

object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private[graft] val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    ("srp_band_keys",
      new ExpressionInfo(classOf[SrpBandKeys].getName, "srp_band_keys"),
      (args: Seq[Expression]) => SrpBandKeys(args(0),
        intLit(args(1), "bands"), intLit(args(2), "planesPerBand"),
        intLit(args(3), "dims"))),
    ("md5_min_gram",
      new ExpressionInfo(classOf[Md5MinGram].getName, "md5_min_gram"),
      (args: Seq[Expression]) => Md5MinGram(args(0), intLit(args(1), "k"))),
    ("distinct_gram_count",
      new ExpressionInfo(classOf[DistinctGramCount].getName, "distinct_gram_count"),
      (args: Seq[Expression]) => DistinctGramCount(args(0), intLit(args(1), "k"))),
    ("regexp_tally",
      new ExpressionInfo(classOf[RegexpTally].getName, "regexp_tally"),
      (args: Seq[Expression]) => RegexpTally(args(0), stringLit(args(1), "pattern"))),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0), intLit(args(1), "k"))),
    ("simhash16_sig",
      new ExpressionInfo(classOf[SimHash16Sig].getName, "simhash16_sig"),
      (args: Seq[Expression]) => SimHash16Sig(args(0))),
    ("simhash64_sig",
      new ExpressionInfo(classOf[SimHash64Sig].getName, "simhash64_sig"),
      (args: Seq[Expression]) => SimHash64Sig(args(0))),
    ("pair_combos",
      new ExpressionInfo(classOf[PairCombos].getName, "pair_combos"),
      (args: Seq[Expression]) => PairCombos(args(0))),
    ("distinct_word_shingles",
      new ExpressionInfo(classOf[DistinctWordShingles].getName, "distinct_word_shingles"),
      (args: Seq[Expression]) => DistinctWordShingles(args(0), intLit(args(1), "n"))),
    ("word_gram_stats",
      new ExpressionInfo(classOf[WordGramStats].getName, "word_gram_stats"),
      (args: Seq[Expression]) => WordGramStats(args(0), intLit(args(1), "n"))))

  private def stringLit(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got: $other")
  }

  /** Register every graft function into a live session's registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }

  /** Install graft's optimizer rules on a live session (the
    * programmatic equivalent of the extensions route).
    */
  def installOptimizations(spark: SparkSession): Unit = {
    val want = Seq(RewriteHofCosine, RewriteRegexpCount)
    val missing = want.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
  }

  /** Typed DataFrame-API handle on the native cosine expression. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Typed DataFrame-API handle on the native banded-SRP expression. */
  def srpBandKeys(v: Column, bands: Int, planesPerBand: Int, dims: Int): Column =
    ColumnBridge.column(SrpBandKeys(
      ColumnBridge.expression(v), bands, planesPerBand, dims))

  /** Typed handle on the native min-md5-gram fingerprint expression. */
  def md5MinGram(text: Column, k: Int): Column =
    ColumnBridge.column(Md5MinGram(ColumnBridge.expression(text), k))

  /** Typed handle on the native distinct-gram-count expression. */
  def distinctGramCount(text: Column, k: Int): Column =
    ColumnBridge.column(DistinctGramCount(ColumnBridge.expression(text), k))

  /** Typed handle on the native winnowing fingerprint selection. */
  def winnowedFps(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowedFps(ColumnBridge.expression(text), k, w))

  /** Typed handle on the native regex match counter. */
  def regexpTally(text: Column, pattern: String): Column =
    ColumnBridge.column(RegexpTally(ColumnBridge.expression(text), pattern))

  /** Typed handle on the native k-position MinHash signature. */
  def minhashSig(text: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(text), k))

  /** Typed handle on the native 16-bit SimHash signature. */
  def simhash16Sig(text: Column): Column =
    ColumnBridge.column(SimHash16Sig(ColumnBridge.expression(text)))

  /** Typed handle on the native 64-bit banded SimHash signature. */
  def simhash64Sig(text: Column): Column =
    ColumnBridge.column(SimHash64Sig(ColumnBridge.expression(text)))

  /** Typed handle on the native in-bucket pair expansion. */
  def pairCombos(ids: Column): Column =
    ColumnBridge.column(PairCombos(ColumnBridge.expression(ids)))

  /** Typed handle on the native distinct n-word shingle set. */
  def distinctWordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(DistinctWordShingles(ColumnBridge.expression(text), n))

  /** Typed handle on the native within-doc n-gram repetition stats. */
  def wordGramStats(text: Column, n: Int): Column =
    ColumnBridge.column(WordGramStats(ColumnBridge.expression(text), n))

  /** Typed handle on the native within-doc duplicate-line stats. */
  def lineDupStats(text: Column): Column =
    ColumnBridge.column(LineDupStats(ColumnBridge.expression(text)))

  /** Typed handle on the native character-distribution stats. */
  def charStats(text: Column): Column =
    ColumnBridge.column(CharStats(ColumnBridge.expression(text)))

  /** Typed handle on the native quantized-outer-product expression. */
  def quantizedOuterFlat(v: Column, scale: Long): Column =
    ColumnBridge.column(QuantizedOuterFlat(ColumnBridge.expression(v), scale))
}
