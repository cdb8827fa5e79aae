package graft.expressions

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F, DataFrame, Row}
import org.apache.spark.sql.types._

/** Pins `WordGramStats` (one-pass native repetition stats) to the
  * relational explode -> count-per-gram -> re-aggregate form its
  * scaladoc claims equivalence to, on both the interpreted and codegen
  * paths — the same discipline every other native expression follows.
  */
class WordGramStatsSpec extends SparkSpec {

  private def docs(texts: Seq[String]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType, nullable = true))))

  /** The relational form: every n-gram window as a row, counted per
    * (doc, gram), re-aggregated per doc; absent docs (null text or < n
    * tokens) are zero-filled — `WordGramStats` null semantics.
    */
  private def relational(d: DataFrame, n: Int): DataFrame = {
    val g = d.select(col("doc_id"),
      explode(TextFns.wordShingles(TextFns.tokens(col("text")), n)).as("s"))
    val agg = g.groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("int").as("n_grams"),
        count(lit(1)).cast("int").as("n_distinct"),
        max(col("c")).cast("int").as("top_count"))
    d.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0)).as("n_grams"),
        coalesce(col("n_distinct"), lit(0)).as("n_distinct"),
        coalesce(col("top_count"), lit(0)).as("top_count"))
  }

  private def native(d: DataFrame, n: Int): DataFrame =
    d.select(col("doc_id"),
        GraftFunctions.wordGramStats(col("text"), n).as("st"))
      .select(col("doc_id"), col("st.n_grams").as("n_grams"),
        col("st.n_distinct").as("n_distinct"), col("st.top_count").as("top_count"))

  private def assertMatches(d: DataFrame, n: Int): Unit = {
    val nat = native(d, n).collect().map(r => r.getLong(0) ->
      ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    val rel = relational(d, n).collect().map(r => r.getLong(0) ->
      ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    nat shouldBe rel
  }

  private val tricky = Seq(
    "a b c d e f",                    // all-distinct grams
    "a a a a a a a",                  // one gram repeated
    "x y x y x y x y",                // alternating (top gram "x y x")
    "one two",                        // fewer than 3 tokens
    "exactly three tokens",           // exactly n
    "",                               // empty
    "   \t  \n ",                     // whitespace only
    "MiXeD CaSe MIXED case mixed CASE",  // lowering folds grams together
    "café naïve café naïve café naïve",  // multi-byte
    "中文 文本 中文 文本 中文",            // CJK tokens
    "a😀b a😀b a😀b x",               // surrogate pairs inside tokens
    null)

  test("native stats match the relational explode/count form") {
    for (n <- Seq(1, 2, 3, 5)) assertMatches(docs(tricky), n)
  }

  test("null text and short docs yield (0, 0, 0), not null") {
    val out = native(docs(Seq(null, "one two")), 3).collect()
    out.foreach { r =>
      (r.getInt(1), r.getInt(2), r.getInt(3)) shouldBe ((0, 0, 0))
    }
  }

  test("interpreted eval path (no codegen) agrees with codegen") {
    val conf = spark.conf
    val saved = (conf.get("spark.sql.codegen.wholeStage", "true"),
      conf.get("spark.sql.codegen.factoryMode", "FALLBACK"))
    val withCodegen = native(docs(tricky), 3).collect().map(_.toSeq)
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = native(docs(tricky), 3).collect().map(_.toSeq)
      interpreted shouldBe withCodegen
    } finally {
      conf.set("spark.sql.codegen.wholeStage", saved._1)
      conf.set("spark.sql.codegen.factoryMode", saved._2)
    }
  }

  test("n_distinct always equals size(distinct_word_shingles(text, n))") {
    val out = docs(tricky).select(
      GraftFunctions.wordGramStats(col("text"), 3).getField("n_distinct").as("nd"),
      coalesce(F.size(GraftFunctions.distinctWordShingles(col("text"), 3)), lit(0)).as("dws"))
      .collect()
    out.foreach(r => r.getInt(0) shouldBe r.getInt(1))
  }

  test("fuzz: native matches relational on 200 random token streams") {
    val rnd = new scala.util.Random(20260812L)
    val words = Vector("a", "b", "cc", "dd", "été", "中文", "😀", "WORD", "word")
    val fuzz = Seq.fill(200) {
      val n = rnd.nextInt(25)
      (0 until n).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    }
    assertMatches(docs(fuzz), 3)
  }
}
