package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class TextFnsSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
  }

  test("tokens lowercases and drops empties") {
    val out = docs("  The QUICK  brown\tfox ")
      .select(TextFns.tokens(col("text"))).head().getSeq[String](0)
    out shouldBe Seq("the", "quick", "brown", "fox")
  }

  test("wordShingles produces n-grams, empty when too short") {
    val d = docs("a b c d", "a b")
    val out = d.select(TextFns.wordShingles(TextFns.tokens(col("text")), 3))
      .collect().map(_.getSeq[String](0))
    out(0) shouldBe Seq("a b c", "b c d")
    out(1) shouldBe Seq.empty
  }

  test("charShingles windows characters") {
    val out = docs("abcd").select(TextFns.charShingles(col("text"), 3))
      .head().getSeq[String](0)
    out shouldBe Seq("abc", "bcd")
  }

  test("minhash is deterministic and salt-sensitive") {
    val d = docs("x y z w")
    val sh = TextFns.wordShingles(TextFns.tokens(col("text")), 2)
    val Row(m0: String, m0b: String, m1: String) =
      d.select(TextFns.minhash(sh, 0), TextFns.minhash(sh, 0), TextFns.minhash(sh, 1)).head()
    m0 shouldBe m0b
    m0 should not be m1
  }

  test("simhash16 in range, equal for equal token bags") {
    val d = docs("alpha beta gamma", "alpha beta gamma", "totally different words here")
    val sigs = d.select(TextFns.simhash16(TextFns.tokens(col("text")))).collect().map(_.getLong(0))
    sigs(0) shouldBe sigs(1)
    all(sigs) should (be >= 0L and be <= 65535L)
  }

  test("simhash16 is null for empty token bags") {
    docs("   ").select(TextFns.simhash16(TextFns.tokens(col("text"))))
      .head().isNullAt(0) shouldBe true
  }

  test("langId picks marker-dominant language, und when none") {
    val d = docs("the cat of the house is big", "der hund und die katze ist nicht da", "zzz qqq")
    val out = d.select(TextFns.langId(TextFns.tokens(col("text")))).collect().map(_.getString(0))
    out shouldBe Array("en", "de", "und")
  }

  test("stopword/punct/avg-token-len ratios") {
    val d = docs("the fish!!")
    val toks = TextFns.tokens(col("text"))
    val Row(swr: Double, pr: Double, atl: Double) = d.select(
      TextFns.stopwordRatio(toks), TextFns.punctRatio(col("text")),
      TextFns.avgTokenLen(toks)).head()
    swr shouldBe 0.5 // "the" of 2 tokens
    pr shouldBe 0.2 // 2 of 10 chars
    atl shouldBe 4.5 // (3 + 6("fish!!")) / 2 — tokens keep punctuation
  }

  test("token counts: whitespace vs bpe-ish") {
    val d = docs("Hello world42, ok!")
    val Row(ws: Long, bp: Long) = d.select(
      TextFns.wsTokenCount(col("text")), TextFns.bpeishTokenCount(col("text"))).head()
    ws shouldBe 3
    // Hello | world | 42 | , | ok | !
    bp shouldBe 6
  }

  test("fingerprint null for short docs, stable otherwise") {
    val d = docs("abcdefghij", "short")
    val out = d.select(TextFns.fingerprint(col("text"), 8)).collect()
    out(0).getString(0) should have length 32
    out(1).isNullAt(0) shouldBe true
  }
}
