package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
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
    val out = d.select(TextFns.langId(col("text"))).collect().map(_.getString(0))
    out shouldBe Array("en", "de", "und")
  }

  test("stopword/punct/avg-token-len ratios") {
    val d = docs("the fish!!")
    val Row(swr: Double, pr: Double, atl: Double) = d.select(
      TextFns.stopwordRatio(col("text")), TextFns.punctRatio(col("text")),
      TextFns.avgTokenLen(col("text"))).head()
    swr shouldBe 0.5 // "the" of 2 tokens
    pr shouldBe 0.2 // 2 of 10 chars
    atl shouldBe 4.5 // (3 + 6("fish!!")) / 2 — tokens keep punctuation
  }

  test("linearQualityScore is the documented integer closed form") {
    // "the fish!!": n_tok=2, stop_cnt=1, punct=2, non_ws=9, n_chars=10
    // stop_bp = 10000/2 = 5000; punct_bp = 20000/10 = 2000
    // atl_centi = 900/2 = 450; len_cap = 2
    // score = 160 - |5000-2500| - 4000 - |450-500| = 160-2500-4000-50
    val d = docs("the fish!!")
    d.select(TextFns.linearQualityScore(col("text"))).head().getLong(0) shouldBe -6390L
    // empty text: every feature 0 -> score = -2500 - 500
    docs("").select(TextFns.linearQualityScore(col("text"))).head()
      .getLong(0) shouldBe -3000L
  }

  test("regex token forms match the higher-order-function forms exactly") {
    // the regexp_count rewrites (codegen) must be value-identical to the
    // interpreted filter/aggregate-over-tokens originals on edge shapes:
    // punctuation-attached tokens ("the," is NOT the stopword "the"),
    // marker words embedded in longer tokens, repeated/adjacent
    // stopwords, multi-whitespace, empty, blank, uppercase
    val tricky = docs(
      "the fish", "the, fish", "THE THE the", "a a a a", "theater of dreams",
      "is  it   that it is", "", "   ", "und zzz", "der die das der",
      "el que la\tlos", "x", "of")
    val toks = TextFns.tokens(col("text"))
    val hofStopCount = F.size(F.filter(toks, t => t.isin(TextFns.enStopwords: _*)))
    val hofAvgLen = when(F.size(toks) > 0,
      F.aggregate(toks, lit(0L), (acc, t) => acc + F.length(t)).cast("double") / F.size(toks))
      .otherwise(lit(0.0))
    val hofSwr = when(F.size(toks) > 0, hofStopCount.cast("double") / F.size(toks))
      .otherwise(lit(0.0))
    val hofLang = {
      val langs = TextFns.langMarkers.keys.toSeq.sorted
      val best = langs.zipWithIndex.map { case (l, i) =>
        struct(F.size(F.filter(toks, t => t.isin(TextFns.langMarkers(l): _*))).as("s"),
          lit(langs.length - i).as("r"), lit(l).as("l"))
      }
      val winner = array_max(array(best: _*))
      when(winner.getField("s") > 0, winner.getField("l")).otherwise(lit("und"))
    }
    tricky.select(
      F.size(toks).cast("long").as("hof_n"), TextFns.wsTokenCount(col("text")).as("re_n"),
      hofSwr.as("hof_swr"), TextFns.stopwordRatio(col("text")).as("re_swr"),
      hofAvgLen.as("hof_atl"), TextFns.avgTokenLen(col("text")).as("re_atl"),
      hofLang.as("hof_lang"), TextFns.langId(col("text")).as("re_lang"))
      .collect().foreach { r =>
        r.getLong(1) shouldBe r.getLong(0)
        r.getDouble(3) shouldBe r.getDouble(2)
        r.getDouble(5) shouldBe r.getDouble(4)
        r.getString(7) shouldBe r.getString(6)
      }
  }

  test("langIdNgram regex scoring matches the HOF charShingles form") {
    // overlapping trigrams ("ththe" hosts " th", "the", "he " at
    // overlapping offsets), accented profile grams ("ión"), repeats,
    // ties, empty, und
    val tricky = docs(
      "the theater", "ththe", "aviación en acción", "Der Schein und ich",
      "le que est ent", "", "zzz", "THE AND ING", "que de la ion")
    val hof = {
      val padded = concat(lit(" "), lower(col("text")), lit(" "))
      val grams = TextFns.charShingles(padded, 3)
      val langs = TextFns.langTrigramProfiles.keys.toSeq.sorted
      val best = langs.zipWithIndex.map { case (l, i) =>
        struct(
          F.size(F.filter(grams, g => g.isin(TextFns.langTrigramProfiles(l): _*))).as("s"),
          lit(langs.length - i).as("r"), lit(l).as("l"))
      }
      val winner = array_max(array(best: _*))
      when(winner.getField("s") > 0, winner.getField("l")).otherwise(lit("und"))
    }
    tricky.select(hof.as("hof"), TextFns.langIdNgram(col("text")).as("re"))
      .collect().foreach(r => r.getString(1) shouldBe r.getString(0))
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

  test("redactPii rewrites emails then urls, leaves clean text alone") {
    val d = docs(
      "mail bob.smith+x@example.co.uk now",
      "see https://a.example.com/p?q=1 and http://b.org x",
      "both a@b.io https://c.net/d",
      // email inside a URL userinfo: email pattern wins first, the
      // leftover scheme prefix is then swept by the URL pass
      "ftp is safe but https://user@host.com/p leaks",
      "nothing here")
    val out = d.select(TextFns.redactPii(col("text"))).collect().map(_.getString(0))
    out(0) shouldBe "mail <EMAIL> now"
    out(1) shouldBe "see <URL> and <URL> x"
    out(2) shouldBe "both <EMAIL> <URL>"
    out(3) shouldBe "ftp is safe but <URL> leaks"
    out(4) shouldBe "nothing here"
    // redacted text carries no residual email/url-shaped spans
    d.select(TextFns.emailCount(TextFns.redactPii(col("text")))).collect()
      .foreach(_.getLong(0) shouldBe 0L)
  }

  test("blocklistCount matches whole words only, one tally for many words") {
    import spark.implicits._
    val df = Seq(
      "the slow query and another slow scan",  // 2 whole-word hits
      "slowness is not slow-ness hyphens split words here slow",  // slow-ness: 'slow' bounded by '-' IS a word boundary; slowness is not
      "clean text").toDF("text")
    val out = df.select(graft.functions.TextFns.blocklistCount(
        org.apache.spark.sql.functions.col("text"), Seq("slow", "dup"))
      .as("n")).collect().map(_.getLong(0))
    out(0) shouldBe 2L
    // "slowness" does not match; "slow-ness" and the trailing "slow" do
    out(1) shouldBe 2L
    out(2) shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      graft.functions.TextFns.blocklistCount(
        org.apache.spark.sql.functions.col("text"), Nil)
    // \b only anchors next to word characters: punctuation-edged
    // entries would silently never match whole-word, so they're rejected
    an[IllegalArgumentException] should be thrownBy
      graft.functions.TextFns.blocklistCount(
        org.apache.spark.sql.functions.col("text"), Seq("bad!"))
    // interior metacharacters are escaped literally (portable
    // per-character escaping, not java-only \Q...\E quoting)
    val dotted = Seq("a.b c axb a.b").toDF("text")
      .select(graft.functions.TextFns.blocklistCount(
        org.apache.spark.sql.functions.col("text"), Seq("a.b")).as("n"))
      .collect().map(_.getLong(0))
    dotted(0) shouldBe 2L
  }

  test("normalize canonicalizes case, control chars, and whitespace runs") {
    import spark.implicits._
    val df = Seq(
      "  Hello\tWorld\r\nAgain  ",
      "already clean",
      "A\u0000B").toDF("text")
    val out = df.select(graft.functions.TextFns.normalize(
        org.apache.spark.sql.functions.col("text")).as("n"))
      .collect().map(_.getString(0))
    out(0) shouldBe "hello world again"
    out(1) shouldBe "already clean"
    out(2) shouldBe "a b"
    // idempotence: normalizing twice changes nothing
    val twice = df.select(graft.functions.TextFns.normalize(
        graft.functions.TextFns.normalize(
          org.apache.spark.sql.functions.col("text"))).as("n"))
      .collect().map(_.getString(0))
    twice shouldBe out
  }
}
