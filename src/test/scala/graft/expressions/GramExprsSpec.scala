package graft.expressions

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class GramExprsSpec extends SparkSpec {

  private def docs(texts: Seq[String]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType, nullable = true))))

  // the HOF originals the native expressions must reproduce bit-for-bit
  private def hofFingerprint(text: org.apache.spark.sql.Column, k: Int) =
    array_min(transform(TextFns.charShingles(text, k), g => md5(g)))
  private def hofDistinct(text: org.apache.spark.sql.Column, k: Int) =
    F.size(array_distinct(TextFns.charShingles(text, k)))

  private val tricky = Seq(
    "abcdefghij",                    // plain ascii, longer than k
    "abc",                           // exactly k (k=3 cases)
    "ab",                            // shorter than k
    "",                              // empty
    "AAAAAAAAAA",                    // uppercase, all-same grams
    "MiXeD CaSe with Spaces  !!",    // case folding + punctuation
    "café naïve résumé",  // 2-byte code points
    "中文文本测试文本",  // 3-byte CJK
    "mix é中 a scii",       // mixed widths
    "İSTANBUL İN TURKEY",  // dotted I: lowering grows the string
    "a😀b😀c",   // surrogate pairs (4-byte code points)
    null)

  test("md5_min_gram matches the HOF fingerprint on ascii and multi-byte text") {
    for (k <- Seq(3, 8)) {
      val out = docs(tricky).select(
        GraftFunctions.md5MinGram(col("text"), k).as("native"),
        hofFingerprint(col("text"), k).as("hof")).collect()
      out.foreach { r =>
        if (r.isNullAt(1)) r.isNullAt(0) shouldBe true
        else r.getString(0) shouldBe r.getString(1)
      }
    }
  }

  test("distinct_gram_count matches the HOF form") {
    for (k <- Seq(3, 8)) {
      val out = docs(tricky).select(
        GraftFunctions.distinctGramCount(col("text"), k).as("native"),
        hofDistinct(col("text"), k).as("hof")).collect()
      out.foreach { r =>
        if (r.isNullAt(1)) r.isNullAt(0) shouldBe true
        else r.getInt(0) shouldBe r.getInt(1)
      }
    }
  }

  test("TextFns.fingerprint (native-backed) keeps its contract") {
    val out = docs(Seq("abcdefghij", "short")).select(TextFns.fingerprint(col("text"), 8)).collect()
    out(0).getString(0) should have length 32
    out(1).isNullAt(0) shouldBe true
  }

  test("registered SQL functions evaluate") {
    GraftFunctions.register(spark)
    docs(Seq("abcdefghij")).createOrReplaceTempView("gram_docs")
    val r = spark.sql(
      "SELECT md5_min_gram(text, 3) AS fp, distinct_gram_count(text, 3) AS n, " +
        "regexp_tally(text, 'b|de') AS t FROM gram_docs")
      .head()
    r.getString(0) should have length 32
    r.getInt(1) shouldBe 8
    r.getInt(2) shouldBe 2
  }

  test("fuzz: native forms match HOF forms on 300 random unicode strings") {
    // seeded, reproducible; alphabet mixes ascii, whitespace variants,
    // accents, CJK, and an emoji (4-byte) plus Turkish dotted I (the
    // lowering-grows-the-string case)
    val rnd = new scala.util.Random(20260812L)
    val alphabet = "abcXYZ 09.!\t\n  éßΔ中文😀İ"
    val fuzz = Seq.fill(300) {
      val n = rnd.nextInt(30)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val k = 3
    val out = docs(fuzz).select(
      GraftFunctions.md5MinGram(col("text"), k).as("nfp"),
      hofFingerprint(col("text"), k).as("hfp"),
      GraftFunctions.distinctGramCount(col("text"), k).as("ndc"),
      hofDistinct(col("text"), k).as("hdc"),
      col("text")).collect()
    out.foreach { r =>
      withClue(s"text=${r.getString(4)}: ") {
        if (r.isNullAt(1)) r.isNullAt(0) shouldBe true
        else r.getString(0) shouldBe r.getString(1)
        r.getInt(2) shouldBe r.getInt(3)
      }
    }
  }

  test("regexp_tally matches regexp_count incl. zero-width and null") {
    val d = docs(Seq("aaa bbb aaa", "", "abcabc", "no match", null))
    val pats = Seq("a+", "(?=ab)", "\\S+", "zzz")
    pats.foreach { p =>
      val out = d.select(
        GraftFunctions.regexpTally(col("text"), p).as("native"),
        regexp_count(col("text"), lit(p)).as("builtin")).collect()
      out.foreach { r =>
        if (r.isNullAt(1)) r.isNullAt(0) shouldBe true
        else r.getInt(0) shouldBe r.getInt(1)
      }
    }
  }

  // reference formulation for winnowing: full gram-hash array, min of
  // every w-window, distinct — correct but O(n^2) via lambda inlining,
  // which is exactly why the native expression exists
  private def hofWinnow(text: org.apache.spark.sql.Column, k: Int, w: Int) = {
    val hs = transform(TextFns.charShingles(text, k), g => md5(g))
    val n = F.size(hs)
    when(n >= w,
      array_distinct(transform(sequence(lit(1), n - (w - 1)),
        j => array_min(F.slice(hs, j, lit(w))))))
      .when(n >= 1, array(array_min(hs)))
      .otherwise(array().cast("array<string>"))
  }

  test("winnowed_fps matches the HOF winnowing on tricky and fuzz inputs") {
    val rnd = new scala.util.Random(20260813L)
    val alphabet = "abcXYZ 09.!\t\n  éßΔ中文😀İ"
    val fuzz = Seq.fill(200) {
      val n = rnd.nextInt(40)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    for ((k, w) <- Seq((3, 2), (8, 4))) {
      val out = docs(tricky ++ fuzz).select(
        array_sort(GraftFunctions.winnowedFps(col("text"), k, w)).as("native"),
        array_sort(hofWinnow(col("text"), k, w)).as("hof"),
        col("text")).collect()
      out.foreach { r =>
        withClue(s"k=$k w=$w text=${r.getString(2)}: ") {
          r.getSeq[String](0) shouldBe r.getSeq[String](1)
        }
      }
    }
  }

  test("winnowed_fps guarantees a shared fingerprint for long shared substrings") {
    // two docs sharing a substring of length >= w+k-1 = 11 must share
    // at least one selected fingerprint (the winnowing guarantee)
    val shared = "zqxwvutsrpon" // 12 chars, unique enough not to collide
    val d = docs(Seq(s"prefix one $shared tail a", s"other start $shared end b"))
    val fps = d.select(col("doc_id"),
        explode(GraftFunctions.winnowedFps(col("text"), 8, 4)).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = fps.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    byDoc(0L).intersect(byDoc(1L)) should not be empty
  }

  test("interpreted eval path (no codegen) agrees with codegen") {
    val conf = spark.conf
    val saved = (conf.get("spark.sql.codegen.wholeStage", "true"),
      conf.get("spark.sql.codegen.factoryMode", "FALLBACK"))
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val out = docs(tricky).select(
        GraftFunctions.md5MinGram(col("text"), 3).as("fp"),
        hofFingerprint(col("text"), 3).as("hof"),
        array_sort(GraftFunctions.winnowedFps(col("text"), 3, 2)).as("nw"),
        array_sort(hofWinnow(col("text"), 3, 2)).as("hw")).collect()
      out.foreach { r =>
        if (r.isNullAt(1)) r.isNullAt(0) shouldBe true
        else r.getString(0) shouldBe r.getString(1)
        r.getSeq[String](2) shouldBe r.getSeq[String](3)
      }
    } finally {
      conf.set("spark.sql.codegen.wholeStage", saved._1)
      conf.set("spark.sql.codegen.factoryMode", saved._2)
    }
  }
}
