package graft.expressions

import graft.SparkSpec
import graft.functions.TextFns
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F, DataFrame, Row}
import org.apache.spark.sql.types._

/** The native signature expressions must be bit-identical to the
  * relational explode+aggregate forms they replaced (which the DuckDB
  * oracle SQL mirrors). The originals are inlined here as the
  * reference implementation.
  */
class SignatureExprsSpec extends SparkSpec {

  private def docs(texts: Seq[String]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType, nullable = true))))

  // ---- relational reference forms (the pre-native implementations) ----

  private def relationalMinhash(d: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("doc").orderBy("pos")
    val sh = d
      .select(col("doc_id").as("doc"),
        posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "t")))
      .filter(col("t") =!= "")
      .withColumn("t1", lead(col("t"), 1).over(w))
      .withColumn("t2", lead(col("t"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc"), concat_ws(" ", col("t"), col("t1"), col("t2")).as("s"))
    val hashed = sh.select(col("doc"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("h1"),
      conv(substring(md5(col("s")), 17, 15), 16, 10).cast("long").as("h2"))
    val mins = (0 until k).map(i => min(col("h1") + lit(i.toLong) * col("h2")).as(s"mh$i"))
    hashed.groupBy("doc").agg(mins.head, mins.tail: _*)
  }

  private def relationalSimhash16(d: DataFrame): DataFrame = {
    val hexed = d
      .select(col("doc_id").as("doc"), explode(TextFns.tokens(col("text"))).as("t"))
      .select(col("doc"), md5(col("t")).as("h"))
    val votes = (1 to 16).map(j =>
      sum(when(substring(col("h"), j, 1) >= "8", 1).otherwise(-1)).as(s"v$j"))
    hexed.groupBy("doc").agg(votes.head, votes.tail: _*)
      .select(col("doc"),
        (1 to 16).map(j => when(col(s"v$j") >= 0, lit(1L << (16 - j))).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
  }

  private def relationalSimhash64(d: DataFrame): DataFrame = {
    val hexed = d
      .select(col("doc_id").as("doc"), explode(TextFns.tokens(col("text"))).as("t"))
      .select(col("doc"), md5(col("t")).as("h"))
    val banded = hexed.select(col("doc") +: (0 until 4).map(b =>
      conv(substring(col("h"), b * 4 + 1, 4), 16, 10).cast("long").as(s"hb$b")): _*)
    val votes = for { b <- 0 until 4; j <- 0 until 16 } yield
      sum(when(shiftright(col(s"hb$b"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
        .as(s"v${b}_$j")
    banded.groupBy("doc").agg(votes.head, votes.tail: _*)
      .select(col("doc") +: (0 until 4).map(b =>
        (0 until 16).map(j =>
          when(col(s"v${b}_$j") >= 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
          .as(s"s$b")): _*)
  }

  private val fuzzDocs: Seq[String] = {
    val rnd = new scala.util.Random(42L)
    val alphabet = "abcXYZ 09.!\t\n  éß中😀İ "
    Seq("the quick brown fox jumps over the lazy dog",
      "one two", "one two three", "", "   ", "a\tb\nc d e",
      "ÜPPER CASE ÖNLY TEXT HERE", "重复 重复 重复 词语 测试 数据") ++
      Seq.fill(100) {
        val n = rnd.nextInt(60)
        (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
  }

  private def byDoc(df: DataFrame): Map[Long, Seq[Any]] =
    df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap

  test("native minhash signatures match the relational form bit-for-bit") {
    val d = docs(fuzzDocs)
    val native = byDoc(graft.operators.Dedup.minhashSignatures(d, "text", "doc_id", 6))
    val rel = byDoc(relationalMinhash(d, 6))
    native.keySet shouldBe rel.keySet
    native.foreach { case (id, sig) => sig shouldBe rel(id) }
  }

  test("native simhash16 matches the relational form") {
    val d = docs(fuzzDocs)
    val native = byDoc(graft.operators.Dedup.simhashSignatures(d, "text", "doc_id"))
    val rel = byDoc(relationalSimhash16(d))
    native.keySet shouldBe rel.keySet
    native.foreach { case (id, sig) => sig shouldBe rel(id) }
  }

  test("native simhash64 bands match the relational form") {
    val d = docs(fuzzDocs)
    val native = byDoc(graft.operators.Dedup.simhashSignatures64(d, "text", "doc_id"))
    val rel = byDoc(relationalSimhash64(d))
    native.keySet shouldBe rel.keySet
    native.foreach { case (id, sig) => sig shouldBe rel(id) }
  }

  test("null and token-poor docs are absent, not null rows") {
    val d = docs(Seq("a b", null, "  ", "a b c"))
    graft.operators.Dedup.minhashSignatures(d, "text", "doc_id", 2)
      .select("doc").collect().map(_.getLong(0)).toSet shouldBe Set(3L)
    graft.operators.Dedup.simhashSignatures(d, "text", "doc_id")
      .select("doc").collect().map(_.getLong(0)).toSet shouldBe Set(0L, 3L)
  }

  test("signature queries have no Exchange in their plans") {
    val d = docs(fuzzDocs)
    for (df <- Seq(
        graft.operators.Dedup.minhashSignatures(d, "text", "doc_id", 6),
        graft.operators.Dedup.simhashSignatures64(d, "text", "doc_id"))) {
      val p = df.queryExecution.executedPlan.toString
      withClue(p) { p should not include "Exchange" }
    }
  }

  test("pair_combos matches the nested-transform HOF expansion") {
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Seq(1L, 2L, 3L, 4L)), Row(Seq(7L, 9L)), Row(Seq(5L)), Row(Seq.empty[Long]))),
      StructType(Seq(StructField("ids", ArrayType(LongType)))))
    val ids = col("ids")
    val hof = explode(F.flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + lit(2), F.size(ids)),
        y => struct(x.as("id_a"), y.as("id_b"))))))
    val hofPairs = d.select(hof.as("p")).select(col("p.id_a"), col("p.id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nativePairs = d.select(explode(GraftFunctions.pairCombos(ids)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    nativePairs shouldBe hofPairs
    nativePairs should contain theSameElementsAs Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (7L, 9L))
  }

  test("pair_combos works for string ids too") {
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq("a", "b", "c")))),
      StructType(Seq(StructField("ids", ArrayType(StringType)))))
    d.select(explode(GraftFunctions.pairCombos(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("a", "b"), ("a", "c"), ("b", "c"))
  }

  test("distinct_word_shingles matches the HOF chain incl. order and null") {
    val d = docs(fuzzDocs :+ null)
    val hof = array_distinct(TextFns.wordShingles(TextFns.tokens(col("text")), 3))
    val out = d.select(
      GraftFunctions.distinctWordShingles(col("text"), 3).as("native"),
      hof.as("hof")).collect()
    out.foreach { r =>
      r.getSeq[String](0) shouldBe r.getSeq[String](1)
    }
  }

  test("registered SQL signature functions evaluate") {
    GraftFunctions.register(spark)
    docs(Seq("the quick brown fox")).createOrReplaceTempView("sig_docs")
    val r = spark.sql("SELECT minhash_sig(text, 2) AS mh, simhash16_sig(text) AS s16, " +
      "simhash64_sig(text) AS s64 FROM sig_docs").head()
    r.getSeq[Long](0) should have length 2
    r.getLong(1) should (be >= 0L and be <= 65535L)
    r.getSeq[Long](2) should have length 4
  }
}
