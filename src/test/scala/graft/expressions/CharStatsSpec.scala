package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CharStatsSpec extends SparkSpec {

  private def docs(texts: Seq[String]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType, nullable = true))))

  private def stats(texts: Seq[String]) =
    docs(texts).orderBy("doc_id")
      .select(GraftFunctions.charStats(col("text")).as("st"))
      .select("st.n_cp", "st.n_distinct", "st.top_cnt", "st.sum_sq")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))

  test("counts code points, distincts, top count, and sum of squares") {
    val out = stats(Seq(
      "aabbc",   // 5 cp, 3 distinct, top 2, 2²+2²+1 = 9
      "aaaa",    // 4 cp, 1 distinct, top 4, 16
      "abc",     // uniform: 3, 3, 1, 3
      ""))
    out(0) shouldBe ((5, 3, 2, 9L))
    out(1) shouldBe ((4, 1, 4, 16L))
    out(2) shouldBe ((3, 3, 1, 3L))
    out(3) shouldBe ((0, 0, 0, 0L))
  }

  test("characters are code points, not UTF-16 units") {
    // 😀 is a surrogate pair but ONE code point; 中 is one
    val out = stats(Seq("😀😀中"))
    out(0) shouldBe ((3, 2, 2, 5L))
  }

  test("null text yields the zero struct, not null") {
    val out = docs(Seq(null))
      .select(GraftFunctions.charStats(col("text")).as("st"))
      .select("st.n_cp").collect()
    out(0).isNullAt(0) shouldBe false
    out(0).getInt(0) shouldBe 0
  }

  test("interpreted eval path (no codegen) agrees with codegen") {
    val conf = spark.conf
    val saved = (conf.get("spark.sql.codegen.wholeStage", "true"),
      conf.get("spark.sql.codegen.factoryMode", "FALLBACK"))
    val texts = Seq("aabbc", "", "😀a😀", "x x x", "zzzzzz")
    try {
      val withCodegen = stats(texts)
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = stats(texts)
      interpreted shouldBe withCodegen
    } finally {
      conf.set("spark.sql.codegen.wholeStage", saved._1)
      conf.set("spark.sql.codegen.factoryMode", saved._2)
    }
  }

  test("matches the relational formulation on documents-table text") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val native = d
      .select(col("doc_id"), GraftFunctions.charStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_cp").as("n_cp"),
        col("st.n_distinct").as("n_distinct"),
        col("st.top_cnt").as("top_cnt"), col("st.sum_sq").as("sum_sq"))
    val relational = d
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(char_length(col("ch")) > 0)
      .groupBy("doc_id", "ch")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").cast("int").as("n_cp"),
        count(lit(1)).cast("int").as("n_distinct"),
        max("c").cast("int").as("top_cnt"),
        sum(col("c") * col("c")).cast("long").as("sum_sq"))
    native.as("a").join(relational.as("b"), "doc_id")
      .filter(col("a.n_cp") =!= col("b.n_cp") ||
        col("a.n_distinct") =!= col("b.n_distinct") ||
        col("a.top_cnt") =!= col("b.top_cnt") ||
        col("a.sum_sq") =!= col("b.sum_sq"))
      .count() shouldBe 0L
    native.count() shouldBe d.count()
  }
}
