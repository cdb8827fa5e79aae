package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class LineDupStatsSpec extends SparkSpec {

  private def docs(texts: Seq[String]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType, nullable = true))))

  private def stats(texts: Seq[String]) =
    docs(texts).orderBy("doc_id")
      .select(GraftFunctions.lineDupStats(col("text")).as("st"))
      .select("st.n_lines", "st.n_distinct", "st.line_chars", "st.dup_chars")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))

  test("counts lines, distincts, and duplicate characters exactly") {
    val out = stats(Seq(
      "a\nb\na\nc",          // 4 lines, 3 distinct, dup "a" once
      "one line only",
      "dup\ndup\ndup",       // 3 lines 1 distinct, 2 extra copies x 3 chars
      "\n\n\n",              // only empty lines
      "",
      "tail\n"))             // trailing separator adds no line
    out(0) shouldBe ((4, 3, 4L, 1L))
    out(1) shouldBe ((1, 1, 13L, 0L))
    out(2) shouldBe ((3, 1, 9L, 6L))
    out(3) shouldBe ((0, 0, 0L, 0L))
    out(4) shouldBe ((0, 0, 0L, 0L))
    out(5) shouldBe ((1, 1, 4L, 0L))
  }

  test("lines are compared exactly: case, whitespace, and \\r are significant") {
    val out = stats(Seq(
      "a\nA",                // case differs -> distinct
      "x \nx",               // trailing space differs -> distinct
      "w\r\nw"))             // '\r' stays in the first line -> distinct
    out(0) shouldBe ((2, 2, 2L, 0L))
    out(1) shouldBe ((2, 2, 3L, 0L))
    out(2) shouldBe ((2, 2, 3L, 0L)) // "w\r" counts 2 chars
  }

  test("character counts are code points, not UTF-16 units") {
    val out = stats(Seq("😀\n😀\n中文"))
    // lines: 😀(1), 😀(1), 中文(2) -> 4 line chars; one dup 😀 = 1 dup char
    out(0) shouldBe ((3, 2, 4L, 1L))
  }

  test("null text yields the zero struct, not null") {
    val out = docs(Seq(null))
      .select(GraftFunctions.lineDupStats(col("text")).as("st"))
      .select("st.n_lines").collect()
    out(0).isNullAt(0) shouldBe false
    out(0).getInt(0) shouldBe 0
  }

  test("interpreted eval path (no codegen) agrees with codegen") {
    val conf = spark.conf
    val saved = (conf.get("spark.sql.codegen.wholeStage", "true"),
      conf.get("spark.sql.codegen.factoryMode", "FALLBACK"))
    val texts = Seq("a\nb\na", "solo", "", null, "😀\n😀", "x\r\nx\nx")
    try {
      val withCodegen = stats(texts.map(t => if (t == null) "" else t))
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = stats(texts.map(t => if (t == null) "" else t))
      interpreted shouldBe withCodegen
    } finally {
      conf.set("spark.sql.codegen.wholeStage", saved._1)
      conf.set("spark.sql.codegen.factoryMode", saved._2)
    }
  }

  test("matches the relational formulation on documents-table text") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    // line-ify like q111 (corpus text is single-line), then check the
    // native one-pass counts against the explode/groupBy shape it
    // replaces
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("lt", regexp_replace(col("text"), " +", "\n"))
    val native = d
      .select(col("doc_id"), GraftFunctions.lineDupStats(col("lt")).as("st"))
      .select(col("doc_id"), col("st.n_lines").as("n_lines"),
        col("st.n_distinct").as("n_distinct"),
        col("st.line_chars").as("line_chars"), col("st.dup_chars").as("dup_chars"))
    val relational = d
      .select(col("doc_id"), explode(split(col("lt"), "\n")).as("line"))
      .filter(char_length(col("line")) > 0)
      .groupBy("doc_id", "line")
      .agg(count(lit(1)).as("c"), first(char_length(col("line"))).as("ln"))
      .groupBy("doc_id")
      .agg(sum("c").cast("int").as("n_lines"),
        count(lit(1)).cast("int").as("n_distinct"),
        sum(col("c") * col("ln")).cast("long").as("line_chars"),
        sum((col("c") - 1) * col("ln")).cast("long").as("dup_chars"))
    native.join(relational, Seq("doc_id"), "left")
      .filter(relational("n_lines").isNotNull)
      .count() should be > 0L
    native.as("a").join(relational.as("b"), "doc_id")
      .filter(col("a.n_lines") =!= col("b.n_lines") ||
        col("a.n_distinct") =!= col("b.n_distinct") ||
        col("a.line_chars") =!= col("b.line_chars") ||
        col("a.dup_chars") =!= col("b.dup_chars"))
      .count() shouldBe 0L
  }
}
