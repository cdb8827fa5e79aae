package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class CurationPipelineSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  private val good = "the quick brown fox jumps over the lazy dog and it is a fine day today"

  test("stages drop junk, wrong language, exact and near duplicates in order") {
    val d = docs(
      1L -> good,
      2L -> good, // exact dup of 1
      3L -> (good + " ok"), // near dup of 1
      4L -> "der hund und die katze ist nicht da und das ist gut so heute morgen", // German
      5L -> "!!! ??? *** !!!", // junk punctuation
      6L -> "short", // too few tokens
      7L -> "a completely different english text about the engines of databases and the art of queries")
    val res = CurationPipeline.run(d, "text", "doc_id")
    res.kept.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 7L)
    res.audit("input") shouldBe 7
    res.audit("after_quality") shouldBe 5 // 5, 6 dropped
    res.audit("after_language") shouldBe 4 // 4 dropped
    res.audit("after_exact_dedup") shouldBe 3 // 2 dropped
    res.audit("after_near_dedup") shouldBe 2 // 3 dropped
  }

  test("audit counts are monotonically non-increasing") {
    val d = docs((1L to 20L).map(i => i -> (good + s" variant $i")): _*)
    val a = CurationPipeline.run(d, "text", "doc_id").audit
    val order = Seq("input", "after_quality", "after_language",
      "after_exact_dedup", "after_near_dedup").map(a)
    order.sliding(2).foreach { case Seq(x, y) => y should be <= x }
  }
}
