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

  test("withAudit=false still materializes the exact stage once (no duplicated upstream subtree)") {
    val d = docs(
      1L -> good,
      2L -> good,
      3L -> (good + " ok"),
      7L -> "a completely different english text about the engines of databases and the art of queries")
    val res = CurationPipeline.run(d, "text", "doc_id", withAudit = false)
    // the exact-dedup frame is persisted even without the audit...
    res.cached should have size 1
    res.cached.head.storageLevel.useMemory shouldBe true
    // ...so both branches of the keeper anti-join read ONE InMemoryRelation
    // instead of each re-running the quality->LID->dedup chain
    val exec = res.kept.queryExecution.executedPlan.toString
    exec should include("InMemoryTableScan")
    res.kept.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 7L)
    // the kept frame stays valid after the caller releases the cache
    res.unpersist()
    res.cached.head.storageLevel.useMemory shouldBe false
    res.kept.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 7L)
  }

  test("audit counts are monotonically non-increasing") {
    val d = docs((1L to 20L).map(i => i -> (good + s" variant $i")): _*)
    val a = CurationPipeline.run(d, "text", "doc_id").audit
    val order = Seq("input", "after_quality", "after_language",
      "after_exact_dedup", "after_near_dedup").map(a)
    order.sliding(2).foreach { case Seq(x, y) => y should be <= x }
  }
}
