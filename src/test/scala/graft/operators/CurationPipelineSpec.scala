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

  private def pairs(rows: (Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b) => Row(a, b) }),
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))

  test("transitive keep policy drops every non-minimum of a component; greedy keeps local minima") {
    // (1,4),(2,4) is ONE component {1,2,4}: transitive keeps only 1,
    // greedy keeps both 1 and 2 (2 is never the larger id of any pair)
    val p = pairs(1L -> 4L, 2L -> 4L)
    val transitive = Dedup.nearDupLosers(p, "doc_id", transitive = true)
      .collect().map(_.getLong(0)).sorted
    val greedy = Dedup.nearDupLosers(p, "doc_id", transitive = false)
      .collect().map(_.getLong(0)).sorted
    transitive shouldBe Array(2L, 4L)
    greedy shouldBe Array(4L)
  }

  test("transitive policy collapses a chain whose ends never share a pair") {
    // 10-11, 11-12, 12-13: only transitive propagation reaches 13 from 10
    val p = pairs(10L -> 11L, 11L -> 12L, 12L -> 13L)
    Dedup.nearDupLosers(p, "doc_id", transitive = true)
      .collect().map(_.getLong(0)).sorted shouldBe Array(11L, 12L, 13L)
  }

  test("run() with transitive policy keeps a subset of the greedy run's survivors") {
    val d = docs((1L to 30L).map(i => i -> (good + s" variant ${i % 7} tail $i")): _*)
    val t = CurationPipeline.run(d, "text", "doc_id", withAudit = false)
    val g = CurationPipeline.run(d, "text", "doc_id",
      CurationPipeline.Config(transitiveNearDup = false), withAudit = false)
    val tk = t.kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val gk = g.kept.select("doc_id").collect().map(_.getLong(0)).toSet
    t.unpersist(); g.unpersist()
    tk.subsetOf(gk) shouldBe true
  }

  test("repetition gates drop high-duplication docs the base gate passes") {
    // 16 tokens of "the dog": 15 bigram windows, 2 distinct -> dup
    // fraction 13/15, top fraction 8/15; base quality/LID gates pass it
    val rep = Array.fill(8)("the dog").mkString(" ")
    val d = docs(1L -> good, 2L -> rep)
    val off = CurationPipeline.run(d, "text", "doc_id", withAudit = false)
    off.kept.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L)
    off.unpersist()
    val cfg = CurationPipeline.Config(
      maxDupGramFraction = Some(0.5), maxTopGramFraction = Some(0.4))
    val on = CurationPipeline.run(d, "text", "doc_id", cfg, withAudit = false)
    on.kept.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe Array(1L)
    on.unpersist()
    // the gate is a pure per-row filter — nothing shuffles below it
    val plan = d.filter(CurationPipeline.qualityGate("text", cfg))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("docs shorter than the repetition window pass the gates (no repetition to measure)") {
    val cfg = CurationPipeline.Config(
      maxDupGramFraction = Some(0.1), repetitionGramN = 30)
    val d = docs(1L -> good)
    d.filter(CurationPipeline.qualityGate("text", cfg)).count() shouldBe 1
  }

  test("audit counts are monotonically non-increasing") {
    val d = docs((1L to 20L).map(i => i -> (good + s" variant $i")): _*)
    val a = CurationPipeline.run(d, "text", "doc_id").audit
    val order = Seq("input", "after_quality", "after_language",
      "after_exact_dedup", "after_near_dedup").map(a)
    order.sliding(2).foreach { case Seq(x, y) => y should be <= x }
  }
}
