package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  test("pairStats counts pairs weighted by word frequency, distinct words separately") {
    import spark.implicits._
    // vocab: aab x2, ab x1 -> pair "aa": 1 word, total 2;
    // pair "ab": 2 words, total 2*1 + 1*1 = 3
    val docs = Seq((1L, "aab aab ab")).toDF("doc_id", "text")
    val out = Bpe.pairStats(docs, "text", k = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out("aa") shouldBe ((1L, 2L))
    out("ab") shouldBe ((2L, 3L))
    out.size shouldBe 2
  }

  test("pairStats counts every position of a repeated in-word pair") {
    import spark.implicits._
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val out = Bpe.pairStats(docs, "text", k = 10).collect()
    out.length shouldBe 1
    out.head.getString(0) shouldBe "aa"
    out.head.getLong(2) shouldBe 2L // positions 1-2 and 2-3 of one word
  }

  test("pairStats top-k cut is the merge order: count desc, pair asc") {
    import spark.implicits._
    val docs = Seq((1L, "xy xy zz")).toDF("doc_id", "text")
    val top1 = Bpe.pairStats(docs, "text", k = 1).collect()
    top1.head.getString(0) shouldBe "xy" // total 2 beats zz's 1
    // single-char words can hold no pair and must not crash the explode
    val single = Seq((1L, "a b c xy")).toDF("doc_id", "text")
    Bpe.pairStats(single, "text", k = 5).collect()
      .map(_.getString(0)).toSeq shouldBe Seq("xy")
  }

  test("pairStats plans corpus-once + TakeOrderedAndProject (no global sort)") {
    import spark.implicits._
    val docs = Seq((1L, "aab ab")).toDF("doc_id", "text")
    val plan = Bpe.pairStats(docs, "text", k = 5)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
    plan should not include "Window"
  }

  test("learnMerges runs the greedy loop with exact ties and early exhaustion") {
    import spark.implicits._
    // words: aaab x3, ab x1.
    // r1: (a,a)=6 beats (a,b)=4 -> merge; greedy on aaab gives (aa)(a)(b)
    // r2: (a,b)=4 beats (aa,a)=3 -> merge
    // r3: (aa,ab)=3 — the only pair left
    // r4: every word is one symbol -> exhausted at 3 of 5 rounds
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab")).toDF("doc_id", "text")
    val out = Bpe.learnMerges(docs, "text", rounds = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    out.sortBy(_._1) shouldBe Array(
      (1L, "a", "a", 6L), (2L, "a", "b", 4L), (3L, "aa", "ab", 3L))
  }
}
