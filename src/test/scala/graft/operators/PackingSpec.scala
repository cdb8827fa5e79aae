package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  test("packByConcat assigns packs by shard-local running token count") {
    // one shard, budget 10: docs of 4/4/4 tokens -> cum_before 0,4,8 ->
    // packs 0,0,0 at offsets 0,4,8; the next doc (cum 12) opens pack 1
    val docs = Seq(
      (1L, "s", 4L), (2L, "s", 4L), (3L, "s", 4L), (4L, "s", 4L),
      (10L, "t", 25L), (11L, "t", 1L) // oversized doc spans packs; next doc lands by ITS start
    ).toDF("id", "shard", "n")
    val out = Packing.packByConcat(docs, col("n"), budget = 10L, "shard", "id")
      .select("id", "pack_seq", "pack_offset").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out(1L) shouldBe ((0L, 0L))
    out(2L) shouldBe ((0L, 4L))
    out(3L) shouldBe ((0L, 8L))
    out(4L) shouldBe ((1L, 2L))
    // shard t is packed independently; doc 11 starts at cum 25 -> pack 2
    out(10L) shouldBe ((0L, 0L))
    out(11L) shouldBe ((2L, 5L))
  }

  test("packByConcat is shard-parallel: no single-partition window") {
    val docs = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "shard", "n")
    val plan = Packing.packByConcat(docs, col("n"), 10L, "shard", "id")
      .queryExecution.executedPlan.toString
    // the window partitions by the shard column (hash exchange), never
    // by the empty key set (SinglePartition)
    plan should not include "SinglePartition"
  }

  test("chunkDocs covers every character with stride-spaced windows") {
    val docs = Seq((1L, "a" * 500), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val out = Packing.chunkDocs(docs, "text", "doc_id", size = 200, stride = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: starts 0,150,300,450 with lens 200,200,200,50
    out.filter(_._1 == 1L).sortBy(_._2) shouldBe Seq(
      (1L, 0L, 0L, 200L), (1L, 1L, 150L, 200L), (1L, 2L, 300L, 200L), (1L, 3L, 450L, 50L))
    // short doc: one chunk of its full length; empty doc: no chunks
    out.filter(_._1 == 2L) shouldBe Seq((2L, 0L, 0L, 2L))
    out.filter(_._1 == 3L) shouldBe empty
  }

  test("chunkDocs reassembles the original text from non-overlap prefixes") {
    val text = (0 until 1000).map(i => ('a' + i % 26).toChar).mkString
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    // with stride == size (no overlap) the chunks tile the doc exactly
    val lens = Packing.chunkDocs(docs, "text", "doc_id", size = 128, stride = 128)
      .agg(sum("chunk_len")).collect()(0).getLong(0)
    lens shouldBe 1000L
  }

  test("tokenWindows stops at the first window covering the end") {
    // size 4, stride 3: n=10 -> lastStart = 3*ceil(6/3) = 6 ->
    // starts 0,3,6 (window at 6 spans tokens 7..10); a start at 9
    // would be a strict suffix of the previous window and must NOT
    // be emitted
    val docs = Seq(
      (1L, (1 to 10).map("t" + _).mkString(" ")),
      (2L, "a b"),       // n <= size: one full-doc window
      (3L, "a b c d e"), // n=5 -> lastStart 3: starts 0,3; window 1 has 2 toks
      (4L, "")           // no tokens -> no rows
    ).toDF("doc_id", "text")
    val out = Packing.tokenWindows(docs, "text", "doc_id", size = 4, stride = 3)
      .select("doc_id", "win_idx", "start_tok", "win_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    out shouldBe Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L),
      (2L, 0L, 0L, 2L),
      (3L, 0L, 0L, 4L), (3L, 1L, 3L, 2L))
  }

  test("tokenWindows covers every token exactly: union of windows is the doc") {
    val docs = Seq((1L, (1 to 23).map("w" + _).mkString(" "))).toDF("doc_id", "text")
    val wins = Packing.tokenWindows(docs, "text", "doc_id", size = 8, stride = 5)
      .select("start_tok", "win_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // contiguous coverage: each window starts inside or at the end of
    // the covered prefix, and the last reaches n
    wins.head._1 shouldBe 0L
    wins.sliding(2).foreach { case Array((s1, l1), (s2, _)) =>
      s2 should be <= (s1 + l1); s2 should be > s1 }
    wins.last._1 + wins.last._2 shouldBe 23L
    // overlap is size - stride except the final short window
    wins.init.foreach { case (_, l) => l shouldBe 8L }
  }

  test("capPerGroup keeps a deterministic hash-chosen subset per group") {
    val docs = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val out = Sampling.capPerGroup(docs, "id", "g", cap = 10)
    out.groupBy("g").count().collect().foreach(_.getLong(1) shouldBe 10L)
    // deterministic: same subset both runs, and independent of row order
    val again = Sampling.capPerGroup(docs.orderBy(rand(7)), "id", "g", cap = 10)
    out.exceptAll(again).count() shouldBe 0L
  }

  test("capPerGroup plans a rank-limited window (WindowGroupLimit)") {
    val docs = (0L until 100L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val plan = Sampling.capPerGroup(docs, "id", "g", 5)
      .queryExecution.executedPlan.toString
    plan should include("WindowGroupLimit")
  }

  test("tokenBudgetSample stops each group at its token budget") {
    val docs = (0L until 40L).map(i => (i, s"g${i % 2}", 30L)).toDF("id", "g", "n")
    val out = Sampling.tokenBudgetSample(docs, "id", "g", col("n"), budget = 100L)
    // 30-token docs against a 100 budget: cum_before 0,30,60,90 pass,
    // 120 does not -> exactly 4 docs per group, the 4th crossing the line
    out.groupBy("g").count().collect().foreach(_.getLong(1) shouldBe 4L)
    // deterministic under row reordering
    val again = Sampling.tokenBudgetSample(
      docs.orderBy(rand(3)), "id", "g", col("n"), 100L)
    out.exceptAll(again).count() shouldBe 0L
  }

  test("tokenBudgetSample bucketed sums equal the naive single-window form") {
    import org.apache.spark.sql.expressions.Window
    val docs = (0L until 2000L).map(i => (i, s"g${i % 5}", (i % 37) + 1))
      .toDF("id", "g", "n")
    val out = Sampling.tokenBudgetSample(docs, "id", "g", col("n"), 500L)
    // reference semantics: ONE running-sum window per group (the
    // straggler-prone form the bucketed implementation must match)
    val ord = md5(concat_ws("|", lit("budget"), col("id").cast("string")))
    val w = Window.partitionBy(col("g")).orderBy(ord, col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = docs
      .withColumn("b", coalesce(sum(col("n")).over(w), lit(0L)))
      .filter(col("b") < 500).drop("b")
    out.exceptAll(ref).count() shouldBe 0L
    ref.exceptAll(out).count() shouldBe 0L
  }

  test("tokenBudgetSample budgets a null group instead of dropping it") {
    val docs = Seq((1L, Some("g"), 30L), (2L, None, 30L), (3L, None, 30L),
      (4L, None, 30L), (5L, None, 30L)).toDF("id", "g", "n")
    val out = Sampling.tokenBudgetSample(docs, "id", "g", col("n"), 100L)
    // the four null-group rows are a regular group: cum_before
    // 0/30/60/90 all under 100, so every row survives
    out.count() shouldBe 5L
  }

  test("shuffleRank is a contiguous permutation matching global hash order") {
    val docs = (0L until 5000L).map(i => (i, s"v$i")).toDF("id", "payload")
    val ranked = Sampling.shuffleRank(docs, "id", hexPrefix = 2)
    val ranks = ranked.select("shuffle_rank").collect().map(_.getLong(0)).sorted
    ranks shouldBe (0L until 5000L).toArray
    // rank order == (md5 hash, id) order, verified against the direct
    // (single-partition) sort of the same keys
    val direct = docs
      .select(col("id"), md5(concat_ws("|", lit("shuffle"), col("id").cast("string"))).as("h"))
      .orderBy("h", "id").collect().map(_.getLong(0))
    val byRank = ranked.orderBy("shuffle_rank").select("id").collect().map(_.getLong(0))
    byRank shouldBe direct
  }

  test("shuffleRank plans no single-partition window") {
    val docs = (0L until 100L).map(i => (i, i)).toDF("id", "v")
    val plan = Sampling.shuffleRank(docs, "id").queryExecution.executedPlan.toString
    plan should not include "SinglePartition"
  }

  test("shardByRank slices the shuffle order into exact fixed shards") {
    val docs = (0L until 1000L).map(i => (i, i)).toDF("id", "v")
    val out = Packing.shardByRank(docs, "id", shardSize = 64L, hexPrefix = 2)
    val sizes = out.groupBy("shard_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sizes.size shouldBe 16 // ceil(1000/64)
    (0L until 15L).foreach(sizes(_) shouldBe 64L)
    sizes(15L) shouldBe (1000L - 15 * 64L) // last shard takes the remainder
    // shard_id is a pure function of the rank, so the shard order IS
    // the decorrelated shuffle order
    out.filter(col("shard_id") =!= floor(col("shuffle_rank") / 64))
      .count() shouldBe 0L
  }

  test("shuffleRank accepts the 100-TB bucket width and rejects out-of-range") {
    val docs = (0L until 200L).map(i => (i, i)).toDF("id", "v")
    // hexPrefix=6 (16.7M buckets) is the documented 2e11-row shape; on
    // tiny data it must still produce a contiguous permutation
    val ranks = Sampling.shuffleRank(docs, "id", hexPrefix = 6)
      .select("shuffle_rank").collect().map(_.getLong(0)).sorted
    ranks shouldBe (0L until 200L).toArray
    val ex = the[IllegalArgumentException] thrownBy
      Sampling.shuffleRank(docs, "id", hexPrefix = 7)
    ex.getMessage should include("hexPrefix must be in [1,6]")
  }

  test("sentenceChunks: division assignment never splits a sentence") {
    val implicits = spark.implicits
    import implicits._
    // sentences: "one two three"(3), "four five"(2),
    // "six seven eight nine"(4), "ten"(1); prefix-before 0,3,5,9;
    // budget 4 -> chunks 0,0,1,2
    val docs = Seq(
      (1L, "one two three. four five! six seven eight nine? ten"))
      .toDF("doc_id", "text")
    val out = Packing.sentenceChunks(docs, "text", "doc_id", tokenBudget = 4L)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    out(0L) shouldBe ((2L, 5L))
    out(1L) shouldBe ((1L, 4L))
    out(2L) shouldBe ((1L, 1L))
    // totals conserved: every sentence lands in exactly one chunk
    out.values.map(_._2).sum shouldBe 10L
  }
  test("reshardChurn: rendezvous moves far fewer keys than modulo, symmetrically") {
    val keys = (1L to 200L).map(i => Tuple1(i)).toDF("k")
    val up = Packing.reshardChurn(keys, "k", 16, 20).collect().head
    up.getLong(0) shouldBe 200L
    // modulo reshuffles nearly everything; rendezvous ~ (20-16)/20
    up.getLong(1) should be > up.getLong(3)
    up.getLong(3) should be < 100L // ~40 expected of 200
    up.getLong(3) should be > 0L
    // churn is symmetric: moving 20 -> 16 relocates the same key set
    val down = Packing.reshardChurn(keys, "k", 20, 16).collect().head
    (down.getLong(1), down.getLong(3)) shouldBe
      ((up.getLong(1), up.getLong(3)))
    // duplicate keys count once
    val dup = keys.unionAll(keys)
    Packing.reshardChurn(dup, "k", 16, 20).collect().head
      .getLong(0) shouldBe 200L
  }

  test("reshardChurn rejects degenerate shard arguments") {
    val keys = Seq(Tuple1(1L)).toDF("k")
    intercept[IllegalArgumentException] {
      Packing.reshardChurn(keys, "k", 8, 8)
    }
    intercept[IllegalArgumentException] {
      Packing.reshardChurn(keys, "k", 0, 8)
    }
    intercept[IllegalArgumentException] {
      Packing.reshardChurn(keys, "k", 8, 500)
    }
  }
}
