package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.toDF("id_a", "id_b")

  private def resolve(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // every semantic test runs BOTH physical strategies: the driver
  // union-find fast path (default limit) and the distributed
  // min-label + pointer-jumping loop (limit 0)
  private val paths = Seq(
    "local fast path" -> 2000000L,
    "distributed loop" -> 0L)

  for ((pathName, limit) <- paths) {

    test(s"[$pathName] chain A-B-C collapses transitively even though A and C share no edge") {
      val out = Components.connectedComponents(edges(1L -> 2L, 2L -> 3L),
        localEdgeLimit = limit)
      resolve(out) shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
      Components.free(out)
    }

    test(s"[$pathName] multi-component graph labels each component by its min id") {
      // chain 10-11-12-13, triangle 20-21-22 (+ redundant edge), isolated pair 30-31
      val out = Components.connectedComponents(edges(
        11L -> 10L, 11L -> 12L, 13L -> 12L,
        20L -> 21L, 21L -> 22L, 20L -> 22L,
        31L -> 30L), localEdgeLimit = limit)
      resolve(out) shouldBe Map(
        10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
        20L -> 20L, 21L -> 20L, 22L -> 20L,
        30L -> 30L, 31L -> 30L)
      Components.free(out)
    }

    test(s"[$pathName] duplicate and self edges are harmless") {
      val out = Components.connectedComponents(edges(
        1L -> 2L, 2L -> 1L, 1L -> 2L, 3L -> 3L), localEdgeLimit = limit)
      resolve(out) shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 3L)
      Components.free(out)
    }

    test(s"[$pathName] string ids use lexicographic min as the component label") {
      val out = Components.connectedComponents(
        Seq("b" -> "c", "c" -> "a", "x" -> "y").toDF("id_a", "id_b"),
        localEdgeLimit = limit)
      out.collect().map(r => r.getString(0) -> r.getString(1)).toMap shouldBe
        Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x")
      Components.free(out)
    }

    test(s"[$pathName] string min is UTF-8 byte order, not UTF-16 code-unit order") {
      // U+FFFD (UTF-16 unit 0xFFFD; UTF-8 EF BF BD) vs U+1F600 (UTF-16
      // surrogates 0xD83D 0xDE00; UTF-8 F0 9F 98 80): Java's String
      // ordering says the emoji is SMALLER (0xD83D < 0xFFFD) while
      // Spark's UTF8String min says U+FFFD is — both strategies must
      // agree with Spark's
      val repl = "�"
      val emoji = "😀"
      val out = Components.connectedComponents(
        Seq(repl -> emoji).toDF("id_a", "id_b"), localEdgeLimit = limit)
      out.collect().map(r => r.getString(0) -> r.getString(1)).toMap shouldBe
        Map(repl -> repl, emoji -> repl)
      Components.free(out)
    }
  }

  test("both strategies agree on a many-component random-ish graph") {
    // pseudo-random edges over 400 nodes: chains, merges, isolated pairs
    val es = (0L until 600L).map { i =>
      val a = (i * 37) % 400
      val b = (a + 1 + (i % 3) * 7) % 400
      a -> b
    }
    val local = Components.connectedComponents(edges(es: _*))
    val dist = Components.connectedComponents(edges(es: _*), localEdgeLimit = 0L)
    resolve(local) shouldBe resolve(dist)
    Components.free(local); Components.free(dist)
  }

  test("long chain converges in O(log n) rounds via pointer jumping") {
    // a 64-node path: plain min-propagation needs 63 rounds; with
    // path-halving maxIter=10 must suffice (2^10 >> 64)
    val chain = (0L until 63L).map(i => i -> (i + 1))
    val out = Components.connectedComponents(edges(chain: _*), maxIter = 10,
      localEdgeLimit = 0L)
    val m = resolve(out)
    m should have size 64
    all(m.values) shouldBe 0L
    Components.free(out)
  }

  test("maxIter stop still returns a total, valid (coarser) labeling") {
    val chain = (0L until 63L).map(i => i -> (i + 1))
    val out = Components.connectedComponents(edges(chain: _*), maxIter = 2,
      localEdgeLimit = 0L)
    val m = resolve(out)
    m should have size 64
    // every label must itself be a node, and labels never exceed the node
    m.foreach { case (node, lab) =>
      m should contain key lab
      lab should be <= node
    }
    Components.free(out)
  }

  test("round frames are released: at most the result's blocks stay live") {
    val sc = spark.sparkContext
    // assert only on the RDD ids created DURING the call — the global
    // getPersistentRDDs size drifts as the asynchronous ContextCleaner
    // drops entries other tests left behind
    def liveIds(): Set[Int] = sc.getPersistentRDDs.keySet.toSet
    val before = liveIds()
    val chain = (0L until 32L).map(i => i -> (i + 1))
    val out = Components.connectedComponents(edges(chain: _*), localEdgeLimit = 0L)
    out.count() shouldBe 33
    // intermediate rounds (2 checkpoints per round over ~5 rounds) must
    // all be freed; only the final round's blocks back the result
    val created = liveIds() -- before
    created.size should be <= 1
    Components.free(out)
    (liveIds() intersect created) shouldBe empty
  }

  test("free releases only blocks connectedComponents created, not a caller's checkpoints") {
    val mine = edges(1L -> 2L).localCheckpoint(true)
    val out = Components.connectedComponents(edges(1L -> 2L, 2L -> 3L),
      localEdgeLimit = 0L)
    // a caller mixes the result with its own checkpointed frame...
    val joined = out.join(mine, out("node") === mine("id_a"), "left")
    Components.free(joined)
    // ...freeing must not strand the caller's blocks (a freed
    // localCheckpoint is unrecoverable — this read would throw)
    mine.count() shouldBe 1
    mine.unpersist()
  }

  test("sizeHistogram buckets cluster sizes") {
    import spark.implicits._
    // components: {1,2,3} (chain), {10,11}, {20,21}, {30}
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val comp = Components.connectedComponents(edges)
      .union(Seq((30L, 30L)).toDF("node", "component"))
    val out = Components.sizeHistogram(comp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(3L -> 1L, 2L -> 2L, 1L -> 1L)
  }
}
