package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  test("2-core keeps cycles, peels paths and stars completely") {
    // triangle 1-2-3 (a 2-core), path 10-11-12 (peels end-in), star
    // 20-{21,22,23} (hub deg 3, leaves deg 1 -> all peel)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L),
      (20L, 21L), (20L, 22L), (20L, 23L)).toDF("id_a", "id_b")
    val out = KCore.kcore(pairs, "id_a", "id_b", k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
  }

  test("peeling cascades: removing a leaf re-exposes its neighbor") {
    // 4-cycle with a tail: 1-2-3-4-1 plus 4-5-6. Round 1 peels 6,
    // round 2 peels 5; the cycle survives with all degrees 2. A
    // rounds=1 run still holds 5 (its degree was 2 before 6 left).
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (4L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val one = KCore.kcore(pairs, "id_a", "id_b", k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    one should contain(5L)
    one should not contain 6L
    val converged = KCore.kcore(pairs, "id_a", "id_b", k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    converged shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L)
  }

  test("3-core separates the clique from the dense-but-thin ring") {
    // K4 clique {1,2,3,4} survives k=3; a 5-ring is 2-regular -> gone
    val k4 = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val ring = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 10L))
    val out = KCore.kcore((k4 ++ ring).toDF("id_a", "id_b"),
        "id_a", "id_b", k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("q176's rounds=4 is the fixpoint on the sf0.001 candidate graph") {
    // the oracle replays exactly 4 rounds, so the engine must have
    // CONVERGED by then — one extra round may not change the output
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id")
    def run(r: Int) =
      KCore.kcore(pairs, "id_a", "id_b", k = 2, rounds = r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toSet
    val at4 = run(4)
    at4 shouldBe run(5)
    at4.size should be > 0
  }
}
