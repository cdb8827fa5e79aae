package graft.operators

import graft.SparkSpec

class BfsSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long], depth: Int) =
    Bfs.layers(edges.toDF("id_a", "id_b"), "id_a", "id_b",
        seeds.toDF("n"), "n", depth)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph: exact layer distances, depth cap honored") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    run(path, Seq(1L), depth = 3) shouldBe
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L) // 5 is beyond the cap
    run(path, Seq(1L), depth = 10) shouldBe
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L)
  }

  test("multi-source: nearest seed wins; other components stay unreached") {
    // component A: 1-2-3; component B: 10-11; seeds 1 and 3
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    run(edges, Seq(1L, 3L), depth = 5) shouldBe
      Map(1L -> 0L, 3L -> 0L, 2L -> 1L)
    // a seed outside any edge still reports dist 0
    run(edges, Seq(99L), depth = 2) shouldBe Map(99L -> 0L)
  }

  test("edges are undirected and early-stop fires on an exhausted frontier") {
    // directed input (3,2),(2,1): BFS from 1 must still climb it
    val out = run(Seq((3L, 2L), (2L, 1L)), Seq(1L), depth = 12)
    out shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L)
  }
}
