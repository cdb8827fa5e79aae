package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  test("nodeTriangleCounts finds each triangle once, paths count nothing") {
    // path 1-2-3 (open wedge: no triangle); triangle {4,5,6};
    // second triangle {4,6,7} sharing edge 4-6
    val edges = Seq(
      (1L, 2L), (2L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L),
      (4L, 7L), (6L, 7L)).toDF("id_a", "id_b")
    val out = Triangles.nodeTriangleCounts(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(4L -> 2L, 5L -> 1L, 6L -> 2L, 7L -> 1L)
  }

  test("a triangle-free star yields no rows") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    Triangles.nodeTriangleCounts(star, "id_a", "id_b").count() shouldBe 0L
  }
}
