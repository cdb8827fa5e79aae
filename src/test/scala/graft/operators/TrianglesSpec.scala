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

  test("localClusteringBp: clique=10000, star center=0, leaves excluded") {
    // triangle {1,2,3} is a 3-clique; star 10-(11,12,13) is triangle-free
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (10L, 12L), (10L, 13L)).toDF("id_a", "id_b")
    val out = Triangles.localClusteringBp(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    out(1L) shouldBe ((2L, 1L, 10000L))
    out(2L) shouldBe ((2L, 1L, 10000L))
    out(3L) shouldBe ((2L, 1L, 10000L))
    out(10L) shouldBe ((3L, 0L, 0L))
    // degree-1 leaves have no neighbor pair: excluded, not zero
    out.keySet shouldBe Set(1L, 2L, 3L, 10L)
  }

  test("localClusteringBp floor arithmetic on a shared-edge bowtie") {
    // triangles {4,5,6} and {4,6,7} share edge 4-6: node 4 has degree 3
    // and 2 triangles -> 2*2*10000/(3*2) = 6666 (floor)
    val edges = Seq(
      (4L, 5L), (5L, 6L), (4L, 6L), (4L, 7L), (6L, 7L)).toDF("id_a", "id_b")
    val out = Triangles.localClusteringBp(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    out(4L) shouldBe 6666L
    out(5L) shouldBe 10000L
    out(6L) shouldBe 6666L
    out(7L) shouldBe 10000L
  }

  test("linkPrediction scores unconnected wedge pairs, skips connected ones") {
    import graft.functions.Rounding.p6d
    // wedge 2-1-3: deg(1)=2 -> AA(2,3) = 1/log10(2)
    val v = Triangles.linkPrediction(
      Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b"), "id_a", "id_b")
      .collect()
    v.length shouldBe 1
    (v.head.getLong(0), v.head.getLong(1), v.head.getLong(2)) shouldBe
      ((2L, 3L, 1L))
    v.head.getDouble(3) shouldBe p6d(1.0 / math.log10(2.0))
    // a closed triangle has no unconnected pairs left
    Triangles.linkPrediction(
      Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b"),
      "id_a", "id_b").collect() shouldBe empty
    // two common neighbors: terms sum as decimals (deg 2 and deg 3)
    val two = Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 3L))
    // pairs: via 1 (deg 2): (2,3); via 2 (deg 3): (1,3)x,(1,4),(3,4)
    val m = Triangles.linkPrediction(two.toDF("id_a", "id_b"),
        "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    m((1L, 4L)) shouldBe ((1L, p6d(1.0 / math.log10(3.0))))
    m((3L, 4L)) shouldBe ((1L, p6d(1.0 / math.log10(3.0))))
    m.contains((2L, 3L)) shouldBe false // connected
    m.contains((1L, 3L)) shouldBe false // connected
    // hub cap: a star center past maxHubDegree is not a valid middle
    val star = (2L to 6L).map(l => (1L, l))
    Triangles.linkPrediction(star.toDF("id_a", "id_b"), "id_a", "id_b",
      maxHubDegree = 4L).collect() shouldBe empty
    // wedge-bound refusal fires BEFORE the quadratic join
    an[IllegalStateException] should be thrownBy
      Triangles.linkPrediction(two.toDF("id_a", "id_b"), "id_a", "id_b",
        maxCandidates = 1L)
  }
}
