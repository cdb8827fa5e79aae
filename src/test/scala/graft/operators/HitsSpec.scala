package graft.operators

import graft.SparkSpec

class HitsSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  test("two-round integer HITS matches the hand computation") {
    // c1 -> {s1,s2,s3}, c2 -> {s1}; unit 1000:
    // r1: h(c1)=3000,h(c2)=1000 -> 1000,333; a(s1)=1333,a(s2)=a(s3)=1000
    //     -> 1000,750,750
    // r2: h(c1)=2500,h(c2)=1000 -> 1000,400; a(s1)=1400,a(s2)=a(s3)=1000
    //     -> 1000,714,714
    val edges = Seq(
      (1L, 101L), (1L, 102L), (1L, 103L), (2L, 101L))
      .toDF("cust", "supp")
    val out = Hits.bipartiteHits(edges, "cust", "supp",
        iterations = 2, unit = 1000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    out(("hub", 1L)) shouldBe 1000L
    out(("hub", 2L)) shouldBe 400L
    out(("auth", 101L)) shouldBe 1000L
    out(("auth", 102L)) shouldBe 714L
    out(("auth", 103L)) shouldBe 714L
    out.size shouldBe 5
  }

  test("duplicate input edges do not change scores") {
    val once = Seq((1L, 101L), (1L, 102L), (2L, 101L)).toDF("c", "s")
    val dup = once.unionAll(once)
    val a = Hits.bipartiteHits(once, "c", "s", iterations = 2, unit = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = Hits.bipartiteHits(dup, "c", "s", iterations = 2, unit = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    a shouldBe b
  }
}
