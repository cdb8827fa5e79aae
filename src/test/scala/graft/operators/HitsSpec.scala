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

  test("doc<->band composition (q234 shape): the biggest template family tops authority") {
    // planted boilerplate: docs 1-4 share band bucket t1 (the big
    // family), docs 5-6 share t2; doc 1 also sits in t2 — crowded
    // buckets only, the q234 edge contract
    val edges = Seq(
      ("1", "t1"), ("2", "t1"), ("3", "t1"), ("4", "t1"),
      ("5", "t2"), ("6", "t2"), ("1", "t2"))
      .toDF("doc", "band_key")
    val out = Hits.bipartiteHits(edges, "doc", "band_key",
        iterations = 2, unit = 1000L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // t1's authority is the max; doc 1 (in both families) is the top hub
    out(("auth", "t1")) shouldBe 1000L
    out(("auth", "t2")) should be < 1000L
    out(("hub", "1")) shouldBe 1000L
    Seq("2", "3", "4", "5", "6").foreach { d =>
      out(("hub", d)) should be < 1000L
    }
  }
}
