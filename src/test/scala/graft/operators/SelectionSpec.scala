package graft.operators

import graft.SparkSpec

class SelectionSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  test("greedy picks maximize marginal coverage with (gain desc, id) ties") {
    // 1-shingles for hand-computation. Distinct token sets:
    //   d1 {a b c d}   (4)
    //   d2 {c d e}     (3, overlaps d1 by 2)
    //   d3 {x y z}     (3, disjoint)
    //   d4 {a b}       (2, subset of d1)
    // round 1: d1 (gain 4); round 2: d3 (gain 3 beats d2's 1);
    // round 3: d2 (gain 1, e); d4 would gain 0
    val d = Seq((1L, "a b c d"), (2L, "c d e"), (3L, "x y z"),
      (4L, "a b")).toDF("doc_id", "text")
    val out = Selection.greedyCoverage(d, "text", "doc_id", k = 4,
        shingleN = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    out(1L) shouldBe ((1L, 4L, 4L))
    out(2L) shouldBe ((3L, 3L, 7L))
    out(3L) shouldBe ((2L, 1L, 8L))
    out.size shouldBe 3 // round 4 stops early: best remaining gain is 0
  }

  test("equal gains break to the smaller doc id") {
    val d = Seq((7L, "p q"), (5L, "r s")).toDF("doc_id", "text")
    val out = Selection.greedyCoverage(d, "text", "doc_id", k = 2,
        shingleN = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe 5L // both gain 2 -> min id first
    out(2L) shouldBe 7L
  }
}
