package graft.operators

import graft.SparkSpec

class BasketSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // b1:{A,B,C} b2:{A,B} b3:{A,C} b4:{B}; the duplicate (b1, A) row
  // must not inflate any count (within-basket dedup contract)
  private def rows = Seq(
    ("b1", "A"), ("b1", "A"), ("b1", "B"), ("b1", "C"),
    ("b2", "A"), ("b2", "B"),
    ("b3", "A"), ("b3", "C"),
    ("b4", "B")).toDF("basket", "item")

  test("pair supports, item counts, and exact basis-point lift") {
    val out = Basket.pairAffinity(rows, "basket", "item", minPairs = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // (A,B) in b1+b2; lift = 2*4*10000/(3*3) = 8888 floor
    out(("A", "B")) shouldBe ((2L, 3L, 3L, 8888L))
    // (A,C) in b1+b3; lift = 2*4*10000/(3*2) = 13333 floor
    out(("A", "C")) shouldBe ((2L, 3L, 2L, 13333L))
    // (B,C) appears only in b1: cut by minPairs=2
    out.keySet shouldBe Set(("A", "B"), ("A", "C"))
  }

  test("minPairs=1 keeps the singleton pair with its lift") {
    val out = Basket.pairAffinity(rows, "basket", "item", minPairs = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    // (B,C) support 1: lift = 1*4*10000/(3*2) = 6666 floor
    out(("B", "C")) shouldBe 6666L
    out.size shouldBe 3
  }
}
