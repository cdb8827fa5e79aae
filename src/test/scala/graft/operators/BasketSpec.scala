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

  test("associationRules emits both directions with asymmetric confidence") {
    val out = Basket.associationRules(rows, "basket", "item", minPairs = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // (B,C) pair: n_ab=1, n_b=3, n_c=2, lift=6666
    // B->C conf = 1*10^4 div 3 = 3333; C->B conf = 1*10^4 div 2 = 5000
    out(("B", "C")) shouldBe ((1L, 3L, 2L, 3333L, 6666L))
    out(("C", "B")) shouldBe ((1L, 2L, 3L, 5000L, 6666L))
    // symmetric example keeps equal confidence both ways
    out(("A", "B")) shouldBe ((2L, 3L, 3L, 6666L, 8888L))
    out(("B", "A")) shouldBe ((2L, 3L, 3L, 6666L, 8888L))
    out.size shouldBe 6 // three pairs, two directions each
  }

  test("lift overflow guard raises instead of wrapping past 2^63") {
    // the guard bound (n_ab * n_baskets * 10^4 >= 2^63) is unreachable
    // from realistic in-test basket rows, so exercise the shared
    // expression over the internal projection directly
    def lift(nAb: Long, nb: Long, na: Long, nbI: Long) =
      Seq((nAb, nb, na, nbI)).toDF("n_ab", "__nb", "__na", "__nb_i")
        .select(Basket.liftBpExpr.as("lift_bp"))
    // in-bound: 2*4*10^4/(3*3) = 8888 — the normal path is unchanged
    lift(2L, 4L, 3L, 3L).collect()(0).getLong(0) shouldBe 8888L
    // just past the bound: 1e11 support × 1e10 baskets would wrap; the
    // non-ANSI silent result would be a garbage BIGINT — must raise
    val e = intercept[Exception] {
      lift(100000000000L, 10000000000L, 200000000000L, 200000000000L)
        .collect()
    }
    e.getMessage should include("lift_bp overflow")
    // basket count alone past 9.2e14 (the __nb * 10000 pre-multiply
    // bound) must also raise, not wrap inside the guard itself
    val e2 = intercept[Exception] {
      lift(1L, 922337203685478L, 2L, 2L).collect()
    }
    e2.getMessage should include("lift_bp overflow")
    // DENOMINATOR overflow with an in-bound numerator: n_a * n_b wraps
    // past 2^63 while n_ab * n_baskets * 10^4 does not — the guard
    // must catch both sides of the division
    val e3 = intercept[Exception] {
      lift(100L, 5000000000L, 4000000000L, 4000000000L).collect()
    }
    e3.getMessage should include("lift_bp overflow")
  }

  test("cosineTopK ranks partners by hand-computed exact cos² e8") {
    // baskets: {1,2} {1,2} {1,3} {2,3} -> n1=3 n2=3 n3=2;
    // n12=2 n13=1 n23=1
    // cos²(1,2) = 4e8 div 9 = 44444444
    // cos²(1,3) = cos²(2,3) = 1e8 div 6 = 16666666
    val df = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 2L), (13L, 3L)).toDF("b", "i")
    val out = Basket.cosineTopK(df, "b", "i", k = 5, minPairs = 1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(4)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out((1L, 1L)) shouldBe ((2L, 2L, 44444444L))
    out((1L, 2L)) shouldBe ((3L, 1L, 16666666L))
    out((2L, 1L)) shouldBe ((1L, 2L, 44444444L))
    out((2L, 2L)) shouldBe ((3L, 1L, 16666666L))
    // item 3's two partners tie on cos² AND n_ab -> partner id breaks
    out((3L, 1L)) shouldBe ((1L, 1L, 16666666L))
    out((3L, 2L)) shouldBe ((2L, 1L, 16666666L))
    out.size shouldBe 6
    // k cuts per item, keeping the best-ranked partner
    val top1 = Basket.cosineTopK(df, "b", "i", k = 1, minPairs = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    top1 shouldBe Map(1L -> 2L, 2L -> 1L, 3L -> 1L)
    // the plan must carry cosineTopK's OWN overflow guard (the
    // inherited lift guard is pruned from this plan — round-10
    // review finding) and must NOT run pairAffinity's basket-count
    // attach (dead compute: nothing here reads lift)
    val plan = Basket.cosineTopK(df, "b", "i", k = 1, minPairs = 1L)
      .queryExecution.optimizedPlan.toString
    plan should include("cosineTopK overflow")
    plan.toLowerCase should not include "count(distinct"
  }
}
