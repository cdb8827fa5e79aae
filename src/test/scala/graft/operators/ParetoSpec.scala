package graft.operators

import graft.SparkSpec

class ParetoSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def abc(rows: Seq[(String, Double)], width: Double = 65536.0) =
    Pareto.abcClassification(rows.toDF("k", "v"), "k", "v", width)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getLong(2), r.getString(3)))).toMap

  test("classes cut at exact cumulative-share boundaries (inclusive)") {
    // totals: a=50, b=30, c=15, d=5 -> cum shares 50/80/95/100%
    // 80% boundary is INCLUSIVE (b is A), 95% inclusive (c is B)
    val out = abc(Seq(("a", 20.0), ("a", 30.0), ("b", 30.0),
      ("c", 15.0), ("d", 5.0)))
    out("a") shouldBe ((50.0, 5000L, "A"))
    out("b") shouldBe ((30.0, 8000L, "A"))
    out("c") shouldBe ((15.0, 9500L, "B"))
    out("d") shouldBe ((5.0, 10000L, "C"))
  }

  test("results are bucketWidth-invariant (cross-bucket DESC prefix ≡ one bucket)") {
    val rows = (1 to 40).map(i => (s"k$i", (i * 7 % 13 + 1) * 10.0))
    abc(rows, width = 20.0) shouldBe abc(rows, width = 1e9)
  }

  test("value ties order by key; null keys dropped; zero total guarded") {
    // equal values: cum order is key order (k1 before k2)
    val out = abc(Seq(("k1", 50.0), ("k2", 50.0)))
    out("k1")._2 shouldBe 5000L
    out("k2")._2 shouldBe 10000L
    val withNull = Seq((Option("a"), 10.0), (Option.empty[String], 99.0))
      .toDF("k", "v")
    Pareto.abcClassification(withNull, "k", "v").count() shouldBe 1L
    val zeros = abc(Seq(("a", 0.0), ("b", 0.0)))
    zeros.values.foreach(_._2 shouldBe 0L)
  }

  test("topShares cuts ceil(n*p) keys and reports exact bp shares") {
    // values 70/20/6/4 (n=4, total 100): top-25% = 1 key -> 7000 bp;
    // top-50% = 2 -> 9000; top-100% = 4 -> 10000
    val df = Seq(("a", 70.0), ("b", 20.0), ("c", 6.0), ("d", 4.0))
      .toDF("k", "v")
    val out = Pareto.topShares(df, "k", "v", Seq(2500L, 5000L, 10000L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    out(2500L) shouldBe ((1L, 7000L))
    out(5000L) shouldBe ((2L, 9000L))
    out(10000L) shouldBe ((4L, 10000L))
    // value ties break by key: both orders give the same SHARE set
    val tied = Seq(("a", 50.0), ("b", 50.0)).toDF("k", "v")
    Pareto.topShares(tied, "k", "v", Seq(5000L))
      .collect().head.getLong(2) shouldBe 5000L
    an[IllegalArgumentException] should be thrownBy
      Pareto.topShares(df, "k", "v", Seq(0L))
  }

  test("xyzClassification counts zero periods via the closed form") {
    // 3 global months. k1 steady 2/2/2 -> cv 0 (X); k2 all in one
    // month -> cv = sqrt(3*36-36)/6 = 1.414214 (Z); k3 3/3 over two
    // months -> cv = sqrt(3*18-36)/6 = 0.707107 (Y)
    val df = Seq(
      ("k1", 1L, 2.0), ("k1", 2L, 2.0), ("k1", 3L, 2.0),
      ("k2", 1L, 6.0),
      ("k3", 1L, 3.0), ("k3", 2L, 3.0))
      .toDF("k", "mon", "q")
    val out = Pareto.xyzClassification(df, "k", "mon", "q")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getString(3)))).toMap
    out("k1") shouldBe ((3L, 0.0, "X"))
    out("k2") shouldBe ((1L, 1.414214, "Z"))
    out("k3") shouldBe ((2L, 0.707107, "Y"))
    // a steady FRACTIONAL demand whose radicand lands one ulp below 0
    // in doubles must clamp to cv 0, not NaN -> 'Z'
    val ulp = Seq(("k", 1L, 0.05), ("k", 2L, 0.05)).toDF("k", "mon", "q")
    val r = Pareto.xyzClassification(ulp, "k", "mon", "q").collect().head
    r.getDouble(2) shouldBe 0.0
    r.getString(3) shouldBe "X"
    an[IllegalArgumentException] should be thrownBy
      Pareto.xyzClassification(df, "k", "mon", "q", xMax = 1.0, yMax = 0.5)
  }

  test("gini matches hand-computed rank-form coefficients") {
    // group A values (dollars) 0/1/1/2 -> cents 0,100,100,200: n=4,
    // S=400, sum r*x = 2*100 + 3*100 + 4*200 = 1300
    // -> bp = 10^4*(2600 - 5*400)/(4*400) = 3750 (ties rank-invariant)
    // group B all equal -> 0; group C one key holds all -> for n=3
    // with (0,0,300): 10^4*(2*900 - 4*300)/(3*300) = 6666
    val df = Seq(
      ("A", "k1", 0.0), ("A", "k2", 1.0), ("A", "k3", 1.0),
      ("A", "k4", 2.0),
      ("B", "k1", 5.0), ("B", "k2", 5.0), ("B", "k3", 5.0),
      ("C", "k1", 0.0), ("C", "k2", 0.0), ("C", "k3", 3.0))
      .toDF("g", "k", "v")
    val out = Pareto.gini(df, "g", "k", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out shouldBe Map("A" -> ((4L, 3750L)), "B" -> ((3L, 0L)),
      "C" -> ((3L, 6666L)))
    // per-key rows sum first, and a tiny bucket width (cross-bucket
    // offsets in play) must not change any coefficient
    val split = df.union(Seq(("A", "k4", 0.0)).toDF("g", "k", "v"))
    Pareto.gini(split, "g", "k", "v", bucketWidthCents = 100L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap shouldBe out
  }

  test("gini drops zero-total groups and rejects bad widths") {
    val df = Seq(("Z", "k1", 0.0), ("Z", "k2", 0.0), ("A", "k1", 1.0),
      ("A", "k2", 3.0)).toDF("g", "k", "v")
    // A: cents 100/300, S=400, srx = 100*1 + 300*2 = 700
    // -> 10^4*(1400-1200)/(2*400) = 2500
    val out = Pareto.gini(df, "g", "k", "v").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    out shouldBe Map("A" -> 2500L)
    an[IllegalArgumentException] should be thrownBy
      Pareto.gini(df, "g", "k", "v", bucketWidthCents = 0L)
  }

  test("theil/mld: zero at equality, hand-computed under concentration") {
    import graft.functions.Rounding.p6d
    val df = Seq(("E", 5.0), ("E", 5.0), ("E", 5.0),
      ("C", 1.0), ("C", 3.0),
      ("Z", -2.0), ("Z", 4.0)).toDF("g", "v")
    val out = Pareto.theil(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    out("E") shouldBe ((3L, 0.0, 0.0)) // perfect equality
    // C: x = 1,3; X = 4, n = 2: T = .25*ln(.5) + .75*ln(1.5)
    val t = (BigDecimal(p6d((1.0 / 4.0) * math.log(2.0 * 1.0 / 4.0))) +
      BigDecimal(p6d((3.0 / 4.0) * math.log(2.0 * 3.0 / 4.0)))).toDouble
    val m = (BigDecimal(p6d(math.log(4.0 / (2.0 * 1.0)) / 2.0)) +
      BigDecimal(p6d(math.log(4.0 / (2.0 * 3.0)) / 2.0))).toDouble
    out("C") shouldBe ((2L, t, m))
    // non-positive values are excluded from the domain
    out("Z") shouldBe ((1L, 0.0, 0.0))
  }

  test("hillTail recovers the hand value; threshold row drops by (value, tie)") {
    import graft.functions.Rounding.p6d
    val df = Seq((16.0, 1L), (8.0, 2L), (4.0, 3L), (2.0, 4L))
      .toDF("v", "tie")
    val r = Pareto.hillTail(df, "v", "tie", k = 3).collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2)) shouldBe ((3L, 3L, 2.0))
    val lsum = BigDecimal(p6d(math.log(8.0))) +
      BigDecimal(p6d(math.log(4.0))) + BigDecimal(p6d(math.log(2.0)))
    r.getDouble(3) shouldBe p6d(3.0 / lsum.toDouble)
    // ties at the threshold value: only the max-tie row drops
    val tied = Seq((4.0, 1L), (4.0, 2L), (2.0, 3L), (2.0, 4L), (2.0, 5L))
      .toDF("v", "tie")
    val rt = Pareto.hillTail(tied, "v", "tie", k = 2).collect().head
    (rt.getLong(1), rt.getDouble(2)) shouldBe ((2L, 2.0))
    rt.getDouble(3) shouldBe
      p6d(2.0 / (BigDecimal(p6d(math.log(2.0))) * 2).toDouble)
    // flat top: every term ln(1) = 0 -> undefined alpha
    val flat = Seq((5.0, 1L), (5.0, 2L), (5.0, 3L)).toDF("v", "tie")
    assert(Pareto.hillTail(flat, "v", "tie", k = 2).collect().head
      .isNullAt(3))
    an[IllegalArgumentException] should be thrownBy
      Pareto.hillTail(flat, "v", "tie", k = 1)
  }

  test("meanExcess fits GPD moments per threshold, exponential sanity") {
    import graft.functions.Rounding.p6d
    val sp = spark; import sp.implicits._
    // excesses over u=10 from (12, 14, 18): e = (2, 4, 8)
    val df = Seq(("g", 12.0), ("g", 14.0), ("g", 18.0), ("g", 5.0))
      .toDF("g", "x")
    val r = Pareto.meanExcess(df, "g", "x", Seq(10.0)).collect().head
    r.getAs[Long]("n_exceed") shouldBe 3L
    val me = p6d(14.0 / 3)
    r.getAs[Double]("mean_excess") shouldBe me
    val s2 = p6d((84.0 - 196.0 / 3) / 2) // var(2,4,8)
    r.getAs[Double]("xi") shouldBe p6d(0.5 * (1.0 - me * me / s2))
    r.getAs[Double]("sigma") shouldBe p6d(0.5 * me * (me * me / s2 + 1.0))
    // a single exceedance has no variance: NULL fit, mean still real
    val one = Pareto.meanExcess(df, "g", "x", Seq(16.0)).collect().head
    one.getAs[Long]("n_exceed") shouldBe 1L
    one.getAs[Double]("mean_excess") shouldBe 2.0
    assert(one.isNullAt(4) && one.isNullAt(5))
  }

  test("priceIndices holds the basket fixed and brackets Fisher") {
    import graft.functions.Rounding.p6d
    val sp = spark; import sp.implicits._
    // item A doubles, item B halves; era-0 basket A-heavy
    // p0: A=10 B=8 ; p1: A=20 B=4 ; q0: A=10 B=1 ; q1: A=1 B=10
    val rows = Seq(
      ("g", "A", 0L, 100.0, 10.0), ("g", "B", 0L, 8.0, 1.0),
      ("g", "A", 1L, 20.0, 1.0), ("g", "B", 1L, 40.0, 10.0),
      ("g", "C", 0L, 5.0, 1.0)) // C missing era 1: dropped
      .toDF("g", "i", "e", "rev", "qty")
    val r = Pareto.priceIndices(rows, "g", "i", "e", "rev", "qty")
      .collect().head
    r.getAs[Long]("n_items") shouldBe 2L
    val l = p6d((20.0 * 10 + 4 * 1) / (10.0 * 10 + 8 * 1)) // 204/108
    val p = p6d((20.0 * 1 + 4 * 10) / (10.0 * 1 + 8 * 10)) // 60/90
    r.getAs[Double]("laspeyres") shouldBe l
    r.getAs[Double]("paasche") shouldBe p
    r.getAs[Double]("fisher") shouldBe p6d(math.sqrt(l * p))
    // Laspeyres (base basket, A-heavy) sees the A price DOUBLING
    l should be > 1.5
    p should be < 1.0
  }
}
