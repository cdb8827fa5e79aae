package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed oracles for the ranking-metric operators. */
class MetricsSpec extends SparkSpec {


  import spark.implicits._

  // scores: pos at {3.0, 2.0}, neg at {1.0, 2.0 (tie), 0.5}
  // ordered scores: 0.5(n) 1.0(n) 2.0(p,n) 3.0(p)
  // U2 = Σ np·(2·negBelow + nn):
  //   s=2.0: np=1, negBelow=2, nn=1 → 1·(4+1)=5
  //   s=3.0: np=1, negBelow=3, nn=0 → 1·6=6  → U2=11
  // AUC = 11 / (2·2·3) = 0.916666…→ pround6 = 0.916667
  test("rankAuc matches the hand-computed midrank U statistic") {
    val df = Seq((3.0, 1L), (2.0, 1L), (1.0, 0L), (2.0, 0L), (0.5, 0L))
      .toDF("s", "lab")
    val r = Metrics.rankAuc(df, "s", "lab", bucketWidth = 1.0).collect()
    r.length shouldBe 1
    r.head.getLong(0) shouldBe 2L
    r.head.getLong(1) shouldBe 3L
    r.head.getDouble(2) shouldBe 0.916667 +- 1e-12
  }

  test("rankAuc is 1.0 for perfect separation and 0.5 for all-ties") {
    val perfect = Seq((10.0, 1L), (9.0, 1L), (1.0, 0L), (2.0, 0L))
      .toDF("s", "lab")
    Metrics.rankAuc(perfect, "s", "lab").collect().head.getDouble(2) shouldBe 1.0
    val ties = Seq((5.0, 1L), (5.0, 0L), (5.0, 1L), (5.0, 0L)).toDF("s", "lab")
    Metrics.rankAuc(ties, "s", "lab").collect().head.getDouble(2) shouldBe 0.5
  }

  test("rankAuc is NULL when a class is empty, and invariant to bucket width") {
    val onlyPos = Seq((1.0, 1L), (2.0, 1L)).toDF("s", "lab")
    assert(Metrics.rankAuc(onlyPos, "s", "lab").collect().head.isNullAt(2))
    val df = Seq.tabulate(50)(i => (i * 0.7, (i % 3 == 0))).toDF("s", "lab")
    val a = Metrics.rankAuc(df, "s", "lab", 0.3).collect().head.getDouble(2)
    val b = Metrics.rankAuc(df, "s", "lab", 50.0).collect().head.getDouble(2)
    a shouldBe b
  }

  // 6 rows, 3 tiles → tiles of ranks {0,1},{2,3},{4,5}; desc by score:
  // ids by score desc: (60,f) (50,e) (40,d) (30,c) (20,b) (10,a)
  // labels:             1      1      0      1      0      0
  // tile0: n=2 pos=2 rate=10000 lift=(2*6)/(2*3)=2.0
  // tile1: n=2 pos=1 rate=5000  lift=(1*6)/(2*3)=1.0
  // tile2: n=2 pos=0 rate=0     lift=0.0
  test("gainsTable slices exact desc-rank tiles with exact bp and lift") {
    val df = Seq(("a", 10.0, 0L), ("b", 20.0, 0L), ("c", 30.0, 1L),
      ("d", 40.0, 0L), ("e", 50.0, 1L), ("f", 60.0, 1L))
      .toDF("id", "s", "lab")
    val r = Metrics.gainsTable(df, "s", "id", "lab", tiles = 3,
      bucketWidth = 25.0).orderBy("tile").collect()
    r.map(_.getLong(0)).toSeq shouldBe Seq(0L, 1L, 2L)
    r.map(_.getLong(1)).toSeq shouldBe Seq(2L, 2L, 2L)
    r.map(_.getLong(2)).toSeq shouldBe Seq(2L, 1L, 0L)
    r.map(_.getLong(3)).toSeq shouldBe Seq(10000L, 5000L, 0L)
    r.map(_.getDouble(4)).toSeq shouldBe Seq(2.0, 1.0, 0.0)
  }

  test("gainsTable breaks score ties by id deterministically") {
    // all scores equal → order is pure id order a<b<c<d; 2 tiles
    val df = Seq(("a", 1.0, 1L), ("b", 1.0, 1L), ("c", 1.0, 0L),
      ("d", 1.0, 0L)).toDF("id", "s", "lab")
    val r = Metrics.gainsTable(df, "s", "id", "lab", tiles = 2)
      .orderBy("tile").collect()
    r.map(_.getLong(2)).toSeq shouldBe Seq(2L, 0L)
  }

  test("exactQuantiles matches percentile() order statistics exactly") {
    // 5 values: p50 = 3.0; p75 at pos 3.0 -> 4.0; p90 at pos 3.6 ->
    // 4 + 0.6*(5-4) = 4.6
    val df = Seq(5.0, 1.0, 4.0, 2.0, 3.0).toDF("v")
    val out = Metrics.exactQuantiles(df, "v", Seq(0.5, 0.75, 0.9), 1.0)
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    out(0.5) shouldBe ((5L, 3.0))
    out(0.75) shouldBe ((5L, 4.0))
    out(0.9) shouldBe ((5L, 4.6))
    // parity with the memory-bound aggregate on messier data
    val big = Seq.tabulate(137)(i => ((i * 37) % 100) / 3.0).toDF("v")
    val mine = Metrics.exactQuantiles(big, "v", Seq(0.25, 0.5, 0.95), 7.0)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    val ref = big.selectExpr(
        "percentile(v, array(0.25D, 0.5D, 0.95D)) AS p")
      .collect().head.getSeq[Double](0)
      .map(x => math.floor(x * 1e4 + 0.5) / 1e4)
    mine(0.25) shouldBe ref(0)
    mine(0.5) shouldBe ref(1)
    mine(0.95) shouldBe ref(2)
    Metrics.exactQuantiles(df.limit(0), "v", Seq(0.5), 1.0)
      .count() shouldBe 0L
  }

  test("quantilesFromCounts equals exactQuantiles on the expanded multiset") {
    // counts: 1.0 x3, 5.0 x1, 9.0 x2 -> multiset of 6
    val counts = Seq((1.0, 3L), (5.0, 1L), (9.0, 2L)).toDF("v", "c")
    val expanded = Seq.fill(3)(1.0) ++ Seq(5.0) ++ Seq.fill(2)(9.0)
    val fromCounts = Metrics.quantilesFromCounts(counts, "v", "c",
        Seq(0.0, 0.3, 0.5, 0.9, 1.0), 4.0)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    val direct = Metrics.exactQuantiles(expanded.toDF("v"), "v",
        Seq(0.0, 0.3, 0.5, 0.9, 1.0), 4.0)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    fromCounts shouldBe direct
    // non-positive counts are ignored
    Metrics.quantilesFromCounts(
      counts.unionAll(Seq((99.0, 0L)).toDF("v", "c")), "v", "c",
      Seq(1.0), 4.0).collect().head.getDouble(2) shouldBe 9.0
  }

  // R-7 ground truth over a driver-side sort — the memory-bound shape
  // the distributed bucketed-rank path must agree with exactly
  private def r7Truth(vs: Seq[Double], q: Double): Double = {
    val x = vs.sorted
    val pos = (x.size - 1).toDouble * q
    val lo = math.floor(pos).toInt
    val hi = math.min(lo + 1, x.size - 1)
    graft.functions.Rounding.proundD(x(lo) + (x(hi) - x(lo)) * (pos - lo), 4)
  }

  test("exactQuantiles refines oversized buckets instead of sorting them") {
    // ONE width-1000 bucket holds all 500 values; leafCap 8 forces
    // several refinement levels, and the ·0.125 tie structure puts
    // constant runs inside cells (the min==max driver resolution)
    val vs = Seq.tabulate(500)(i =>
      ((i * 131) % 97).toDouble + (i % 7) * 0.125)
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.99, 1.0)
    val out = Metrics.exactQuantiles(vs.toDF("v"), "v", qs, 1000.0,
        leafCap = 8)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    qs.foreach(q => out(q) shouldBe r7Truth(vs, q))
  }

  test("exactQuantiles ranks landing in the first, last, and one shared bucket") {
    // 300 values across 30 width-1 buckets: q=0/0.003 live in the
    // FIRST bucket, q=0.997/1 in the LAST — the prune must keep
    // exactly those edges alive
    val vs = Seq.tabulate(300)(i => i / 10.0)
    val edges = Seq(0.0, 0.003, 0.997, 1.0)
    val oute = Metrics.exactQuantiles(vs.toDF("v"), "v", edges, 1.0)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    edges.foreach(q => oute(q) shouldBe r7Truth(vs, q))
    // every neighbor rank of these quantiles falls in ONE mid bucket
    // (ranks 122–149 of width-1 bucket [12,13)) — a single survivor
    val mids = Seq(0.41, 0.45, 0.49)
    val outm = Metrics.exactQuantiles(vs.toDF("v"), "v", mids, 1.0)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    mids.foreach(q => outm(q) shouldBe r7Truth(vs, q))
  }

  test("exactQuantiles resolves constant and two-valued runs with no rank pass") {
    // a constant column: the only bucket has min == max and resolves
    // on the driver even though its count dwarfs leafCap
    val const = Seq.fill(100)(42.5)
    Metrics.exactQuantiles(const.toDF("v"), "v", Seq(0.0, 0.5, 1.0),
        8.0, leafCap = 2)
      .collect().foreach { r =>
        r.getLong(1) shouldBe 100L
        r.getDouble(2) shouldBe 42.5
      }
    // two heavy runs: refinement splits them into two constant cells,
    // both resolved driver-side; the median interpolates across them
    val two = Seq.fill(50)(1.0) ++ Seq.fill(50)(2.0)
    Metrics.exactQuantiles(two.toDF("v"), "v", Seq(0.5), 8.0,
        leafCap = 2)
      .collect().head.getDouble(2) shouldBe 1.5
  }

  test("exactQuantiles equals the driver-sort truth under forced recursion") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      vs <- Gen.nonEmptyListOf(Gen.chooseNum(-50, 50).map(i => i * 0.25))
      qs <- Gen.nonEmptyListOf(Gen.oneOf(0.0, 0.1, 0.37, 0.5, 0.9, 1.0))
    } yield (vs, qs.distinct)
    check(Prop.forAll(gen) { case (vs, qs) =>
      val out = Metrics.exactQuantiles(vs.toDF("v"), "v", qs, 7.0,
          leafCap = 4)
        .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
      qs.forall(q => out(q) == r7Truth(vs, q))
    })
  }

  test("calibrationBins reports exact bin means and rates") {
    val df = Seq((0.25, 0L), (0.75, 1L), (1.5, 1L), (1.5, 1L))
      .toDF("s", "lab")
    val r = Metrics.calibrationBins(df, "s", "lab", binWidth = 1.0)
      .orderBy("bin").collect()
    r.length shouldBe 2
    r(0).getLong(0) shouldBe 0L
    r(0).getDouble(1) shouldBe 0.0
    r(0).getLong(2) shouldBe 2L
    r(0).getLong(3) shouldBe 1L
    r(0).getDouble(4) shouldBe 0.5
    r(0).getLong(5) shouldBe 5000L
    r(1).getLong(0) shouldBe 1L
    r(1).getDouble(4) shouldBe 1.5
    r(1).getLong(5) shouldBe 10000L
  }

  private def wilsonRef(k: Long, n: Long, z: Double = 1.959964): Double = {
    // independent driver-side re-derivation of the interval formula
    val p = k.toDouble / n
    val lb = (p + z * z / (2.0 * n) - z * math.sqrt(math.max(0.0,
      (p * (1.0 - p) + z * z / (4.0 * n)) / n))) / (1.0 + z * z / n)
    graft.functions.Rounding.p6d(lb)
  }

  test("wilsonLowerBound prices in sample size: 2/2 ranks below 80/100") {
    val df = (Seq.fill(2)(("small", 1L)) ++
      (1 to 100).map(i => ("large", if (i <= 80) 1L else 0L)))
      .toDF("grp", "success")
    val out = Metrics.wilsonLowerBound(df, "grp", "success")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    out("small") shouldBe ((2L, 2L, 10000L, wilsonRef(2, 2)))
    out("large") shouldBe ((100L, 80L, 8000L, wilsonRef(80, 100)))
    // the whole point: the 100%-rate tiny sample ranks BELOW 80/100
    out("small")._4 should be < out("large")._4
    // sanity: the bound sits inside [0, p-hat]
    out("large")._4 should (be > 0.7 and be < 0.8)
  }

  test("wilsonLowerBound edge rates and the minN cut") {
    val df = ((1 to 30).map(i => ("none", 0L)) ++
      (1 to 30).map(i => ("all", 1L)) ++ Seq(("tiny", 1L)))
      .toDF("grp", "success")
    val out = Metrics.wilsonLowerBound(df, "grp", "success", minN = 2L)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    out.keySet shouldBe Set("none", "all") // tiny fails minN
    out("none") shouldBe 0.0 // k=0: the bound floors at zero
    out("all") shouldBe wilsonRef(30, 30)
    out("all") should be < 1.0 // never certain from a finite sample
  }

  test("woeIv matches hand-computed evidence weights") {
    // bin A: 1 pos / 3 neg; bin B: 3 pos / 1 neg; bin C: 0 pos / 2 neg
    // totals (INCLUDING the dropped zero-cell bin C): T_pos=4, T_neg=6
    // woe(A) = ln((3/6)/(1/4)) = ln 2; iv(A) = (3/6 - 1/4)·ln 2
    // woe(B) = ln((1/6)/(3/4)) = ln(2/9); iv(B) = (1/6 - 3/4)·ln(2/9)
    val df = Seq(("A", 1L), ("A", 0L), ("A", 0L), ("A", 0L),
      ("B", 1L), ("B", 1L), ("B", 1L), ("B", 0L),
      ("C", 0L), ("C", 0L)).toDF("bin", "y")
    val out = Metrics.woeIv(df, "bin", "y").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    out.keySet shouldBe Set("A", "B") // zero-cell bin dropped
    out("A")._1 shouldBe 1L
    out("A")._2 shouldBe 3L
    out("A")._3 shouldBe math.log(2.0) +- 1e-12
    out("A")._4 shouldBe 0.25 * math.log(2.0) +- 1e-12
    out("B")._3 shouldBe math.log(2.0 / 9.0) +- 1e-12
    out("B")._4 shouldBe (1.0 / 6.0 - 0.75) * math.log(2.0 / 9.0) +- 1e-9
    // both contributions are non-negative (x - y and ln share sign)
    out("A")._4 should be >= 0.0
    out("B")._4 should be >= 0.0
  }

  test("wilsonLowerBound rejects key columns that collide with outputs") {
    val df = Seq(("g", 1L)).toDF("n", "ok")
    an[IllegalArgumentException] should be thrownBy
      Metrics.wilsonLowerBound(df, "n", "ok")
  }

  test("twoProportionZ matches the hand-computed pooled z and exact flag") {
    // key t1: arm a 10/100 vs arm b 25/100 -> A = 25*100-10*100 = 1500,
    // N=200, K=35: z = 1500*sqrt(200/(100*100*35*165)) = 2.791367...,
    // z^2 = 7.79 > 3.8416 -> significant
    // key t2: 10/100 vs 12/100 -> z small, not significant
    val rows =
      (1 to 100).map(i => ("t1", 0L, if (i <= 10) 1L else 0L)) ++
      (1 to 100).map(i => ("t1", 1L, if (i <= 25) 1L else 0L)) ++
      (1 to 100).map(i => ("t2", 0L, if (i <= 10) 1L else 0L)) ++
      (1 to 100).map(i => ("t2", 1L, if (i <= 12) 1L else 0L))
    val out = Metrics.twoProportionZ(rows.toDF("t", "arm", "ok"),
      "t", "arm", "ok").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))))
      .toMap
    out("t1")._1 shouldBe 100L
    out("t1")._2 shouldBe 10L
    out("t1")._4 shouldBe 25L
    val z1 = 1500.0 * math.sqrt(200.0 / (100.0 * 100.0 * 35.0 * 165.0))
    out("t1")._5 shouldBe math.floor(z1 * 1e6 + 0.5) / 1e6 +- 1e-12
    out("t1")._6 shouldBe true
    out("t2")._6 shouldBe false
    math.abs(out("t2")._5) should be < 1.0
  }

  test("twoProportionZFromCounts: giant-arm counts raise, big in-range counts don't") {
    // arms of 4e9 with a real difference: A = k_b*n_a - k_a*n_b would
    // wrap raw BIGINT, and 625*A^2*N would blow DECIMAL(38,0) — the
    // guard must raise loudly, not emit a NULL flag
    val giant = Seq(("t", 4000000000L, 1000000000L, 4000000000L,
      3000000000L)).toDF("t", "n_a", "k_a", "n_b", "k_b")
    val e = intercept[Exception] {
      Metrics.twoProportionZFromCounts(giant, "t").collect()
    }
    e.getMessage should include("DECIMAL(38,0) capacity")
    // 1M per arm with a 2pp difference stays exact and significant
    // (625*A^2*N ~ 5e29, well inside capacity)
    val big = Seq(("t", 1000000L, 100000L, 1000000L, 120000L))
      .toDF("t", "n_a", "k_a", "n_b", "k_b")
    val r = Metrics.twoProportionZFromCounts(big, "t").collect().head
    r.getBoolean(6) shouldBe true
    r.getDouble(5) should be > 40.0
  }

  test("twoProportionZ handles degenerate and one-arm keys") {
    // all-failure key -> z = 0, not significant; one-arm key dropped;
    // negative direction carries its sign
    val rows = Seq(("dead", 0L, 0L), ("dead", 1L, 0L),
      ("solo", 0L, 1L), ("solo", 0L, 0L)) ++
      (1 to 50).map(i => ("neg", 0L, if (i <= 30) 1L else 0L)) ++
      (1 to 50).map(i => ("neg", 1L, if (i <= 5) 1L else 0L))
    val out = Metrics.twoProportionZ(rows.toDF("t", "arm", "ok"),
      "t", "arm", "ok").collect()
      .map(r => r.getString(0) -> ((r.getDouble(5), r.getBoolean(6))))
      .toMap
    out.keySet shouldBe Set("dead", "neg")
    out("dead") shouldBe ((0.0, false))
    out("neg")._1 should be < 0.0
    out("neg")._2 shouldBe true // 60% vs 10% on 50/50 is decisive
  }
  test("cohensKappa hand-computed confusion matrix") {
    // 20 yy, 5 yn, 10 ny, 15 nn: n=50, agree=35, po=0.7
    // marginals a: y 25 / n 25; b: y 30 / n 20 -> pe-sum = 1250
    // A = 50*35 - 1250 = 500, B = 2500 - 1250 = 1250 -> kappa = 0.4
    // Landis-Koch 0.4 closes the 'fair' band (5A = 2500 = 2B)
    val rows =
      Seq.fill(20)(("g", "y", "y")) ++ Seq.fill(5)(("g", "y", "n")) ++
      Seq.fill(10)(("g", "n", "y")) ++ Seq.fill(15)(("g", "n", "n"))
    val r = Metrics.cohensKappa(rows.toDF("g", "a", "b"), "g", "a", "b")
      .collect().head
    (r.getLong(1), r.getLong(2)) shouldBe ((50L, 35L))
    r.getDouble(3) shouldBe 0.4
    r.getString(4) shouldBe "fair"
  }

  test("cohensKappa: perfect agreement, constant labelers, chance-level") {
    val perfect = Seq(("p", "x", "x"), ("p", "y", "y"), ("p", "z", "z"))
    val rp = Metrics.cohensKappa(perfect.toDF("g", "a", "b"),
      "g", "a", "b").collect().head
    rp.getDouble(3) shouldBe 1.0
    rp.getString(4) shouldBe "almost perfect"
    // both labelers constant: chance agreement certain -> degenerate
    val const = Seq(("c", "x", "x"), ("c", "x", "x"))
    val rc = Metrics.cohensKappa(const.toDF("g", "a", "b"),
      "g", "a", "b").collect().head
    rc.getDouble(3) shouldBe 0.0
    rc.getString(4) shouldBe "degenerate"
    // independent 50/50 labelers at exactly chance: kappa 0, poor
    val chance = Seq(("h", "x", "x"), ("h", "x", "y"),
      ("h", "y", "x"), ("h", "y", "y"))
    val rh = Metrics.cohensKappa(chance.toDF("g", "a", "b"),
      "g", "a", "b").collect().head
    rh.getDouble(3) shouldBe 0.0
    rh.getString(4) shouldBe "poor"
  }

  test("cohensKappa is symmetric in the two labelings") {
    import org.scalacheck.{Gen, Prop}
    val gen = Gen.listOfN(20, for {
      a <- Gen.oneOf("x", "y", "z"); b <- Gen.oneOf("x", "y", "z")
    } yield ("g", a, b))
    check(Prop.forAll(gen) { rows =>
      val k1 = Metrics.cohensKappa(rows.toDF("g", "a", "b"),
        "g", "a", "b").collect().head
      val k2 = Metrics.cohensKappa(
        rows.map { case (g, a, b) => (g, b, a) }.toDF("g", "a", "b"),
        "g", "a", "b").collect().head
      k1.getDouble(3) == k2.getDouble(3) &&
        k1.getString(4) == k2.getString(4)
    })
  }
  test("ndcgAtK hand-computed graded ranking") {
    // score ranking 1,2,3 with rels 3,0,2: DCG = 7 + 0 + 3*0.5 = 8.5
    // ideal 1,3,2: IDCG = 7 + 3/log2(3) = 8.892789 -> ndcg = ratio
    val rows = Seq(("g", 5.0, 1L, 3L), ("g", 4.0, 2L, 0L),
      ("g", 3.0, 3L, 2L))
    val r = Metrics.ndcgAtK(rows.toDF("q", "s", "id", "rel"),
      "q", "s", "id", "rel", k = 10).collect().head
    r.getLong(1) shouldBe 3L
    r.getDouble(2) shouldBe 8.5
    r.getDouble(3) shouldBe 8.892789
    r.getDouble(4) shouldBe graft.functions.Rounding.p6d(8.5 / 8.892789)
  }

  test("ndcgAtK: perfect ranking 1.0, no relevant items 0.0, k truncates") {
    // score equals relevance: the ranking IS ideal
    val perfect = Seq(("p", 3.0, 1L, 3L), ("p", 2.0, 2L, 2L),
      ("p", 1.0, 3L, 1L))
    Metrics.ndcgAtK(perfect.toDF("q", "s", "id", "rel"),
      "q", "s", "id", "rel").collect().head.getDouble(4) shouldBe 1.0
    val none = Seq(("z", 2.0, 1L, 0L), ("z", 1.0, 2L, 0L))
    val rz = Metrics.ndcgAtK(none.toDF("q", "s", "id", "rel"),
      "q", "s", "id", "rel").collect().head
    rz.getDouble(3) shouldBe 0.0
    rz.getDouble(4) shouldBe 0.0
    // k = 1 sees only the top item: a relevant item at rank 2 is lost
    val trunc = Seq(("t", 2.0, 1L, 0L), ("t", 1.0, 2L, 3L))
    Metrics.ndcgAtK(trunc.toDF("q", "s", "id", "rel"),
      "q", "s", "id", "rel", k = 1).collect().head.getDouble(2) shouldBe 0.0
  }

  test("ndcgAtK is 1.0 whenever score is a monotone function of relevance") {
    import org.scalacheck.{Gen, Prop}
    val gen = Gen.listOfN(12, Gen.choose(0L, 4L))
    check(Prop.forAll(gen) { rels =>
      (!rels.exists(_ > 0L)) || {
        val rows = rels.zipWithIndex.map { case (rel, i) =>
          ("g", rel.toDouble * 10.0, i.toLong, rel)
        }
        Metrics.ndcgAtK(rows.toDF("q", "s", "id", "rel"),
          "q", "s", "id", "rel", k = 5)
          .collect().head.getDouble(4) == 1.0
      }
    })
  }

  test("meanReciprocalRank hand-computed with a missing query") {
    val rows = Seq(("g", 1L, 3.0, 1L, 0L), ("g", 1L, 2.0, 2L, 1L),
      ("g", 1L, 1.0, 3L, 0L),
      ("g", 2L, 9.0, 4L, 0L), ("g", 2L, 8.0, 5L, 0L))
    val r = Metrics.meanReciprocalRank(rows.toDF("g", "qq", "s", "id", "rel"),
      "g", "qq", "s", "id", "rel").collect().head
    (r.getLong(1), r.getLong(2)) shouldBe ((2L, 1L))
    r.getDouble(3) shouldBe 0.25 // (1/2 + 0) / 2
  }

  test("fleissKappa hand-computed three-rater cards") {
    // item1 xxx, item2 xyy: Pbar = 2/3, Pe = 5/9 -> kappa = 1/4, fair
    val rows = Seq(("g", 1L, "x", "x", "x"), ("g", 2L, "x", "y", "y"))
    val r = Metrics.fleissKappa(rows.toDF("g", "i", "r1", "r2", "r3"),
      "g", "i", Seq("r1", "r2", "r3")).collect().head
    (r.getLong(1), r.getLong(2)) shouldBe ((2L, 3L))
    r.getDouble(3) shouldBe 0.25
    r.getString(4) shouldBe "fair"
    // unanimous raters across two categories: kappa 1
    val perfect = Seq(("p", 1L, "x", "x", "x"), ("p", 2L, "y", "y", "y"))
    val rpr = Metrics.fleissKappa(perfect.toDF("g", "i", "r1", "r2", "r3"),
      "g", "i", Seq("r1", "r2", "r3")).collect().head
    rpr.getDouble(3) shouldBe 1.0
    rpr.getString(4) shouldBe "almost perfect"
    // single category everywhere: chance agreement certain
    val const = Seq(("c", 1L, "x", "x", "x"), ("c", 2L, "x", "x", "x"))
    val rc = Metrics.fleissKappa(const.toDF("g", "i", "r1", "r2", "r3"),
      "g", "i", Seq("r1", "r2", "r3")).collect().head
    rc.getDouble(3) shouldBe 0.0
    rc.getString(4) shouldBe "degenerate"
  }

  test("fleissKappa is invariant to rater column order and label renaming") {
    import org.scalacheck.{Gen, Prop}
    val gen = Gen.listOfN(8, for {
      a <- Gen.oneOf("x", "y"); b <- Gen.oneOf("x", "y")
      c <- Gen.oneOf("x", "y")
    } yield (a, b, c))
    check(Prop.forAll(gen) { rs =>
      val rows = rs.zipWithIndex.map { case ((a, b, c), i) =>
        ("g", i.toLong, a, b, c)
      }
      val df = rows.toDF("g", "i", "r1", "r2", "r3")
      val k1 = Metrics.fleissKappa(df, "g", "i", Seq("r1", "r2", "r3"))
        .collect().head
      val k2 = Metrics.fleissKappa(df, "g", "i", Seq("r3", "r1", "r2"))
        .collect().head
      val ren = rows.map { case (g, i, a, b, c) =>
        def m(s: String) = if (s == "x") "u" else "v"
        (g, i, m(a), m(b), m(c))
      }.toDF("g", "i", "r1", "r2", "r3")
      val k3 = Metrics.fleissKappa(ren, "g", "i", Seq("r1", "r2", "r3"))
        .collect().head
      k1.getDouble(3) == k2.getDouble(3) && k1.getDouble(3) == k3.getDouble(3)
    })
  }
  test("linkageQuality hand-computed pair sets with canonicalization") {
    // predicted {(1,2),(2,3),(3,4)} (one emitted reversed + a dup),
    // truth {(1,2),(4,3)}: tp=2, fp=1, fn=0
    val pred = Seq((1L, 2L), (3L, 2L), (3L, 4L), (2L, 1L))
      .toDF("id_a", "id_b")
    val truth = Seq((1L, 2L), (4L, 3L)).toDF("id_a", "id_b")
    val r = Metrics.linkageQuality(pred, truth).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) shouldBe ((3L, 2L, 2L, 1L, 0L))
    r.getLong(5) shouldBe 666666L // precision 2/3
    r.getLong(6) shouldBe 1000000L // recall 2/2
    r.getLong(7) shouldBe 800000L // f1 = 4/5
    // self-pairs are dropped, empty truth reports NULL recall
    val selfy = Seq((5L, 5L)).toDF("id_a", "id_b")
    val r2 = Metrics.linkageQuality(selfy, truth.limit(0)).collect().head
    r2.getLong(0) shouldBe 0L
    assert(r2.isNullAt(5) && r2.isNullAt(6) && r2.isNullAt(7))
  }

  test("linkageQuality against exactDupPairs truth on a planted corpus") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "Same Text"),
      (4L, "other")).toDF("doc_id", "text")
    // md5(lower(.)) collapses 1,2,3 -> truth pairs (1,2)(1,3)(2,3)
    val truth = graft.operators.Dedup.exactDupPairs(docs, "text", "doc_id")
    truth.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Set((1L, 2L), (1L, 3L), (2L, 3L))
    // a perfect predictor scores 10^6 across the board
    val r = Metrics.linkageQuality(truth, truth).collect().head
    (r.getLong(5), r.getLong(6), r.getLong(7)) shouldBe
      ((1000000L, 1000000L, 1000000L))
  }
  test("isotonicCalibration pools adjacent violators (hand minimax)") {
    // bin rates [1.0, 0.0, 1.0] with equal weights: PAV pools the
    // first two to 0.5 and leaves the third at 1.0
    val rows = Seq(("g", 0.0, 1L), ("g", 10.0, 1L),
      ("g", 30.0, 0L), ("g", 40.0, 0L),
      ("g", 60.0, 1L), ("g", 70.0, 1L))
    val out = Metrics.isotonicCalibration(rows.toDF("g", "s", "y"),
      "g", "s", "y", binWidth = 25.0).orderBy("bin").collect()
    out.map(_.getLong(1)).toSeq shouldBe Seq(0L, 1L, 2L)
    out.map(_.getLong(4)).toSeq shouldBe Seq(1000000L, 0L, 1000000L)
    out.map(_.getDouble(5)).toSeq shouldBe Seq(0.5, 0.5, 1.0)
    // already-monotone rates pass through unchanged
    val mono = Seq(("m", 0.0, 0L), ("m", 10.0, 0L),
      ("m", 30.0, 1L), ("m", 40.0, 0L),
      ("m", 60.0, 1L), ("m", 70.0, 1L))
    Metrics.isotonicCalibration(mono.toDF("g", "s", "y"),
      "g", "s", "y", binWidth = 25.0).orderBy("bin").collect()
      .map(_.getDouble(5)).toSeq shouldBe Seq(0.0, 0.5, 1.0)
  }

  test("isotonicCalibration: monotone, mean-preserving, and maxBins-guarded") {
    import org.scalacheck.{Gen, Prop}
    val gen = Gen.listOfN(30, for {
      s <- Gen.choose(0, 199); y <- Gen.oneOf(0L, 1L)
    } yield (s.toDouble, y))
    check(Prop.forAll(gen) { data =>
      val out = Metrics.isotonicCalibration(
        data.map { case (s, y) => ("g", s, y) }.toDF("g", "s", "y"),
        "g", "s", "y", binWidth = 20.0).orderBy("bin").collect()
      val iso = out.map(_.getDouble(5))
      val monotone = iso.zip(iso.drop(1)).forall { case (a, b) => a <= b }
      // PAV preserves the weighted mean: sum iso*n = sum pos
      val mass = out.map(r => r.getDouble(5) * r.getLong(2)).sum
      monotone && math.abs(mass - data.count(_._2 == 1L)) < 1e-3
    })
    val e = intercept[Exception] {
      Metrics.isotonicCalibration(
        (1 to 20).map(i => ("g", i * 10.0, 1L)).toDF("g", "s", "y"),
        "g", "s", "y", binWidth = 10.0, maxBins = 5).collect()
    }
    e.getMessage should include("isotonicCalibration")
  }

  test("calibrationCard hand-computed ECE and Brier decomposition") {
    // bin0: conf 0.2 rate 0.5; bin1: conf 1.5 rate 1.0; base 0.75
    val rows = Seq(("g", 0.2, 1L), ("g", 0.2, 0L),
      ("g", 1.5, 1L), ("g", 1.5, 1L))
    val r = Metrics.calibrationCard(rows.toDF("g", "s", "y"),
      "g", "s", "y", binWidth = 1.0).collect().head
    (r.getLong(1), r.getLong(2)) shouldBe ((4L, 3L))
    r.getDouble(3) shouldBe 0.4 // 0.5*0.3 + 0.5*0.5
    r.getDouble(4) shouldBe 0.17 // 0.5*0.09 + 0.5*0.25
    r.getDouble(5) shouldBe 0.0625
    r.getDouble(6) shouldBe 0.1875
  }

  test("prCurve hand-computed operating points") {
    val rows = Seq(("g", 10.0, 1L), ("g", 20.0, 0L), ("g", 30.0, 1L))
    val out = Metrics.prCurve(rows.toDF("g", "s", "y"), "g", "s", "y",
        Seq(15L, 25L))
      .orderBy("threshold").collect()
    val t15 = out(0)
    (t15.getLong(3), t15.getLong(4), t15.getLong(5)) shouldBe ((1L, 1L, 1L))
    (t15.getLong(6), t15.getLong(7), t15.getLong(8)) shouldBe
      ((500000L, 500000L, 500000L))
    val t25 = out(1)
    (t25.getLong(3), t25.getLong(4), t25.getLong(5)) shouldBe ((1L, 0L, 1L))
    (t25.getLong(6), t25.getLong(7), t25.getLong(8)) shouldBe
      ((1000000L, 500000L, 666666L))
    // a threshold below every score predicts all positive: recall 10^6
    val lo = Metrics.prCurve(rows.toDF("g", "s", "y"), "g", "s", "y",
      Seq(0L)).collect().head
    lo.getLong(7) shouldBe 1000000L
  }

  test("rbo: head-weighted overlap — identical 0.75, reversed 0.25 at k=2 p=0.5") {
    import graft.functions.Rounding.p6d
    def run(rows: Seq[(String, Long, Long, Double)]) =
      Metrics.rbo(rows.toDF("g", "arm", "item", "s"), "g", "arm",
        "item", "s", k = 2, p = 0.5)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) -1.0 else r.getDouble(4)))).toMap
    val out = run(Seq(
      // same: identical rankings (A first, B second) in both arms
      ("same", 0L, 1L, 10.0), ("same", 0L, 2L, 5.0),
      ("same", 1L, 1L, 10.0), ("same", 1L, 2L, 5.0),
      // rev: the two arms reverse the order
      ("rev", 0L, 1L, 10.0), ("rev", 0L, 2L, 5.0),
      ("rev", 1L, 1L, 5.0), ("rev", 1L, 2L, 10.0),
      // disj: disjoint item sets
      ("disj", 0L, 1L, 10.0), ("disj", 1L, 2L, 10.0),
      // one: a single arm
      ("one", 0L, 1L, 10.0)))
    // S(1) = 1 + 0.25 = 1.25, S(2) = 0.25
    out("same") shouldBe ((2L, 2L, 2L,
      p6d(0.5 * (BigDecimal(p6d(1.25)) + BigDecimal(p6d(0.25))).toDouble)))
    out("rev")._4 shouldBe p6d(0.5 * (BigDecimal(p6d(0.25)) * 2).toDouble)
    out("disj") shouldBe ((1L, 1L, 0L, 0.0))
    out("one")._4 shouldBe -1.0 // NULL: nothing to compare
    an[IllegalArgumentException] should be thrownBy
      Metrics.rbo(Seq(("g", 0L, 1L, 1.0)).toDF("g", "arm", "item", "s"),
        "g", "arm", "item", "s", k = 0)
  }

  test("qqShift reports per-quantile arm gaps with R-7 interpolation") {
    val rows = (0 to 4).map(i => ("g", 0L, i * 10.0)) ++
      (0 to 4).map(i => ("g", 1L, i * 10.0 + 100.0)) ++
      Seq(("one", 0L, 5.0), ("one", 0L, 7.0))
    val out = Metrics.qqShift(rows.toDF("g", "arm", "v"), "g", "arm",
        "v", qs = Seq(0.1, 0.5))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r).toMap
    val g5 = out(("g", 0.5))
    (g5.getLong(2), g5.getLong(3)) shouldBe ((5L, 5L))
    (g5.getDouble(4), g5.getDouble(5), g5.getDouble(6)) shouldBe
      ((20.0, 120.0, 100.0))
    // p10 interpolates: (n-1)*q = 0.4 -> 0 + 0.4*10
    out(("g", 0.1)).getDouble(4) shouldBe 4.0
    out(("g", 0.1)).getDouble(6) shouldBe 100.0
    // an empty arm: NULL quantile and shift, counts intact
    val o = out(("one", 0.5))
    (o.getLong(2), o.getLong(3)) shouldBe ((2L, 0L))
    o.getDouble(4) shouldBe 6.0
    assert(o.isNullAt(5) && o.isNullAt(6))
    an[IllegalArgumentException] should be thrownBy
      Metrics.qqShift(rows.toDF("g", "arm", "v"), "g", "arm", "v",
        Seq(0.5, 0.1))
  }

  test("vMeasure: perfect clustering scores 1, one-cluster scores h=0 c=1") {
    val perfect = Seq(("g", "c1", "l1"), ("g", "c1", "l1"),
      ("g", "c2", "l2"), ("g", "c2", "l2"))
    val rp = Metrics.vMeasure(perfect.toDF("g", "c", "l"), "g", "c", "l")
      .collect().head
    (rp.getLong(1), rp.getDouble(2), rp.getDouble(3), rp.getDouble(4)) shouldBe
      ((4L, 1.0, 1.0, 1.0))
    // everything in one cluster, two labels: nothing homogeneous,
    // trivially complete
    val lump = Seq(("g", "c1", "l1"), ("g", "c1", "l2"))
    val rl = Metrics.vMeasure(lump.toDF("g", "c", "l"), "g", "c", "l")
      .collect().head
    (rl.getDouble(2), rl.getDouble(3), rl.getDouble(4)) shouldBe
      ((0.0, 1.0, 0.0))
    // one label only: H(label) = 0 -> h = 1 by convention
    val mono = Seq(("g", "c1", "l1"), ("g", "c2", "l1"))
    val rm = Metrics.vMeasure(mono.toDF("g", "c", "l"), "g", "c", "l")
      .collect().head
    (rm.getDouble(2), rm.getDouble(3), rm.getDouble(4)) shouldBe
      ((1.0, 0.0, 0.0))
    // two independent groups score independently
    val multi = perfect.map { case (_, c, l) => ("a", c, l) } ++
      lump.map { case (_, c, l) => ("b", c, l) }
    val mm = Metrics.vMeasure(multi.toDF("g", "c", "l"), "g", "c", "l")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    mm shouldBe Map("a" -> 1.0, "b" -> 0.0)
  }

  test("cronbachAlpha matches the closed form with zero-filled cells") {
    import graft.functions.Rounding.p6d
    val sp = spark; import sp.implicits._
    // 3 persons x 2 items; person p3 misses item b (counts as 0)
    // a: (2,4,3)  b: (1,3,0)  totals: (3,7,3)
    val rows = Seq(("g", "p1", "a", 2.0), ("g", "p2", "a", 4.0),
      ("g", "p3", "a", 3.0), ("g", "p1", "b", 1.0), ("g", "p2", "b", 3.0))
    val r = Metrics.cronbachAlpha(rows.toDF("g", "p", "i", "x"),
      "g", "p", "i", "x").collect().head
    r.getAs[Long]("n_persons") shouldBe 3L
    r.getAs[Long]("k_items") shouldBe 2L
    val va = p6d((29.0 - 81.0 / 3) / 2) // var(2,4,3) = 1
    val vb = p6d((10.0 - 16.0 / 3) / 2) // var(1,3,0) = 7/3
    val vt = p6d((67.0 - 169.0 / 3) / 2) // var(3,7,3) = 16/3
    val sv = BigDecimal(va).setScale(6) + BigDecimal(vb).setScale(6)
    r.getAs[Double]("alpha") shouldBe
      p6d(2.0 / 1.0 * (1.0 - sv.toDouble / vt))
    // a single item carries no consistency question: group dropped
    val one = Seq(("h", "p1", "a", 1.0), ("h", "p2", "a", 2.0))
    Metrics.cronbachAlpha(one.toDF("g", "p", "i", "x"),
      "g", "p", "i", "x").count() shouldBe 0L
  }

  test("weightedKappa: 1 on agreement, -1 on 2-level anti-agreement, guard raises") {
    val sp = spark; import sp.implicits._
    val agree = Seq(("g", 0L, 0L), ("g", 1L, 1L), ("g", 2L, 2L))
      .toDF("g", "a", "b")
    val ra = Metrics.weightedKappa(agree, "g", "a", "b", maxLevel = 5)
      .collect().head
    ra.getAs[Long]("n_agree") shouldBe 3L
    ra.getAs[Double]("kappa_w") shouldBe 1.0
    val anti = Seq(("g", 0L, 1L), ("g", 1L, 0L)).toDF("g", "a", "b")
    Metrics.weightedKappa(anti, "g", "a", "b", 5)
      .collect().head.getAs[Double]("kappa_w") shouldBe -1.0
    // one-step vs two-step disagreement: linear weights see the gap
    val near = Seq(("g", 0L, 1L), ("g", 1L, 0L), ("g", 2L, 2L))
      .toDF("g", "a", "b")
    val far = Seq(("g", 0L, 2L), ("g", 2L, 0L), ("g", 1L, 1L))
      .toDF("g", "a", "b")
    val kn = Metrics.weightedKappa(near, "g", "a", "b", 5)
      .collect().head.getAs[Double]("kappa_w")
    val kf = Metrics.weightedKappa(far, "g", "a", "b", 5)
      .collect().head.getAs[Double]("kappa_w")
    kn should be > kf
    intercept[Exception] {
      Metrics.weightedKappa(Seq(("g", 9L, 0L)).toDF("g", "a", "b"),
        "g", "a", "b", 5).collect()
    }.getMessage should include("bucket the label columns")
  }

  test("kendallsW: 1 on identical rankings, 0 on a reversed pair, common-item gate") {
    val sp = spark; import sp.implicits._
    // two raters, identical scores over 4 items
    val same = (for (r <- Seq("r1", "r2"); i <- 1 to 4)
      yield ("g", r, i.toLong, i * 10.0)).toDF("g", "r", "i", "s")
    val rs = Metrics.kendallsW(same, "g", "r", "i", "s").collect().head
    rs.getAs[Long]("m_raters") shouldBe 2L
    rs.getAs[Long]("n_items") shouldBe 4L
    rs.getAs[Double]("w") shouldBe 1.0
    // reversed rankings: W = 0 for m = 2
    val rev = ((1 to 4).map(i => ("g", "r1", i.toLong, i * 10.0)) ++
      (1 to 4).map(i => ("g", "r2", i.toLong, (5 - i) * 10.0)))
      .toDF("g", "r", "i", "s")
    Metrics.kendallsW(rev, "g", "r", "i", "s")
      .collect().head.getAs[Double]("w") shouldBe 0.0
    // an item unseen by r2 is excluded from the common ranking
    val partial = same.union(Seq(("g", "r1", 9L, 99.0)).toDF("g", "r", "i", "s"))
    Metrics.kendallsW(partial, "g", "r", "i", "s")
      .collect().head.getAs[Long]("n_items") shouldBe 4L
    // all scores tied: denominator 0 -> NULL
    val flat = (for (r <- Seq("r1", "r2"); i <- 1 to 3)
      yield ("g", r, i.toLong, 5.0)).toDF("g", "r", "i", "s")
    assert(Metrics.kendallsW(flat, "g", "r", "i", "s")
      .collect().head.isNullAt(3))
  }
}
