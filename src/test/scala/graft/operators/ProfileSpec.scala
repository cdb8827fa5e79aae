package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {



  private lazy val implicits = spark.implicits
  import implicits._

  test("profile reports presence, distincts, and min/max per column") {
    val df = Seq(
      (1L, Some("a"), 2.0), (2L, None, 2.0), (3L, Some("b"), 9.5))
      .toDF("id", "s", "v")
    val out = Profile.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    out("id") shouldBe ((0L, 3L, 3L, "1", "3"))
    out("s") shouldBe ((1L, 2L, 2L, "a", "b"))
    out("v") shouldBe ((0L, 3L, 2L, "2.0", "9.5"))
  }

  test("profile branches never sort: no Expand, no Sort in the plan") {
    // string min/max in a combined multi-distinct aggregate would force
    // SortAggregate over an Expand-multiplied stream (the 4x-slower
    // shape the scaladoc documents); pruned per-column branches keep
    // every aggregate ungrouped and sort-free
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = Profile.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    plan should not include "Expand"
    plan should not include "Sort ["
  }

  test("robustOutliers flags modified-z outliers and ignores zero-MAD groups") {
    import spark.implicits._
    // group g: median 10, MAD 1 -> z(100) = 90/1.4826 >> 2; z(11) < 2
    val g = Seq(8.0, 9.0, 10.0, 11.0, 100.0).map(("g", _))
    // group z: >half identical -> MAD 0 -> no outliers by contract
    val zg = Seq(5.0, 5.0, 5.0, 99.0).map(("z", _))
    val df = (g ++ zg).toDF("grp", "v")
    val out = Profile.robustOutliers(df, "v", "grp", z = 2.0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out("g") shouldBe ((5L, 1L))
    out("z") shouldBe ((4L, 0L))
  }

  test("quantileTable emits exact interpolated quantiles per group") {
    import spark.implicits._
    // group g: 1..5 -> p10 = 1.4, p50 = 3.0, p90 = 4.6 (linear interp)
    val df = (1 to 5).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Profile.quantileTable(df, "v", "grp", Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    out(0.1) shouldBe 1.4 +- 1e-9
    out(0.5) shouldBe 3.0 +- 1e-9
    out(0.9) shouldBe 4.6 +- 1e-9
  }

  test("quantileTable rejects out-of-range quantiles") {
    import spark.implicits._
    val df = Seq(("g", 1.0)).toDF("grp", "v")
    an[IllegalArgumentException] should be thrownBy
      Profile.quantileTable(df, "v", "grp", Seq(1.5))
    an[IllegalArgumentException] should be thrownBy
      Profile.quantileTable(df, "v", "grp", Nil)
  }

  test("winsorize clamps into the exact percentile interval without dropping rows") {
    import spark.implicits._
    // 1..10: p10 = 1.9, p90 = 9.1 -> 1 clamps up, 10 clamps down
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Profile.winsorize(df, "v", "grp", loQ = 0.1, hiQ = 0.9)
      .collect().map(r => r.getDouble(r.fieldIndex("v")) ->
        ((r.getDouble(r.fieldIndex("v_w")), r.getInt(r.fieldIndex("__clamped"))))).toMap
    out.size shouldBe 10 // nothing dropped
    out(1.0) shouldBe ((1.9, -1))
    out(10.0) shouldBe ((9.1, 1))
    out(5.0) shouldBe ((5.0, 0))
    an[IllegalArgumentException] should be thrownBy
      Profile.winsorize(df, "v", "grp", loQ = 0.9, hiQ = 0.1)
  }

  test("winsorize keeps null groups and passes null values through") {
    import spark.implicits._
    val df = Seq((Some("g"), Some(1.0)), (Some("g"), Some(2.0)),
      (Some("g"), None), (None, Some(7.0)))
      .toDF("grp", "v")
    val out = Profile.winsorize(df, "v", "grp", loQ = 0.1, hiQ = 0.9)
    out.count() shouldBe 4 // nothing dropped, including the null group
    // null VALUE stays null and is marked untouched (no imputation)
    val nullV = out.filter("v IS NULL").head()
    nullV.isNullAt(nullV.fieldIndex("v_w")) shouldBe true
    nullV.getInt(nullV.fieldIndex("__clamped")) shouldBe 0
    // the null group's single value clamps against its own bounds
    out.filter("grp IS NULL").head()
      .getDouble(2) shouldBe 7.0
  }

  test("rankCorrelation: +1 on monotone, -1 on reversed, 0 on singleton") {
    import spark.implicits._
    val rows =
      (1 to 5).map(i => ("up", i.toLong, i.toDouble, i * 10.0)) ++   // same order
      (1 to 5).map(i => ("down", i.toLong, i.toDouble, -i * 10.0)) ++ // reversed
      Seq(("one", 1L, 3.0, 9.0))                                      // n = 1
    val out = Profile.rankCorrelation(
        rows.toDF("src", "id", "a", "b"), "src", "a", "b", "id")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    out("up") shouldBe 1.0
    out("down") shouldBe -1.0
    out("one") shouldBe 0.0
  }

  test("rankCorrelation matches the hand closed form with tie-break ranks") {
    import spark.implicits._
    // a-ranks by (a, id): 1,2,3,4 ; b-ranks by (b, id): b=5.0 tie
    // broken by id -> ranks (1, 3, 4, 2) -> d = (0, -1, -1, 2),
    // sumd2 = 6, rho = 1 - 36/(4*15) = 0.4
    val rows = Seq(("g", 1L, 1.0, 1.0), ("g", 2L, 2.0, 5.0),
      ("g", 3L, 3.0, 5.0), ("g", 4L, 4.0, 2.0))
    val out = Profile.rankCorrelation(
        rows.toDF("src", "id", "a", "b"), "src", "a", "b", "id").head()
    out.getLong(1) shouldBe 4L
    out.getDouble(2) shouldBe (0.4 +- 1e-12)
  }

  test("weightedMedian selects the smallest value at half the total weight") {
    // uniform weights reduce to the lower median; a heavy tail drags
    // the weighted median to the heavy value
    val df = Seq(
      ("u", 1L, 1L, 10L), ("u", 2L, 1L, 11L), ("u", 3L, 1L, 12L),
      ("h", 1L, 1L, 20L), ("h", 2L, 1L, 21L), ("h", 3L, 1L, 22L),
      ("h", 4L, 5L, 23L)).toDF("grp", "v", "w", "id")
    val out = Profile.weightedMedian(df, "v", "w", "grp", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out("u") shouldBe ((3L, 3L, 2L))  // cum 1,2,3; 2c>=3 first at v=2
    out("h") shouldBe ((4L, 8L, 4L))  // cum 1,2,3,8; 2c>=8 first at v=4
  }

  test("keySkew: uniform fan-in gini 0; hand-checked histogram ginis") {
    // "s": per-key counts [1,1,2] -> T = 1+2+6 = 9,
    //      G = (2·9 − 4·4)/(3·4) = 2/12 -> 1666 bp
    // "w": counts [1,1,8] -> T = 1+2+24 = 27,
    //      G = (54 − 40)/30 = 14/30 -> 4666 bp
    val rows =
      Seq("a", "b", "c", "d").map(k => ("u", k)) ++
      Seq("a", "b", "c", "c").map(k => ("s", k)) ++
      (Seq("a", "b") ++ Seq.fill(8)("c")).map(k => ("w", k))
    val out = Profile.keySkew(rows.toDF("grp", "k"), "k", "grp")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out("u") shouldBe ((4L, 4L, 1L, 0L))
    out("s") shouldBe ((3L, 4L, 2L, 1666L))
    out("w") shouldBe ((3L, 10L, 8L, 4666L))
  }

  test("ksByGroup: hand-checked max CDF gap; whole-corpus group scores 0") {
    // A = {1,1}, B = {3,3}, baseline {1,1,3,3}: A's gap at v=1 is
    // |2·4 − 2·2| = 4 -> 4/(2·4) = 0.5 -> 5000 bp (B symmetric)
    val rows = Seq(("A", 1L), ("A", 1L), ("B", 3L), ("B", 3L))
    val out = Profile.ksByGroup(rows.toDF("grp", "v"), "v", "grp")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out("A") shouldBe ((2L, 5000L))
    out("B") shouldBe ((2L, 5000L))
    val one = Profile.ksByGroup(
      Seq(("only", 1L), ("only", 2L), ("only", 9L)).toDF("grp", "v"), "v", "grp")
      .head()
    one.getLong(2) shouldBe 0L
  }

  test("labelEntropy: single label 0, uniform pair log10(2), skew in between") {
    val rows = Seq(("pure", "en"), ("pure", "en"),
      ("half", "en"), ("half", "de"),
      ("skew", "en"), ("skew", "en"), ("skew", "en"), ("skew", "de"))
    val out = Profile.labelEntropy(rows.toDF("grp", "l"), "l", "grp")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out("pure") shouldBe ((2L, 1L, 0.0))
    out("half")._3 shouldBe (math.log10(2.0) +- 1e-5)
    out("skew")._3 should (be > 0.0 and be < out("half")._3)
  }

  test("psi is exactly zero when the group IS the baseline") {
    val df = Seq(("only", 1L), ("only", 3L), ("only", 16L), ("only", 0L))
      .toDF("grp", "v")
    val out = Profile.psi(df, "v", "grp").head()
    out.getLong(1) shouldBe 4L
    out.getDouble(2) shouldBe 0.0
  }

  test("psi matches the hand-computed smoothed value for a clean shift") {
    // X: 4 rows in bin 0 (v=1); Y: 4 rows in bin 4 (v=16).
    // Global bins {0:4, 4:4}, nb=8, nbins=2, na=4. For X:
    //   bin0: (5/6 - 5/10) * log10(50/30) -> round6 = 0.073950
    //   bin4: (1/6 - 5/10) * log10(10/30) -> round6 = 0.159040
    val expected = 0.073950 + 0.159040
    val rows = (1 to 4).map(i => ("x", 1L)) ++ (1 to 4).map(i => ("y", 16L))
    val out = Profile.psi(rows.toDF("grp", "v"), "v", "grp")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    out("x") shouldBe (expected +- 1e-9)
    out("y") shouldBe (expected +- 1e-9) // symmetric by construction
  }

  test("jsDivergence: identical distributions 0 bits, disjoint vocabularies 1 bit") {
    val docs = Seq(
      ("a", "cat dog cat"), ("b", "cat dog cat"), // b ≡ a
      ("c", "fish bird fish")) // disjoint from both
      .toDF("source", "text")
    val out = Profile.jsDivergence(docs, "text", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    out(("a", "b"))._2 shouldBe 0.0 +- 1e-9 // log2(1) per term, exactly 0
    out(("a", "b"))._1 shouldBe 2L // shared {cat, dog}
    // every term one-sided: contribution 0.5*p*log2(2) = p/2, sums to 1
    out(("a", "c"))._2 shouldBe 1.0 +- 1e-5 // pround6 per term
    out(("a", "c"))._1 shouldBe 4L // union {cat, dog, fish, bird}
    out(("b", "c"))._2 shouldBe 1.0 +- 1e-5
  }

  test("jsDivergence is monotone in overlap and bounded by (0, 1)") {
    val docs = Seq(
      ("a", "w x y z"), ("b", "w x y q"), ("c", "w q r s"))
      .toDF("source", "text")
    val out = Profile.jsDivergence(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    // a∩b = 3 of 4 tokens; a∩c = 1 of 4 — divergence must rank b closer
    out(("a", "b")) should be < out(("a", "c"))
    out.values.foreach { v =>
      v should be >= 0.0
      v should be <= 1.0 + 1e-9
    }
  }

  test("cusumChangePoint finds the level-shift day with integer-exact scores") {
    import org.apache.spark.sql.functions.{col, to_date, lit}
    // group g: days 1-4 at 1 event/day, days 5-8 at 5 events/day.
    // T=24, D=8; S_k = |8*P_k - 24k| peaks at k=4 (P=4): |32-96|=64.
    val rows = (1 to 4).flatMap(d => Seq(("g", s"2024-01-0$d"))) ++
      (5 to 8).flatMap(d => Seq.fill(5)(("g", s"2024-01-0$d")))
    val df = rows.toDF("grp0", "ds")
      .select(col("grp0"), to_date(col("ds")).as("day"))
    val out = Profile.cusumChangePoint(df, "grp0", "day").collect()
    out.length shouldBe 1
    val r = out(0)
    r.getString(0) shouldBe "g"
    r.getDate(1).toString shouldBe "2024-01-04" // last quiet day
    r.getLong(2) shouldBe 64L
    r.getLong(3) shouldBe 8L
    r.getLong(4) shouldBe 24L
    // a perfectly uniform series has cusum 0 with the earliest day
    val flat = (1 to 5).map(d => ("u", s"2024-02-0$d")).toDF("grp0", "ds")
      .select(col("grp0"), to_date(col("ds")).as("day"))
    val r2 = Profile.cusumChangePoint(flat, "grp0", "day").collect()(0)
    r2.getLong(2) shouldBe 0L
    r2.getDate(1).toString shouldBe "2024-02-01" // tie -> earliest
  }

  // balanced 2x2 with a slight diagonal: every e = 1.5,
  // every contrib = pround6(0.25/1.5) = 0.166667, chi2 = 0.666668, dof 1
  private lazy val crossDf = Seq(
    ("x", "u"), ("x", "u"), ("x", "v"),
    ("y", "u"), ("y", "v"), ("y", "v")).toDF("a", "b")

  test("chiSquare matches the hand-computed 2x2 grid") {
    val r = Profile.chiSquare(crossDf, "a", "b").orderBy("a", "b").collect()
    r.length shouldBe 4
    all(r.map(_.getDouble(3))) shouldBe 1.5 // expected
    all(r.map(_.getDouble(4))) shouldBe 0.166667 // contrib
    all(r.map(_.getDouble(5))) shouldBe 0.666668 // chi2
    all(r.map(_.getLong(6))) shouldBe 1L // dof
    r.map(_.getLong(2)).toSeq shouldBe Seq(2L, 1L, 1L, 2L)
  }

  test("chiSquare is exactly zero under perfect independence") {
    val ind = Seq(("x", "u"), ("x", "v"), ("y", "u"), ("y", "v"))
      .toDF("a", "b")
    val r = Profile.chiSquare(ind, "a", "b").collect()
    all(r.map(_.getDouble(5))) shouldBe 0.0
  }

  test("mutualInfo matches the hand-computed nats and marginal entropies") {
    val r = Profile.mutualInfo(crossDf, "a", "b").collect()
    r.length shouldBe 1
    r.head.getLong(0) shouldBe 6L
    r.head.getLong(1) shouldBe 4L
    r.head.getDouble(2) shouldBe 0.056632 +- 1e-9
    r.head.getDouble(3) shouldBe 0.693148 +- 1e-12
    r.head.getDouble(4) shouldBe 0.693148 +- 1e-12
    // a fully determined pair (b = f(a)) has MI = H(a) = H(b)
    val det = Seq(("x", "u"), ("x", "u"), ("y", "v"), ("y", "v"))
      .toDF("a", "b")
    val d = Profile.mutualInfo(det, "a", "b").collect().head
    d.getDouble(2) shouldBe d.getDouble(3)
    d.getDouble(2) shouldBe d.getDouble(4)
  }

  test("chiSquare rejects identical or bookkeeping-colliding columns") {
    an[IllegalArgumentException] should be thrownBy
      Profile.chiSquare(crossDf, "a", "a")
    an[IllegalArgumentException] should be thrownBy
      Profile.mutualInfo(crossDf.withColumnRenamed("a", "n_obs"), "n_obs", "b")
  }

  test("hhi matches hand-computed concentration points") {
    // market A: firm shares 60/40 -> 3600 + 1600 = 5200;
    // market B: monopoly -> 10000; market C: zero total -> dropped;
    // per-firm rows are summed first (f1 = 30 + 30 = 60)
    val df = Seq(("A", "f1", 30.0), ("A", "f1", 30.0), ("A", "f2", 40.0),
      ("B", "g1", 7.5), ("C", "h1", 0.0))
      .toDF("m", "f", "v")
    val out = Profile.hhi(df, "m", "f", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out shouldBe Map("A" -> ((2L, 5200L)), "B" -> ((1L, 10000L)))
  }

  test("hhi raises loudly on net-negative firms instead of exceeding 10000") {
    // +150/-50: total 100 > 0 passes the old filter but the true
    // "hhi" would be 25000 — out of the documented range with no
    // signal on either engine (round-10 review finding)
    val df = Seq(("m", "a", 150.0), ("m", "b", -50.0)).toDF("m", "f", "v")
    val e = intercept[Exception] {
      Profile.hhi(df, "m", "f", "v").collect()
    }
    e.getMessage should include("negative per-firm total")
  }

  test("hhi of n equal firms is floor(10000/n); null keys dropped") {
    val eq = (1 to 3).map(i => ("m", s"f$i", 10.0)).toDF("m", "f", "v")
    Profile.hhi(eq, "m", "f", "v").collect().head.getLong(2) shouldBe 3333L
    val withNull = Seq((Option("m"), Option("f"), 5.0),
      (Option.empty[String], Option("f"), 5.0),
      (Option("m"), Option.empty[String], 5.0)).toDF("m", "f", "v")
    val r = Profile.hhi(withNull, "m", "f", "v").collect()
    r.length shouldBe 1
    r.head.getLong(2) shouldBe 10000L
  }

  test("dispersionIndex counts zero periods via the global M") {
    // 4 global periods. Key a: 2 events in each of the 4 -> F = 0.
    // Key b: 4 events all in one period -> S=4, Q=16,
    // F_bp = 10^4*(4*16 - 16)/(4*4) = 30000 (bursty).
    // Key c: one event in each of 2 periods -> S=2, Q=2,
    // F_bp = 10^4*(4*2 - 4)/(4*2) = 5000 (regular presence, but
    // absent half the calendar).
    val rows = (1 to 4).flatMap(p => Seq(("a", p.toLong), ("a", p.toLong))) ++
      (1 to 4).map(_ => ("b", 2L)) ++ Seq(("c", 1L), ("c", 3L))
    val out = Profile.dispersionIndex(rows.toDF("k", "p"), "k", "p")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    out shouldBe Map("a" -> ((4L, 8L, 0L)), "b" -> ((1L, 4L, 30000L)),
      "c" -> ((2L, 2L, 5000L)))
  }

  test("dispersionIndex drops null keys/periods and is split-size exact") {
    val withNull = Seq((Option("k"), Option(1L)), (Option("k"), Option(1L)),
      (Option.empty[String], Option(1L)), (Option("k"), Option.empty[Long]))
      .toDF("k", "p")
    // one key, one period -> M=1, S=2, Q=4: F_bp = 10^4*(4-4)/2 = 0
    val r = Profile.dispersionIndex(withNull, "k", "p").collect()
    r.length shouldBe 1
    r.head.getLong(3) shouldBe 0L
  }
  test("wasserstein1d hand-computed two-arm distance") {
    // arm0 {0,0,1}, arm1 {1,2}: CDF gaps |2/3-0|*1 + |1-1/2|*1 = 7/6
    val rows = Seq(("g", 0L, 0.0), ("g", 0L, 0.0), ("g", 0L, 1.0),
      ("g", 1L, 1.0), ("g", 1L, 2.0))
    val r = Profile.wasserstein1d(rows.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().head
    (r.getLong(1), r.getLong(2)) shouldBe ((3L, 2L))
    r.getDouble(3) shouldBe 1.166667
  }

  test("wasserstein1d: identical arms 0, shifted arms = the shift, one-arm dropped") {
    val same = Seq(("s", 0L, 1.0), ("s", 1L, 1.0), ("s", 0L, 5.0),
      ("s", 1L, 5.0))
    Profile.wasserstein1d(same.toDF("g", "arm", "v"), "g", "arm", "v")
      .collect().head.getDouble(3) shouldBe 0.0
    // point mass at 3 vs point mass at 10: EMD = 7
    val shift = Seq(("t", 0L, 3.0), ("t", 1L, 10.0))
    Profile.wasserstein1d(shift.toDF("g", "arm", "v"), "g", "arm", "v")
      .collect().head.getDouble(3) shouldBe 7.0
    Profile.wasserstein1d(Seq(("lone", 0L, 1.0)).toDF("g", "arm", "v"),
      "g", "arm", "v").collect() shouldBe empty
  }

  test("wasserstein1d is arm-symmetric and translation-invariant") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      n <- Gen.choose(4, 30)
      rows <- Gen.listOfN(n, for {
        a <- Gen.oneOf(0L, 1L); v <- Gen.choose(0L, 9L)
      } yield ("g", a, v.toDouble))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val both = rows.exists(_._2 == 0L) && rows.exists(_._2 == 1L)
      (!both) || {
        def emd(rs: Seq[(String, Long, Double)]) =
          Profile.wasserstein1d(rs.toDF("g", "arm", "v"), "g", "arm", "v")
            .collect().head.getDouble(3)
        val base = emd(rows)
        emd(rows.map { case (g, a, v) => (g, 1L - a, v) }) == base &&
          emd(rows.map { case (g, a, v) => (g, a, v + 100.0) }) == base
      }
    })
  }
  test("topKDrift hand-computed leaderboard move") {
    // arm0 totals a:10 b:5 c:1 -> top2 {a,b}; arm1 b:10 d:8 a:1 ->
    // top2 {b,d}; common {b}, jaccard 1/3, one new entrant
    val rows = Seq(("g", 0L, "a", 10.0), ("g", 0L, "b", 5.0),
      ("g", 0L, "c", 1.0), ("g", 1L, "b", 10.0), ("g", 1L, "d", 8.0),
      ("g", 1L, "a", 1.0))
    val r = Profile.topKDrift(rows.toDF("g", "arm", "key", "v"),
      "g", "arm", "key", "v", k = 2).collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((2L, 2L, 1L))
    r.getLong(4) shouldBe 333333L
    r.getLong(5) shouldBe 1L
  }

  test("topKDrift: identical arms score ppm 10^6; value ties break by key") {
    val same = Seq(("s", 0L, "x", 5.0), ("s", 0L, "y", 3.0),
      ("s", 1L, "x", 5.0), ("s", 1L, "y", 3.0))
    Profile.topKDrift(same.toDF("g", "arm", "key", "v"),
      "g", "arm", "key", "v", k = 2).collect().head
      .getLong(4) shouldBe 1000000L
    // all totals tied: top-2 must be the two smallest keys in BOTH arms
    val tied = Seq(("t", 0L, "x", 5.0), ("t", 0L, "y", 5.0),
      ("t", 0L, "z", 5.0), ("t", 1L, "x", 5.0), ("t", 1L, "y", 5.0),
      ("t", 1L, "z", 5.0))
    val rt = Profile.topKDrift(tied.toDF("g", "arm", "key", "v"),
      "g", "arm", "key", "v", k = 2).collect().head
    rt.getLong(3) shouldBe 2L
    rt.getLong(4) shouldBe 1000000L
  }

  test("hellinger: 0 on identical histograms, 1 on disjoint, hand value between") {
    import graft.functions.Rounding.p6d
    // identical: both arms split 50/50 over buckets 0 and 1
    val same = Seq(("g", 1L, 1.0), ("g", 1L, 2.0),
      ("g", 0L, 1.0), ("g", 0L, 2.0))
    val rs = Profile.hellinger(same.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().head
    rs.getDouble(3) shouldBe 1.0 // bc
    rs.getDouble(4) shouldBe 0.0 // hellinger
    // disjoint supports
    val dis = Seq(("g", 1L, 1.0), ("g", 0L, 2.0))
    val rd = Profile.hellinger(dis.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().head
    rd.getDouble(3) shouldBe 0.0
    rd.getDouble(4) shouldBe 1.0
    // p = (.5,.5), q = (1,0): bc = sqrt(.5), H = sqrt(1-bc)
    val half = Seq(("g", 1L, 1.0), ("g", 1L, 2.0),
      ("g", 0L, 1.0), ("g", 0L, 1.0))
    val rh = Profile.hellinger(half.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().head
    rh.getDouble(3) shouldBe p6d(math.sqrt(0.5 * 1.0))
    rh.getDouble(4) shouldBe p6d(math.sqrt(1.0 - p6d(math.sqrt(0.5))))
    // one empty arm: NULL card, counts intact
    val one = Seq(("g", 1L, 1.0), ("g", 1L, 2.0))
    val ro = Profile.hellinger(one.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().head
    (ro.getLong(1), ro.getLong(2)) shouldBe ((2L, 0L))
    assert(ro.isNullAt(3) && ro.isNullAt(4))
  }

  test("pearsonMatrix: exact ±1 on linear columns, NULL on constants") {
    val rows = Seq(("g", 1.0, 6.0, 5.0), ("g", 2.0, 4.0, 5.0),
      ("g", 3.0, 2.0, 5.0))
    val out = Profile.pearsonMatrix(rows.toDF("g", "x", "y", "c"),
        "g", Seq("x", "y", "c"))
      .collect().map(r => (r.getString(1), r.getString(2)) -> r).toMap
    out.keySet shouldBe Set(("x", "y"), ("x", "c"), ("y", "c"))
    out(("x", "y")).getDouble(4) shouldBe -1.0
    assert(out(("x", "c")).isNullAt(4))
    assert(out(("y", "c")).isNullAt(4))
    // hand value: x=(1,2,3) y=(1,3,2) -> r = 3/6 = 0.5
    val half = Seq(("h", 1.0, 1.0), ("h", 2.0, 3.0), ("h", 3.0, 2.0))
    Profile.pearsonMatrix(half.toDF("g", "x", "y"), "g", Seq("x", "y"))
      .collect().head.getDouble(4) shouldBe 0.5
    an[IllegalArgumentException] should be thrownBy
      Profile.pearsonMatrix(half.toDF("g", "x", "y"), "g", Seq("x"))
  }

  test("partialCorrelation removes the confounder's share") {
    import graft.functions.Rounding.p6d
    // x and y both track z plus orthogonal noise
    val rows = Seq(("g", -1.0, 1.0, 0.0), ("g", 1.0, -1.0, 0.0),
      ("g", 1.0, 1.0, 1.0), ("g", 3.0, 3.0, 1.0))
    val r = Profile.partialCorrelation(rows.toDF("g", "x", "y", "z"),
      "g", "x", "y", "z").collect().head
    def rr(n: Double, sx: Double, sy: Double, sxy: Double,
           qx: Double, qy: Double) =
      (n * sxy - sx * sy) /
        math.sqrt((n * qx - sx * sx) * (n * qy - sy * sy))
    // moments: sx=4 sy=4 qx=12 qy=12 sxy=8 sxz=4 syz=4 qz=2 sz=2
    val rxy = rr(4, 4, 4, 8, 12, 12)
    val rxz = rr(4, 4, 2, 4, 12, 2)
    val ryz = rr(4, 4, 2, 4, 12, 2)
    r.getDouble(2) shouldBe p6d(rxy)
    r.getDouble(3) shouldBe p6d((rxy - rxz * ryz) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)))
    // z = x: the partial is undefined
    val dz = Seq(("d", 1.0, 2.0, 1.0), ("d", 2.0, 1.0, 2.0),
      ("d", 3.0, 3.0, 3.0))
    assert(Profile.partialCorrelation(dz.toDF("g", "x", "y", "z"),
      "g", "x", "y", "z").collect().head.isNullAt(3))
    // constant column: everything NULL
    val flat = Seq(("f", 1.0, 2.0, 5.0), ("f", 2.0, 1.0, 5.0))
    val rf = Profile.partialCorrelation(flat.toDF("g", "x", "y", "z"),
      "g", "x", "y", "z").collect().head
    assert(rf.isNullAt(2) && rf.isNullAt(3))
  }

  test("cramersV: 1 on perfect association (even sparse), 0 on independence") {
    // dense perfect 2x2: diag 10/10 -> chi2 20, V = 1
    val perfect = Seq.fill(10)(("g", "x", "p")) ++
      Seq.fill(10)(("g", "y", "q"))
    val rp = Profile.cramersV(perfect.toDF("g", "a", "b"), "g", "a", "b")
      .collect().head
    (rp.getLong(1), rp.getLong(2), rp.getLong(3)) shouldBe ((20L, 2L, 2L))
    rp.getDouble(4) shouldBe 20.0
    rp.getDouble(5) shouldBe 1.0
    // SPARSE perfect association: the unobserved cells' e terms must
    // count — chi2 = 4 (not 2), V exactly 1
    val sparse = Seq(("s", "x", "p"), ("s", "x", "p"),
      ("s", "y", "q"), ("s", "y", "q"))
    val rs = Profile.cramersV(sparse.toDF("g", "a", "b"), "g", "a", "b")
      .collect().head
    rs.getDouble(4) shouldBe 4.0
    rs.getDouble(5) shouldBe 1.0
    // independence: all four cells equal -> chi2 0
    val ind = for (a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5)
      yield ("i", a, b)
    val ri = Profile.cramersV(ind.toDF("g", "a", "b"), "g", "a", "b")
      .collect().head
    (ri.getDouble(4), ri.getDouble(5)) shouldBe ((0.0, 0.0))
    // one column level: no association to measure
    val mono = Seq(("m", "x", "p"), ("m", "y", "p"))
    assert(Profile.cramersV(mono.toDF("g", "a", "b"), "g", "a", "b")
      .collect().head.isNullAt(5))
    // grid budget raises before the r x c build
    an[Exception] should be thrownBy
      Profile.cramersV(perfect.toDF("g", "a", "b"), "g", "a", "b",
        maxCells = 3L).collect()
  }

  test("captureRecapture computes the exact Chapman card") {
    val sp = spark; import sp.implicits._
    import graft.functions.Rounding.p6d
    // capture A: keys 1..6 ; capture B: keys 4..9 -> n1=6 n2=6 m=3
    val rows = (1 to 6).map(k => ("g", k.toLong, 1L, 0L)) ++
      (4 to 9).map(k => ("g", k.toLong, 0L, 1L))
    val r = Profile.captureRecapture(rows.toDF("g", "k", "a", "b"),
      "g", "k", "a", "b").collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe ((6L, 6L, 3L))
    r.getLong(4) shouldBe (7L * 7L / 4L - 1L) // floor(49/4) - 1 = 11
    r.getDouble(5) shouldBe
      p6d(math.sqrt(7.0 * 7 * 3 * 3 / (4.0 * 4 * 5)))
    // disjoint captures: m = 0 -> NULL estimate
    val d = Seq(("h", 1L, 1L, 0L), ("h", 2L, 0L, 1L))
    val rd = Profile.captureRecapture(d.toDF("g", "k", "a", "b"),
      "g", "k", "a", "b").collect().head
    assert(rd.isNullAt(4) && rd.isNullAt(5))
  }

  test("theilU is 1 under determinism, near 0 under independence") {
    val sp = spark; import sp.implicits._
    // X determines Y exactly
    val det = Seq(("g", "a", "p"), ("g", "a", "p"), ("g", "b", "q"),
      ("g", "c", "r")).toDF("g", "x", "y")
    val rd = Profile.theilU(det, "g", "x", "y").collect().head
    rd.getAs[Double]("u_x_given_y") shouldBe 1.0
    rd.getAs[Double]("u_y_given_x") shouldBe 1.0
    rd.getAs[Double]("u_sym") shouldBe 1.0
    // balanced independent grid: H(X,Y) = H(X) + H(Y) -> U = 0
    val ind = (for (x <- Seq("a", "b"); y <- Seq("p", "q"))
      yield ("g", x, y)).toDF("g", "x", "y")
    val ri = Profile.theilU(ind, "g", "x", "y").collect().head
    ri.getAs[Double]("u_x_given_y") shouldBe 0.0 +- 1e-5
    ri.getAs[Double]("u_sym") shouldBe 0.0 +- 1e-5
    // constant X: H(X) = 0 -> that direction is NULL
    val cx = Seq(("g", "a", "p"), ("g", "a", "q")).toDF("g", "x", "y")
    val rc = Profile.theilU(cx, "g", "x", "y").collect().head
    assert(rc.isNullAt(4)) // u_x_given_y divides by H(X) = 0
    rc.getAs[Double]("u_y_given_x") shouldBe 0.0 +- 1e-5
  }

  test("etaSquared is 1 when the category determines the value, 0 when flat") {
    val sp = spark; import sp.implicits._
    val det = Seq(("g", "a", 10.0), ("g", "a", 10.0), ("g", "b", 20.0),
      ("g", "b", 20.0)).toDF("g", "v", "x")
    Profile.etaSquared(det, "g", "v", "x")
      .collect().head.getAs[Double]("eta_sq") shouldBe 1.0
    // same spread inside every level, same means: eta ~ 0
    val none = Seq(("g", "a", 10.0), ("g", "a", 20.0), ("g", "b", 10.0),
      ("g", "b", 20.0)).toDF("g", "v", "x")
    Profile.etaSquared(none, "g", "v", "x")
      .collect().head.getAs[Double]("eta_sq") shouldBe 0.0 +- 1e-5
    // constant value: zero total variance -> NULL
    val const = Seq(("g", "a", 5.0), ("g", "b", 5.0)).toDF("g", "v", "x")
    assert(Profile.etaSquared(const, "g", "v", "x")
      .collect().head.isNullAt(3))
  }

  test("infoGain ranks the determining feature first and penalizes ids") {
    val sp = spark; import sp.implicits._
    // f1 determines t exactly; f2 is constant; id memorizes (IG = H(t)
    // but gain ratio collapses)
    val rows = (1 to 40).map { i =>
      val t = if (i % 2 == 0) "yes" else "no"
      (t, t.toUpperCase, "same", i.toString)
    }.toDF("t", "f1", "f2", "id")
    val out = Profile.infoGain(rows, Seq("f1", "f2", "id"), "t")
      .collect().map(r => r.getString(0) -> r).toMap
    out("f1").getAs[Double]("info_gain") shouldBe
      out("f1").getAs[Double]("h_target")
    out("f1").getAs[Double]("gain_ratio") shouldBe 1.0
    out("f2").getAs[Double]("info_gain") shouldBe 0.0 +- 1e-6
    assert(out("f2").isNullAt(4)) // H(feature) = 0
    out("id").getAs[Double]("info_gain") shouldBe
      out("id").getAs[Double]("h_target")
    out("id").getAs[Double]("gain_ratio") should be <
      out("f1").getAs[Double]("gain_ratio")
  }
}
