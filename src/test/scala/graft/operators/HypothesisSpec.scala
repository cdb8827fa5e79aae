package graft.operators

import graft.SparkSpec
import graft.functions.Rounding.p6d
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

class HypothesisSpec extends SparkSpec {


  private lazy val implicits = spark.implicits
  import implicits._

  // ---- Mann–Whitney U -------------------------------------------------

  private def mwu(rows: Seq[(String, Long, Double)]) =
    Hypothesis.mannWhitneyU(rows.toDF("g", "arm", "v"), "g", "arm", "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap

  test("mannWhitneyU hand-computed: midrank ties, exact 2U, tie-corrected z") {
    // arm0 = {1,2,4}, arm1 = {2,3,5}: ranks 1, 2.5, 2.5, 4, 5, 6
    // R_b = 2.5+4+6 = 12.5, U_b = 12.5 - 6 = 6.5 -> u_x2 = 13
    // T = 2^3-2 = 6, V = 6*5*7 - 6 = 204, Var = 9*204/(12*30) = 5.1
    // z = (6.5 - 4.5)/sqrt(5.1)
    val out = mwu(Seq(("g", 0L, 1.0), ("g", 0L, 2.0), ("g", 0L, 4.0),
      ("g", 1L, 2.0), ("g", 1L, 3.0), ("g", 1L, 5.0)))
    val (na, nb, u2, z, sig) = out("g")
    (na, nb, u2) shouldBe ((3L, 3L, 13L))
    z shouldBe p6d(2.0 / math.sqrt(5.1))
    sig shouldBe false
  }

  test("mannWhitneyU tie-free hand case and one-arm groups dropped") {
    // arm0 = {1,3}, arm1 = {2,4}: R_b = 6, U_b = 3, u_x2 = 6
    // V = 4*3*5 = 60, Var = 4*60/(12*12) = 5/3, z = 1/sqrt(5/3)
    val out = mwu(Seq(("g", 0L, 1.0), ("g", 0L, 3.0), ("g", 1L, 2.0),
      ("g", 1L, 4.0), ("lone", 1L, 9.0)))
    out.keySet shouldBe Set("g")
    val (_, _, u2, z, _) = out("g")
    u2 shouldBe 6L
    z shouldBe p6d(1.0 / math.sqrt(5.0 / 3.0))
  }

  test("mannWhitneyU: all-tied group reports z = 0, not significant") {
    val out = mwu(Seq(("g", 0L, 7.0), ("g", 0L, 7.0), ("g", 1L, 7.0)))
    // midrank 2 for every row: R_b = 2, U_b = 2 - 1 = 1 -> u_x2 = 2
    out("g") shouldBe ((2L, 1L, 2L, 0.0, false))
  }

  test("mannWhitneyU detects a clean shift as significant") {
    // arm1 uniformly above arm0, n = 40: |z| far beyond 1.96
    val rows = (1 to 20).flatMap(i =>
      Seq(("g", 0L, i.toDouble), ("g", 1L, 100.0 + i)))
    val (_, _, _, z, sig) = mwu(rows)("g")
    z should be > 1.96
    sig shouldBe true
  }

  test("law: U_a + U_b = n_a*n_b (arm swap) and z flips sign; monotone-transform invariant") {
    val gen = for {
      n <- Gen.choose(4, 30)
      vs <- Gen.listOfN(n, Gen.choose(0L, 12L))
      arms <- Gen.listOfN(n, Gen.oneOf(0L, 1L))
    } yield vs.zip(arms)
    check(Prop.forAll(gen) { data =>
      val both = data.exists(_._2 == 0L) && data.exists(_._2 == 1L)
      val rows = data.map { case (v, a) => ("g", a, v.toDouble) }
      val swapped = data.map { case (v, a) => ("g", 1L - a, v.toDouble) }
      // exp preserves order: the rank test must be exactly invariant
      val mono = data.map { case (v, a) => ("g", a, math.exp(v / 3.0)) }
      (!both) || {
        val (na, nb, u2, z, sig) = mwu(rows)("g")
        val (_, _, u2s, zs, sigs) = mwu(swapped)("g")
        val (_, _, u2m, zm, sigm) = mwu(mono)("g")
        u2 + u2s == 2L * na * nb && zs == -z && sigs == sig &&
          u2m == u2 && zm == z && sigm == sig
      }
    })
  }

  // ---- Kendall tau-b --------------------------------------------------

  private def tau(rows: Seq[(String, Long, Long)], maxCells: Long = 20000L) =
    Hypothesis.kendallTau(rows.toDF("g", "x", "y"), "g", "x", "y", maxCells)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))))
      .toMap

  test("kendallTau hand-computed with x- and y-ties") {
    // cells (1,1),(1,2),(2,1),(2,2),(3,3): C = 5, D = 1, S = 4
    // D2x = D2y = 5*4 - 4 = 16 -> tau_b = 8/16 = 0.5
    val out = tau(Seq(("g", 1L, 1L), ("g", 1L, 2L), ("g", 2L, 1L),
      ("g", 2L, 2L), ("g", 3L, 3L)))
    out("g") shouldBe ((5L, 5L, 4L, 0.5))
  }

  test("kendallTau weights cell multiplicities and hits ±1 on perfect monotone data") {
    // (1,1) x2 and (2,2) x1: S = 2*1 = 2, D2x = D2y = 6-2 = 4, tau = 1
    tau(Seq(("g", 1L, 1L), ("g", 1L, 1L), ("g", 2L, 2L)))("g") shouldBe
      ((3L, 2L, 2L, 1.0))
    // reversed: tau = -1
    tau(Seq(("g", 1L, 2L), ("g", 1L, 2L), ("g", 2L, 1L)))("g") shouldBe
      ((3L, 2L, -2L, -1.0))
  }

  test("kendallTau: constant column reports tau 0; independence near 0") {
    tau(Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L)))("g")._4 shouldBe 0.0
  }

  test("kendallTau raises when a group exceeds maxCells") {
    val rows = (1L to 9L).map(i => ("g", i, i * 7 % 5))
    val e = intercept[Exception] {
      tau(rows, maxCells = 4L)
    }
    e.getMessage should include("kendallTau")
  }

  test("law: tau_b is antisymmetric under y negation and invariant to strictly monotone relabeling") {
    val gen = for {
      n <- Gen.choose(3, 25)
      xs <- Gen.listOfN(n, Gen.choose(0L, 6L))
      ys <- Gen.listOfN(n, Gen.choose(0L, 6L))
    } yield xs.zip(ys)
    check(Prop.forAll(gen) { data =>
      val rows = data.map { case (x, y) => ("g", x, y) }
      val neg = data.map { case (x, y) => ("g", x, -y) }
      val mono = data.map { case (x, y) => ("g", x * 10 + 3, y * y + y) }
      val (n, m, s, t) = tau(rows)("g")
      val (_, _, sn, tn) = tau(neg)("g")
      val (_, _, sm, tm) = tau(mono)("g")
      n == data.size.toLong && sn == -s && tn == -t &&
        sm == s && tm == t && m == data.distinct.size.toLong
    })
  }

  // ---- log-rank (Survival) -------------------------------------------

  test("logRank hand-computed two-arm card") {
    // A: (1,ev),(3,cens),(5,ev); B: (2,ev),(4,ev),(6,cens)
    // E_A = .5 + .4 + 1/3 + .5 = 1.733333; V = .25+.24+2/9+.25 = .962222
    val rows = Seq((1L, 1L, 0L), (3L, 0L, 0L), (5L, 1L, 0L),
      (2L, 1L, 1L), (4L, 1L, 1L), (6L, 0L, 1L))
    val out = Survival.logRank(rows.toDF("dur", "ev", "arm"),
      "dur", "ev", "arm").collect()
    out.length shouldBe 1
    val r = out.head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe
      ((3L, 3L, 2L, 2L))
    r.getDouble(4) shouldBe 1.733333
    val dd = 2.0 - 1.733333
    r.getDouble(5) shouldBe p6d(dd * dd / 0.962222)
    r.getBoolean(6) shouldBe false
  }

  test("logRank: identical arms give chi2 = 0 shape; separated arms go significant") {
    // every duration has one event in each arm: O_A = E_A exactly
    val same = (1L to 10L).flatMap(d => Seq((d, 1L, 0L), (d, 1L, 1L)))
    val r0 = Survival.logRank(same.toDF("dur", "ev", "arm"),
      "dur", "ev", "arm").collect().head
    r0.getDouble(5) shouldBe 0.0
    r0.getBoolean(6) shouldBe false
    // arm A all churns early, arm B all censored late
    val split = (1L to 15L).map(d => (d, 1L, 0L)) ++
      (16L to 30L).map(d => (d, 0L, 1L))
    val r1 = Survival.logRank(split.toDF("dur", "ev", "arm"),
      "dur", "ev", "arm").collect().head
    r1.getBoolean(6) shouldBe true
  }

  test("logRank is bucketWidth-invariant and arm-relabel symmetric in chi2") {
    val gen = for {
      n <- Gen.choose(4, 40)
      rows <- Gen.listOfN(n, for {
        d <- Gen.choose(0L, 20L)
        e <- Gen.oneOf(0L, 1L)
        a <- Gen.oneOf(0L, 1L)
      } yield (d, e, a))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val both = rows.exists(_._3 == 0L) && rows.exists(_._3 == 1L)
      (!both) || {
        val df = rows.toDF("dur", "ev", "arm")
        val wide = Survival.logRank(df, "dur", "ev", "arm").collect().head
        val narrow = Survival.logRank(df, "dur", "ev", "arm",
          bucketWidth = 3L).collect().head
        val flipped = Survival.logRank(
          rows.map { case (d, e, a) => (d, e, 1L - a) }
            .toDF("dur", "ev", "arm"), "dur", "ev", "arm").collect().head
        wide.getDouble(5) == narrow.getDouble(5) &&
          wide.getBoolean(6) == narrow.getBoolean(6) &&
          flipped.getDouble(5) == wide.getDouble(5) &&
          flipped.getLong(0) == wide.getLong(1) &&
          flipped.getLong(2) == wide.getLong(3)
      }
    })
  }

  test("logRankFromCounts: two additive half-states reproduce the raw path (the streaming seam)") {
    val rows = Seq((1L, 1L, 0L), (2L, 1L, 1L), (2L, 0L, 0L), (4L, 1L, 1L),
      (5L, 0L, 1L), (5L, 1L, 0L), (7L, 1L, 1L), (9L, 0L, 0L))
    val df = rows.toDF("dur", "ev", "arm")
    val raw = Survival.logRank(df, "dur", "ev", "arm").collect().head
    def counts(part: Seq[(Long, Long, Long)]) = part
      .groupBy(_._1).toSeq.map { case (d, rs) =>
        (d, rs.count(r => r._3 == 0L && r._2 == 1L).toLong,
          rs.count(r => r._3 == 0L && r._2 == 0L).toLong,
          rs.count(r => r._3 == 1L && r._2 == 1L).toLong,
          rs.count(r => r._3 == 1L && r._2 == 0L).toLong)
      }
    val (h1, h2) = rows.splitAt(4)
    val merged = (counts(h1) ++ counts(h2))
      .groupBy(_._1).toSeq.map { case (d, rs) =>
        (d, rs.map(_._2).sum, rs.map(_._3).sum, rs.map(_._4).sum,
          rs.map(_._5).sum)
      }
    val fc = Survival.logRankFromCounts(
      merged.toDF("duration", "d_a", "c_a", "d_b", "c_b")).collect().head
    fc shouldBe raw
  }

  test("logRankFromCounts coalesces NULL arm counts (full-outer-join input)") {
    // the same rows as the streaming-seam test, but merged the way two
    // per-arm states actually arrive: a FULL OUTER join on duration,
    // leaving NULLs where only one arm has that duration
    val rows = Seq((1L, 1L, 0L), (2L, 1L, 1L), (2L, 0L, 0L), (4L, 1L, 1L),
      (5L, 0L, 1L), (5L, 1L, 0L), (7L, 1L, 1L), (9L, 0L, 0L))
    val raw = Survival.logRank(rows.toDF("dur", "ev", "arm"),
      "dur", "ev", "arm").collect().head
    val armA = rows.filter(_._3 == 0L).groupBy(_._1).toSeq.map {
      case (d, rs) => (d, rs.count(_._2 == 1L).toLong,
        rs.count(_._2 == 0L).toLong)
    }.toDF("duration", "d_a", "c_a")
    val armB = rows.filter(_._3 == 1L).groupBy(_._1).toSeq.map {
      case (d, rs) => (d, rs.count(_._2 == 1L).toLong,
        rs.count(_._2 == 0L).toLong)
    }.toDF("duration", "d_b", "c_b")
    val joined = armA.join(armB, Seq("duration"), "full_outer")
    // sanity: the join really produced NULLs (else this test is vacuous)
    joined.filter(col("d_a").isNull || col("d_b").isNull)
      .count() should be > 0L
    Survival.logRankFromCounts(joined).collect().head shouldBe raw
  }

  test("logRankFromCounts one-arm input emits ONE degenerate card, not zero rows") {
    val oneArm = Seq((1L, 2L, 1L, 0L, 0L), (3L, 1L, 0L, 0L, 0L))
      .toDF("duration", "d_a", "c_a", "d_b", "c_b")
    val out = Survival.logRankFromCounts(oneArm).collect()
    out.length shouldBe 1
    val r = out.head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe
      ((4L, 0L, 3L, 0L))
    r.getDouble(4) shouldBe 3.0 // e_a = o_a: no comparison possible
    r.getDouble(5) shouldBe 0.0
    r.getBoolean(6) shouldBe false
    // and the fully-empty frame still honors the one-row contract
    val empty = Survival.logRankFromCounts(
      oneArm.limit(0)).collect()
    empty.length shouldBe 1
    empty.head.getLong(0) shouldBe 0L
    empty.head.getBoolean(6) shouldBe false
  }

  // ---- Cliff's delta --------------------------------------------------

  test("cliffsDelta hand-computed card") {
    // arm0 {1,2,3} vs arm1 {2,3,4}: of the 9 pairs, 6 have b>a, 1 has
    // a>b, 2 tie -> delta = 5/9, 'large' (>= 0.474)
    val rows = Seq(("g", 0L, 1L), ("g", 0L, 2L), ("g", 0L, 3L),
      ("g", 1L, 2L), ("g", 1L, 3L), ("g", 1L, 4L))
    val out = Hypothesis.cliffsDelta(rows.toDF("g", "arm", "v"),
      "g", "arm", "v").collect()
    out.length shouldBe 1
    val r = out.head
    (r.getLong(1), r.getLong(2)) shouldBe ((3L, 3L))
    r.getDouble(3) shouldBe p6d(5.0 / 9.0)
    r.getString(4) shouldBe "large"
  }

  test("cliffsDelta magnitude boundaries and degenerate groups") {
    // identical arms -> delta 0, negligible; full separation -> 1, large
    val rows = Seq(("t", 0L, 5L), ("t", 1L, 5L),
      ("s", 0L, 1L), ("s", 1L, 2L),
      ("lone", 0L, 7L)) // one-arm group: dropped
    val out = Hypothesis.cliffsDelta(rows.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().map(r => r.getString(0) -> r).toMap
    out.keySet shouldBe Set("t", "s")
    out("t").getDouble(3) shouldBe 0.0
    out("t").getString(4) shouldBe "negligible"
    out("s").getDouble(3) shouldBe 1.0
    out("s").getString(4) shouldBe "large"
  }

  test("cliffsDelta arm flip negates delta, keeps magnitude") {
    val gen = for {
      n <- Gen.choose(4, 30)
      rows <- Gen.listOfN(n, for {
        a <- Gen.oneOf(0L, 1L)
        v <- Gen.choose(0L, 8L)
      } yield ("g", a, v))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val both = rows.exists(_._2 == 0L) && rows.exists(_._2 == 1L)
      (!both) || {
        val d = Hypothesis.cliffsDelta(rows.toDF("g", "arm", "v"),
          "g", "arm", "v").collect().head
        val f = Hypothesis.cliffsDelta(
          rows.map { case (g, a, v) => (g, 1L - a, v) }
            .toDF("g", "arm", "v"), "g", "arm", "v").collect().head
        f.getDouble(3) == -d.getDouble(3) &&
          f.getString(4) == d.getString(4) &&
          f.getLong(1) == d.getLong(2) && f.getLong(2) == d.getLong(1)
      }
    })
  }

  // ---- Kruskal–Wallis -------------------------------------------------

  test("kruskalWallis hand-computed cards") {
    // no ties, three arms {1,2},{3,4},{5,6}: H = 12/42*89.5 - 21
    val clean = Seq(("g", 0L, 1.0), ("g", 0L, 2.0), ("g", 1L, 3.0),
      ("g", 1L, 4.0), ("g", 2L, 5.0), ("g", 2L, 6.0))
    val r0 = Hypothesis.kruskalWallis(clean.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().head
    (r0.getLong(1), r0.getLong(2)) shouldBe ((6L, 3L))
    r0.getDouble(3) shouldBe p6d(12.0 / 42.0 * 89.5 - 21.0)
    r0.getBoolean(4) shouldBe false
    // heavy ties, two arms {1,2,2} vs {2,3}: tie-corrected H' = 5/3
    val tied = Seq(("g", 0L, 1.0), ("g", 0L, 2.0), ("g", 0L, 2.0),
      ("g", 1L, 2.0), ("g", 1L, 3.0))
    val r1 = Hypothesis.kruskalWallis(tied.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().head
    r1.getDouble(3) shouldBe 1.666667
    r1.getBoolean(4) shouldBe false
    // full separation {1 x5} vs {2 x5}: H' = 9.0 > 3.841459
    val split = (1 to 5).map(_ => ("g", 0L, 1.0)) ++
      (1 to 5).map(_ => ("g", 1L, 2.0))
    val r2 = Hypothesis.kruskalWallis(split.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().head
    r2.getDouble(3) shouldBe 9.0
    r2.getBoolean(4) shouldBe true
    // all values tied: W = 0 -> degenerate, never significant
    val flat = Seq(("g", 0L, 1.0), ("g", 1L, 1.0), ("g", 2L, 1.0))
    val r3 = Hypothesis.kruskalWallis(flat.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().head
    r3.getDouble(3) shouldBe 0.0
    r3.getBoolean(4) shouldBe false
    // one-arm groups are dropped
    Hypothesis.kruskalWallis(
      Seq(("lone", 0L, 1.0), ("lone", 0L, 2.0)).toDF("g", "arm", "v"),
      "g", "arm", "v").collect() shouldBe empty
  }

  test("kruskalWallis with two arms squares the Mann-Whitney z") {
    // H' (tie-corrected) == z^2 exactly for k = 2 — the two operators
    // share the midrank contingency, so this pins both derivations
    val gen = for {
      n <- Gen.choose(6, 40)
      rows <- Gen.listOfN(n, for {
        a <- Gen.oneOf(0L, 1L)
        v <- Gen.choose(0L, 10L)
      } yield ("g", a, v))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val both = rows.exists(_._2 == 0L) && rows.exists(_._2 == 1L)
      (!both) || {
        val df = rows.map { case (g, a, v) => (g, a, v.toDouble) }
          .toDF("g", "arm", "v")
        val h = Hypothesis.kruskalWallis(df, "g", "arm", "v")
          .collect().head.getDouble(3)
        val z = Hypothesis.mannWhitneyU(df, "g", "arm", "v")
          .collect().head.getDouble(4)
        math.abs(h - z * z) < 1e-4
      }
    })
  }
  // ---- McNemar / Cochran Q / Cochran-Armitage ------------------------

  test("mcnemar hand-computed discordant cells") {
    // 8 flips one way, 2 the other, 10 concordant: chi2 = 36/10 = 3.6
    // (just under 3.841459); 9 vs 1 gives 6.4 (significant)
    def rows(b01: Int, b10: Int) =
      Seq.fill(5)(("g", 1L, 1L)) ++ Seq.fill(5)(("g", 0L, 0L)) ++
        Seq.fill(b01)(("g", 0L, 1L)) ++ Seq.fill(b10)(("g", 1L, 0L))
    val r1 = Hypothesis.mcnemar(rows(8, 2).toDF("g", "a", "b"),
      "g", "a", "b").collect().head
    (r1.getLong(1), r1.getLong(2), r1.getLong(3)) shouldBe ((20L, 8L, 2L))
    r1.getDouble(4) shouldBe 3.6
    r1.getBoolean(5) shouldBe false
    val r2 = Hypothesis.mcnemar(rows(9, 1).toDF("g", "a", "b"),
      "g", "a", "b").collect().head
    r2.getDouble(4) shouldBe 6.4
    r2.getBoolean(5) shouldBe true
    // fully concordant: nothing to test
    val r0 = Hypothesis.mcnemar(rows(0, 0).toDF("g", "a", "b"),
      "g", "a", "b").collect().head
    r0.getDouble(4) shouldBe 0.0
    r0.getBoolean(5) shouldBe false
  }

  test("cochranQ hand-computed three-treatment cards") {
    // items (1,1,0)(1,1,0)(1,0,0)(0,0,0): T=(3,2,0), R=(2,2,1,0)
    // num = 3*13 - 25 = 14, den = 15 - 9 = 6 -> Q = 2*14/6 = 4.666667
    val rows = Seq(("g", 1L, 1L, 0L), ("g", 1L, 1L, 0L),
      ("g", 1L, 0L, 0L), ("g", 0L, 0L, 0L))
    val r = Hypothesis.cochranQ(rows.toDF("g", "t1", "t2", "t3"),
      "g", Seq("t1", "t2", "t3")).collect().head
    (r.getLong(1), r.getLong(2)) shouldBe ((4L, 3L))
    r.getDouble(3) shouldBe p6d(2.0 * 14.0 / 6.0)
    r.getBoolean(4) shouldBe false
    // t1 always fires, t2/t3 never: Q = 12 > chi2_2 = 5.991465
    val split = Seq.fill(6)(("s", 1L, 0L, 0L))
    val rs = Hypothesis.cochranQ(split.toDF("g", "t1", "t2", "t3"),
      "g", Seq("t1", "t2", "t3")).collect().head
    rs.getDouble(3) shouldBe 12.0
    rs.getBoolean(4) shouldBe true
    // every item unanimous: den = 0, degenerate
    val flat = Seq(("f", 1L, 1L, 1L), ("f", 0L, 0L, 0L))
    val rf = Hypothesis.cochranQ(flat.toDF("g", "t1", "t2", "t3"),
      "g", Seq("t1", "t2", "t3")).collect().head
    rf.getDouble(3) shouldBe 0.0
    rf.getBoolean(4) shouldBe false
  }

  test("cochranArmitage hand-computed dose-response trend") {
    // buckets 0/1/2 with rates 1/10, 5/10, 9/10: chi2 = 12.8
    val rows = (Seq.fill(1)(1L) ++ Seq.fill(9)(0L)).map(s => ("g", 0L, s)) ++
      (Seq.fill(5)(1L) ++ Seq.fill(5)(0L)).map(s => ("g", 1L, s)) ++
      (Seq.fill(9)(1L) ++ Seq.fill(1)(0L)).map(s => ("g", 2L, s))
    val r = Hypothesis.cochranArmitage(rows.toDF("g", "w", "s"),
      "g", "w", "s").collect().head
    (r.getLong(1), r.getLong(2)) shouldBe ((30L, 15L))
    r.getDouble(3) shouldBe 12.8
    r.getBoolean(4) shouldBe true
    // flat rates: A = 0 -> no trend
    val flat = (0L to 2L).flatMap(w =>
      (Seq.fill(5)(1L) ++ Seq.fill(5)(0L)).map(s => ("f", w, s)))
    val rf = Hypothesis.cochranArmitage(flat.toDF("g", "w", "s"),
      "g", "w", "s").collect().head
    rf.getDouble(3) shouldBe 0.0
    rf.getBoolean(4) shouldBe false
    // single bucket: B = 0 -> degenerate
    val one = Seq(("o", 3L, 1L), ("o", 3L, 0L))
    Hypothesis.cochranArmitage(one.toDF("g", "w", "s"), "g", "w", "s")
      .collect().head.getBoolean(4) shouldBe false
  }

  test("cochranArmitage is invariant to affine bucket-weight shifts") {
    val gen = for {
      n <- Gen.choose(6, 40)
      rows <- Gen.listOfN(n, for {
        w <- Gen.choose(0L, 4L); s <- Gen.oneOf(0L, 1L)
      } yield ("g", w, s))
      shift <- Gen.choose(1L, 50L)
    } yield (rows, shift)
    check(Prop.forAll(gen) { case (rows, shift) =>
      val base = Hypothesis.cochranArmitage(rows.toDF("g", "w", "s"),
        "g", "w", "s").collect().head
      val moved = Hypothesis.cochranArmitage(
        rows.map { case (g, w, s) => (g, w + shift, s) }
          .toDF("g", "w", "s"), "g", "w", "s").collect().head
      base.getDouble(3) == moved.getDouble(3) &&
        base.getBoolean(4) == moved.getBoolean(4)
    })
  }

  test("effectSize matches the hand-computed pooled d and Hedges g") {
    import graft.functions.Rounding.p6d
    // arm1 {2,4}, arm0 {1,3}: means 3/2, SS 2+2, s2p = 4/2 = 2
    // d = 1/sqrt(2); J = 1 - 3/7
    val d = Seq(("g", 1L, 2.0), ("g", 1L, 4.0),
      ("g", 0L, 1.0), ("g", 0L, 3.0))
    val r = Hypothesis.effectSize(d.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().head
    (r.getLong(1), r.getLong(2)) shouldBe ((2L, 2L))
    r.getDouble(3) shouldBe 3.0
    r.getDouble(4) shouldBe 2.0
    r.getDouble(5) shouldBe p6d(1.0 / math.sqrt(2.0))
    r.getDouble(6) shouldBe p6d((1.0 - 3.0 / 7.0) * (1.0 / math.sqrt(2.0)))
    // constant arms: zero pooled variance -> NULL d/g, means intact
    val flat = Seq(("f", 1L, 5.0), ("f", 1L, 5.0),
      ("f", 0L, 5.0), ("f", 0L, 5.0))
    val rf = Hypothesis.effectSize(flat.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().head
    assert(rf.isNullAt(5) && rf.isNullAt(6))
    rf.getDouble(3) shouldBe 5.0
    // one-arm group: control mean NULL, effect NULL
    val one = Seq(("o", 1L, 2.0), ("o", 1L, 3.0))
    val ro = Hypothesis.effectSize(one.toDF("g", "arm", "v"),
      "g", "arm", "v").collect().head
    assert(ro.isNullAt(4) && ro.isNullAt(5))
  }

  test("poissonRateTest: exact rates, ratio, and integral significance") {
    val rows = Seq.fill(10)(("g", 0L)) ++ Seq.fill(30)(("g", 1L)) ++
      Seq.fill(5)(("e", 0L)) ++ Seq.fill(5)(("e", 1L)) ++
      Seq.fill(3)(("z", 1L))
    val out = Hypothesis.poissonRateTest(rows.toDF("g", "arm"),
      "g", "arm", exposure0 = 100L, exposure1 = 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    (g.getLong(3), g.getLong(4), g.getLong(5)) shouldBe
      ((100000L, 300000L, 3000000L))
    // chi2 = 2000^2 / (100*100*40) = 10
    g.getDouble(6) shouldBe 10.0
    g.getBoolean(7) shouldBe true
    val eq = out("e")
    (eq.getDouble(6), eq.getBoolean(7)) shouldBe ((0.0, false))
    eq.getLong(5) shouldBe 1000000L
    assert(out("z").isNullAt(5)) // no baseline events: NULL ratio
    an[IllegalArgumentException] should be thrownBy
      Hypothesis.poissonRateTest(rows.toDF("g", "arm"), "g", "arm", 0L, 1L)
  }

  test("sprt crosses Wald boundaries on decisive evidence, else continues") {
    import graft.functions.Rounding.p6d
    def run(rows: Seq[(String, Long)]) =
      Hypothesis.sprt(rows.toDF("g", "y"), "g", "y",
        p0 = 0.2, p1 = 0.4).collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getString(4)))).toMap
    val c1 = math.log(0.4 / 0.2); val c0 = math.log(0.6 / 0.8)
    val out = run(
      Seq.fill(10)(("h1", 1L)) ++ Seq.fill(20)(("h0", 0L)) ++
        Seq(("mid", 1L), ("mid", 0L)))
    out("h1")._4 shouldBe "accept_h1"
    out("h1")._3 shouldBe p6d(10.0 * c1 + 0.0 * c0)
    out("h0")._4 shouldBe "accept_h0"
    out("mid")._4 shouldBe "continue"
    out("mid")._3 shouldBe p6d(1.0 * c1 + 1.0 * c0)
    an[IllegalArgumentException] should be thrownBy
      Hypothesis.sprt(Seq(("g", 1L)).toDF("g", "y"), "g", "y", 0.3, 0.3)
  }

  test("cmh pools stratified 2x2 evidence with exact micro-unit floors") {
    // balanced stratum contributes nothing; a perfectly associated
    // 5/0/0/5 stratum carries chi2 = 9 on its own
    val bal = for (e <- 0 to 1; o <- 0 to 1; _ <- 1 to 10)
      yield ("g", "s1", e.toLong, o.toLong)
    val assoc = (1 to 5).flatMap(_ =>
      Seq(("g", "s2", 1L, 1L), ("g", "s2", 0L, 0L)))
    val r = Hypothesis.cmh((bal ++ assoc).toDF("g", "st", "e", "o"),
      "g", "st", "e", "o").collect().head
    (r.getLong(1), r.getLong(2)) shouldBe ((50L, 2L))
    // dd = 2500000, vv = 2564102 + 694444
    val dd = 2500000.0; val vv = 2564102.0 + 694444.0
    r.getDouble(3) shouldBe
      graft.functions.Rounding.p6d(dd * dd / (vv * 1.0e6))
    r.getBoolean(4) shouldBe false // chi2 ~ 1.92 < 3.84
    // the associated stratum alone is significant at chi2 = 9
    val ra = Hypothesis.cmh(assoc.toDF("g", "st", "e", "o"),
      "g", "st", "e", "o").collect().head
    ra.getDouble(3) shouldBe // floored V micro-units: 625e6 DIV 900
      graft.functions.Rounding.p6d(2500000.0 * 2500000.0 / (694444.0 * 1.0e6))
    ra.getBoolean(4) shouldBe true
    // single-row strata drop; all dropped -> group vanishes
    Hypothesis.cmh(Seq(("g", "s1", 1L, 1L)).toDF("g", "st", "e", "o"),
      "g", "st", "e", "o").collect() shouldBe empty
  }

  test("mhOddsRatio pools stratum odds with exact micro-unit floors") {
    // one stratum a=2 b=1 c=1 d=2: num_mu=666666, den_mu=166666
    val s1 = Seq(("g", "s", 1L, 1L), ("g", "s", 1L, 1L),
      ("g", "s", 1L, 0L), ("g", "s", 0L, 1L),
      ("g", "s", 0L, 0L), ("g", "s", 0L, 0L))
    val r = Hypothesis.mhOddsRatio(s1.toDF("g", "st", "e", "o"),
      "g", "st", "e", "o").collect().head
    (r.getLong(1), r.getLong(2)) shouldBe ((6L, 1L))
    r.getLong(3) shouldBe
      (BigInt(666666) * 1000000 / BigInt(166666)).toLong
    // duplicating the stratum doubles both sums: the ratio holds
    val s2 = s1 ++ s1.map { case (g, _, e, o) => (g, "t", e, o) }
    Hypothesis.mhOddsRatio(s2.toDF("g", "st", "e", "o"),
      "g", "st", "e", "o").collect().head.getLong(3) shouldBe
      r.getLong(3)
    // no discordant mass anywhere: infinite OR reports NULL
    val inf = Seq(("z", "s", 1L, 1L), ("z", "s", 0L, 0L))
    assert(Hypothesis.mhOddsRatio(inf.toDF("g", "st", "e", "o"),
      "g", "st", "e", "o").collect().head.isNullAt(3))
  }

  test("mannKendall detects monotone trends with integral significance") {
    import graft.functions.Rounding.p6d
    def series(g: String, ys: Seq[Long]) =
      ys.zipWithIndex.map { case (y, i) => (g, i.toLong, y) }
    val d = series("up", Seq(1L, 2L, 3L, 4L, 5L)) ++
      series("down", Seq(5L, 4L, 3L, 2L, 1L)) ++
      series("flat", Seq(7L, 7L, 7L, 7L, 7L))
    val out = Hypothesis.mannKendall(d.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    out("up") shouldBe
      ((5L, 10L, p6d(9.0 / math.sqrt(300.0 / 18.0)), true))
    out("down") shouldBe
      ((5L, -10L, p6d(-9.0 / math.sqrt(300.0 / 18.0)), true))
    out("flat") shouldBe ((5L, 0L, 0.0, false))
    // duplicate time points violate the series contract
    val dup = Seq(("g", 1L, 1L), ("g", 1L, 2L))
    an[Exception] should be thrownBy
      Hypothesis.mannKendall(dup.toDF("g", "x", "y"), "g", "x", "y")
        .collect()
    // over-budget series raise while scanning
    an[Exception] should be thrownBy
      Hypothesis.mannKendall(
        series("g", Seq(1L, 2L, 3L)).toDF("g", "x", "y"),
        "g", "x", "y", maxCells = 2L).collect()
  }

  test("friedman matches hand-computed tie-corrected chi2") {
    // blocks (1,2,3) and (3,2,1): perfectly opposed orders -> chi2 0
    val opposed = Seq(("g", 1.0, 2.0, 3.0), ("g", 3.0, 2.0, 1.0))
    val r0 = Hypothesis.friedman(opposed.toDF("g", "t1", "t2", "t3"),
      "g", Seq("t1", "t2", "t3")).collect().head
    r0.getDouble(3) shouldBe 0.0
    r0.getBoolean(4) shouldBe false
    // add a tied block (1,1,2): S=(11,11,14), sr2=166 ->
    // chi2 = 2*6/22 = 0.545455
    val mixed = opposed :+ (("g", 1.0, 1.0, 2.0))
    val r1 = Hypothesis.friedman(mixed.toDF("g", "t1", "t2", "t3"),
      "g", Seq("t1", "t2", "t3")).collect().head
    r1.getLong(1) shouldBe 3L
    r1.getDouble(3) shouldBe graft.functions.Rounding.p6d(12.0 / 22.0)
    r1.getBoolean(4) shouldBe false
    // three perfectly consistent blocks: chi2 = 2n = 6 > 5.991 -> sig
    val consistent = Seq.fill(3)(("c", 1.0, 2.0, 3.0))
    val rc = Hypothesis.friedman(consistent.toDF("g", "t1", "t2", "t3"),
      "g", Seq("t1", "t2", "t3")).collect().head
    rc.getDouble(3) shouldBe 6.0
    rc.getBoolean(4) shouldBe true
    // all-tied blocks: den = 0 -> degenerate
    val flat = Seq(("f", 5.0, 5.0, 5.0), ("f", 2.0, 2.0, 2.0))
    val rf = Hypothesis.friedman(flat.toDF("g", "t1", "t2", "t3"),
      "g", Seq("t1", "t2", "t3")).collect().head
    rf.getDouble(3) shouldBe 0.0
    rf.getBoolean(4) shouldBe false
    an[IllegalArgumentException] should be thrownBy
      Hypothesis.friedman(flat.toDF("g", "t1", "t2", "t3"), "g", Seq("t1"))
  }

  test("riskCard computes exact ppm OR/RR/risk-diff with NULL zero cells") {
    // n11=2 n10=1 n01=1 n00=2: OR = 4, RR = 2, diff = 2/3 - 1/3
    val d = Seq(("g", 1L, 1L), ("g", 1L, 1L), ("g", 1L, 0L),
      ("g", 0L, 1L), ("g", 0L, 0L), ("g", 0L, 0L))
    val r = Hypothesis.riskCard(d.toDF("g", "e", "o"), "g", "e", "o")
      .collect().head
    (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) shouldBe
      ((2L, 1L, 1L, 2L))
    r.getLong(6) shouldBe 4000000L
    r.getLong(7) shouldBe 2000000L
    r.getLong(8) shouldBe (666666L - 333333L)
    // protective exposure: n01 = 0 -> OR/RR NULL, risk diff defined
    val z = Seq(("z", 1L, 1L), ("z", 1L, 0L), ("z", 0L, 0L))
    val rz = Hypothesis.riskCard(z.toDF("g", "e", "o"), "g", "e", "o")
      .collect().head
    assert(rz.isNullAt(6) && rz.isNullAt(7))
    rz.getLong(8) shouldBe 500000L
  }

  test("levene matches the driver mirror and ranks unequal spread high") {
    import graft.functions.Rounding.p6d
    // arm a: (1,5,3) mean 3 -> |z| = 2,2,0 ; arm b: (10,20,30,20)
    // mean 20 -> |z| = 10,0,10,0
    val df = Seq(("g", "a", 1.0), ("g", "a", 5.0), ("g", "a", 3.0),
      ("g", "b", 10.0), ("g", "b", 20.0), ("g", "b", 30.0),
      ("g", "b", 20.0)).toDF("g", "arm", "x")
    val r = Hypothesis.levene(df, "g", "arm", "x").collect().head
    r.getAs[Long]("n") shouldBe 7L
    r.getAs[Long]("df1") shouldBe 1L
    r.getAs[Long]("df2") shouldBe 5L
    // micro-unit mirror: zu_a = (2e6, 2e6, 0), zu_b = (1e7, 0, 1e7, 0)
    // szu: 4e6 / 2e7 ; szzu: 8e12 / 2e14 ; floored S²/n stations
    val bsu = BigInt(4000000L) * 4000000L / 3 +
      BigInt(20000000L) * 20000000L / 4
    val tzu = BigInt(24000000L); val tzzu = BigInt("208000000000000")
    val t2n = tzu * tzu / 7
    val between = (bsu - t2n).toDouble
    val within = (tzzu - bsu).toDouble
    r.getAs[Double]("w_stat") shouldBe p6d((5.0 * between) / (1.0 * within))
    // zero within-group deviation SPREAD is degenerate: the W ratio
    // is undefined, so the stat is NULL — never a clamped-denominator
    // astronomic value. Both flavors: between-spread zero too (every
    // |z| identical) and between-spread nonzero (constant |z| within
    // each arm but different across arms — the case a 1.0-clamp would
    // have turned into W ~ 2e12).
    val same = Seq(("h", "a", 1.0), ("h", "a", 3.0),
      ("h", "b", 11.0), ("h", "b", 13.0)).toDF("g", "arm", "x")
    Hypothesis.levene(same, "g", "arm", "x").collect()
      .head.isNullAt(5) shouldBe true
    val flat = Seq(("i", "a", 1.0), ("i", "a", 3.0),
      ("i", "b", 10.0), ("i", "b", 14.0)).toDF("g", "arm", "x")
    Hypothesis.levene(flat, "g", "arm", "x").collect()
      .head.isNullAt(5) shouldBe true
  }

  test("welchAnova matches the driver mirror on exact moments") {
    import graft.functions.Rounding.p6d
    // arm a: (10,14) n=2 ; arm b: (1,2,3) n=3 ; arm c: dropped (n=1)
    val df = Seq(("g", "a", 10.0), ("g", "a", 14.0), ("g", "b", 1.0),
      ("g", "b", 2.0), ("g", "b", 3.0), ("g", "c", 99.0))
      .toDF("g", "arm", "x")
    val r = Hypothesis.welchAnova(df, "g", "arm", "x").collect().head
    r.getAs[Long]("n") shouldBe 5L
    r.getAs[Long]("k_arms") shouldBe 2L
    // mirror with the same p6 stations
    val (ma, va) = (p6d(24.0 / 2), p6d((296.0 - 288.0) / 1.0)) // 12, 8
    val (mb, vb) = (p6d(6.0 / 3), p6d((14.0 - 12.0) / 2.0))    // 2, 1
    val (wa, wb) = (p6d(2.0 / va), p6d(3.0 / vb))
    val sw = BigDecimal(wa).setScale(6) + BigDecimal(wb).setScale(6)
    val swm = BigDecimal(p6d(wa) * p6d(ma)) + BigDecimal(wb * mb)
    val grand = p6d(swm.toDouble / sw.toDouble)
    val st = BigDecimal(p6d(wa * (ma - grand) * (ma - grand))).setScale(6) +
      BigDecimal(p6d(wb * (mb - grand) * (mb - grand))).setScale(6)
    val su = BigDecimal(p6d((1.0 - wa / sw.toDouble) * (1.0 - wa / sw.toDouble) / 1.0))
      .setScale(6) +
      BigDecimal(p6d((1.0 - wb / sw.toDouble) * (1.0 - wb / sw.toDouble) / 2.0))
        .setScale(6)
    val f = p6d((st.toDouble / 1.0) /
      (1.0 + 2.0 * 0.0 / 3.0 * su.toDouble))
    r.getAs[Double]("f_stat") shouldBe f
    r.getAs[Long]("df1") shouldBe 1L
    r.getAs[Double]("df2") shouldBe p6d(3.0 / (3.0 * su.toDouble))
  }

  test("jonckheere counts doubled dominance exactly and guards the arm range") {
    // arms 0:[1,2] 1:[3,4] -> every cross pair ascends: U=4, JT2=8
    val up = Seq(("g", 0L, 1.0), ("g", 0L, 2.0), ("g", 1L, 3.0),
      ("g", 1L, 4.0)).toDF("g", "arm", "v")
    val r = Hypothesis.jonckheere(up, "g", "arm", "v", maxArm = 5)
      .collect().head
    r.getAs[Long]("jt2") shouldBe 8L
    r.getAs[Long]("e2") shouldBe 4L // (16 - 8) / 2
    r.getAs[Double]("z") should be > 0.0
    // a full tie across arms: JT2 = ties only = E2 -> z = 0
    val tie = Seq(("g", 0L, 7.0), ("g", 1L, 7.0)).toDF("g", "arm", "v")
    val rt = Hypothesis.jonckheere(tie, "g", "arm", "v", maxArm = 5)
      .collect().head
    rt.getAs[Long]("jt2") shouldBe 1L
    rt.getAs[Long]("e2") shouldBe 1L
    rt.getAs[Double]("z") shouldBe 0.0
    // out-of-range arm raises
    val bad = Seq(("g", 9L, 1.0)).toDF("g", "arm", "v")
    intercept[Exception] {
      Hypothesis.jonckheere(bad, "g", "arm", "v", maxArm = 5).collect()
    }.getMessage should include("bucket the arm column")
  }

  test("multipleTesting: BH cutoff, Holm step-down, and q-values on a known family") {
    val sp = spark; import sp.implicits._
    val df = Seq(("f", "h1", 0.001), ("f", "h2", 0.009), ("f", "h3", 0.02),
      ("f", "h4", 0.04), ("f", "h5", 0.9)).toDF("fam", "k", "p")
    val out = Hypothesis.multipleTesting(df, "fam", "k", "p")
      .collect().map(r => r.getString(1) ->
        ((r.getLong(3), r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    // BH at alpha=.05: thresholds j/100 -> ranks 1..4 reject, 5 not
    out("h1") shouldBe ((1L, 1L, 1L, 0.005))
    out("h2") shouldBe ((2L, 1L, 1L, 0.0225))
    // Holm dies at rank 3: 0.02 > 0.05/3 = 0.016667 (exact micro:
    // 20000*3 = 60000 > 50000)
    out("h3") shouldBe ((3L, 1L, 0L, 0.033333))
    out("h4") shouldBe ((4L, 1L, 0L, 0.05))
    out("h5") shouldBe ((5L, 0L, 0L, 0.9))
  }

  test("multipleTesting boundary: p exactly at the BH line rejects (<=)") {
    val sp = spark; import sp.implicits._
    // m = 2, alpha = .05: rank-2 line is exactly 0.05
    val df = Seq(("f", "a", 0.01), ("f", "b", 0.05)).toDF("fam", "k", "p")
    val out = Hypothesis.multipleTesting(df, "fam", "k", "p")
      .collect().map(r => r.getString(1) -> r.getLong(5)).toMap
    out("b") shouldBe 1L
  }
}
