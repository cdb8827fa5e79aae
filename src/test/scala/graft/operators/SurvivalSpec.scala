package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

class SurvivalSpec extends SparkSpec {


  private lazy val implicits = spark.implicits
  import implicits._

  private def km(rows: Seq[(Long, Long)], bucketWidth: Long = 4096L) =
    Survival.kaplanMeier(rows.toDF("dur", "ev"), "dur", "ev", bucketWidth)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("hand-computed curve: events step the product, censors only shrink risk") {
    // t=1: d=1 of n=4 -> S=3/4; t=2: c=1 (n_risk 3, S unchanged);
    // t=3: d=1 of n=2 -> S=3/8
    val out = km(Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 0L)))
    out(1L) shouldBe ((4L, 1L, 0L, 0.75))
    out(2L) shouldBe ((3L, 0L, 1L, 0.75))
    out(3L) shouldBe ((2L, 1L, 1L, 0.375))
    out.size shouldBe 3
  }

  test("a duration where everyone at risk dies pins survival to exactly 0 from then on") {
    // t=1: d=1 of 3 -> 2/3; t=2: d=2 of 2 -> factor 0 -> S=0 (no -inf)
    val out = km(Seq((1L, 1L), (2L, 1L), (2L, 1L)))
    out(1L)._4 shouldBe 0.666667 +- 1e-9 // pround6 of 2/3
    out(2L) shouldBe ((2L, 2L, 0L, 0.0))
  }

  test("results are bucketWidth-invariant (cross-bucket prefix path ≡ one bucket)") {
    val rows = Seq((0L, 1L), (1L, 0L), (3L, 1L), (4L, 1L), (4L, 0L),
      (7L, 1L), (9L, 0L), (12L, 1L), (15L, 1L), (15L, 1L))
    val wide = km(rows) // all durations in one bucket
    val narrow = km(rows, bucketWidth = 2L) // forces 8 buckets
    narrow shouldBe wide // DECIMAL log-sums are associative-exact
  }

  test("law: survival is non-increasing in duration; equals empirical survival with no censoring") {
    val durations = Gen.listOfN(40, Gen.choose(0L, 20L)).suchThat(_.nonEmpty)
    check(Prop.forAll(durations) { ds =>
      // all events observed (no censoring): KM telescopes to the
      // empirical survivor function (#obs with duration > t) / n
      val out = km(ds.map(d => (d, 1L))).toSeq.sortBy(_._1)
      val survs = out.map(_._2._4)
      val nonIncreasing = survs.zip(survs.drop(1)).forall { case (a, b) => b <= a }
      val n = ds.size.toDouble
      val matchesEmpirical = out.forall { case (t, (_, _, _, s)) =>
        math.abs(s - ds.count(_ > t) / n) <= 1e-4 // pround6, <=21 steps
      }
      // the at-risk accounting: n_risk at the smallest duration is n
      nonIncreasing && matchesEmpirical && out.head._2._1 == ds.size.toLong
    })
  }

  test("nelsonAalen hand-computed hazard; FromCounts equals the raw path") {
    // t=1: d=1 of n=4 -> 0.25; t=2: censor only -> unchanged;
    // t=3: d=1 of n=2 -> +0.5 = 0.75
    val rows = Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 0L))
    def haz(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val out = haz(Survival.nelsonAalen(rows.toDF("dur", "ev"), "dur", "ev"))
    out(1L) shouldBe ((4L, 1L, 0L, 0.25))
    out(2L) shouldBe ((3L, 0L, 1L, 0.25))
    out(3L) shouldBe ((2L, 1L, 1L, 0.75))
    // the pre-aggregated-counts path (the streaming state shape) is
    // the same machinery: identical rows
    val counts = Seq((1L, 1L, 0L), (2L, 0L, 1L), (3L, 1L, 1L))
      .toDF("duration", "n_events", "n_censored")
    haz(Survival.nelsonAalenFromCounts(counts)) shouldBe out
  }

  test("law: cum_hazard is non-decreasing and matches the at-risk recurrence") {
    val durations = Gen.listOfN(30, Gen.choose(0L, 15L)).suchThat(_.nonEmpty)
    check(Prop.forAll(durations) { ds =>
      val out = Survival.nelsonAalen(ds.map(d => (d, 1L)).toDF("dur", "ev"),
          "dur", "ev")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
        .sortBy(_._1)
      // independent recurrence: walk distinct durations ascending,
      // n_risk drops by the count at each step, hazard accumulates
      // pround6(d/n)
      var n = ds.size.toLong
      var h = BigDecimal(0)
      val expect = ds.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1).map { case (t, d) =>
          h += BigDecimal(math.floor(d.toDouble / n * 1e6 + 0.5) / 1e6)
            .setScale(6)
          val row = (t, n, h.toDouble); n -= d; row
        }
      val hs = out.map(_._3)
      hs.zip(hs.drop(1)).forall { case (a, b) => b >= a } &&
        out.toSeq == expect
    })
  }

  test("NULL and negative durations are dropped, not welded into the curve") {
    val rows = Seq((Option(1L), Option(1L)), (Option(2L), Option(1L)),
      (Option.empty[Long], Option(1L)), (Option(-5L), Option(1L)),
      (Option(2L), Option.empty[Long]))
    val out = Survival.kaplanMeier(rows.toDF("dur", "ev"), "dur", "ev")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 2L, 2L -> 1L) // n_risk over the 2 valid obs
  }

  test("medianSurvival finds the first S <= 0.5 crossing, NULL when none") {
    // S: 0.75 at t=1, 0.375 at t=3 -> median 3
    val obs = Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 0L))
    val r = Survival.medianSurvival(obs.toDF("dur", "ev"), "dur", "ev")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((4L, 2L, 3L))
    // fewer than half churn: no crossing
    val few = Seq((1L, 1L), (2L, 0L), (3L, 0L), (4L, 0L))
    assert(Survival.medianSurvival(few.toDF("dur", "ev"), "dur", "ev")
      .collect().head.isNullAt(2))
    // empty input: degenerate one-row card
    val e = Survival.medianSurvival(
      Seq.empty[(Long, Long)].toDF("dur", "ev"), "dur", "ev")
      .collect().head
    (e.getLong(0), e.getLong(1)) shouldBe ((0L, 0L))
    assert(e.isNullAt(2))
  }

  test("rmst equals the hand-integrated KM step area") {
    import graft.functions.Rounding.p6d
    // S: 1 on [0,1), 0.666667 on [1,3), 0 from 3 (d=n sticky zero)
    val obs = Seq((1L, 1L), (2L, 0L), (3L, 1L))
    val r = Survival.rmst(obs.toDF("dur", "ev"), "dur", "ev", tau = 5L)
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((5L, 3L, 2L))
    val s1 = p6d(math.exp(p6d(math.log(2.0 / 3.0))))
    r.getDouble(3) shouldBe
      (BigDecimal(5) - BigDecimal(p6d((1.0 - s1) * 4.0)) -
        BigDecimal(p6d(s1 * 2.0))).toDouble
    // tau before the sticky step: only the first jump contributes
    val r2 = Survival.rmst(obs.toDF("dur", "ev"), "dur", "ev", tau = 2L)
      .collect().head
    r2.getDouble(3) shouldBe
      (BigDecimal(2) - BigDecimal(p6d(1.0 - s1))).toDouble
    // no events at all: S = 1 everywhere, rmst = tau
    val cen = Seq((4L, 0L), (9L, 0L))
    Survival.rmst(cen.toDF("dur", "ev"), "dur", "ev", tau = 7L)
      .collect().head.getDouble(3) shouldBe 7.0
    // empty input: one degenerate row
    val e = Survival.rmst(Seq.empty[(Long, Long)].toDF("dur", "ev"),
      "dur", "ev", tau = 7L).collect().head
    (e.getLong(1), e.getLong(2)) shouldBe ((0L, 0L))
    assert(e.isNullAt(3))
    an[IllegalArgumentException] should be thrownBy
      Survival.rmst(cen.toDF("dur", "ev"), "dur", "ev", tau = 0L)
  }
}
