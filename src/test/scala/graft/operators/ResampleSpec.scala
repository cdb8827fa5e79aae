package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  test("gapFill carries the latest value forward on an aligned grid") {
    // user A: events at Jan1 10:00 (v=1) and Jan3 09:00 (v=3) -> slots
    // Jan1/Jan2/Jan3 00:00. Slot boundaries SAMPLE the series: Jan1
    // midnight precedes the first event (null), Jan2 and Jan3 midnight
    // both see v=1 (the Jan3 event lands after its slot's boundary).
    // user B: one event exactly ON a boundary -> filled at its own slot
    // (as-of is inclusive).
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-03 09:00:00", 3.0),
      (2L, "2024-01-05 00:00:00", 7.0))
      .toDF("user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Resample.gapFill(ev, "user_id", "ts",
      Map("value" -> "v"), stepSeconds = 86400L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val d = 86400L
    val jan1 = java.time.LocalDate.of(2024, 1, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    out((1L, jan1)) shouldBe None
    out((1L, jan1 + d)) shouldBe Some(1.0)
    out((1L, jan1 + 2 * d)) shouldBe Some(1.0)
    out((2L, jan1 + 4 * d)) shouldBe Some(7.0)
    out.size shouldBe 4 // per-key ranges: 3 slots for A, 1 for B
  }

  test("null-timestamp events are excluded, never backfilled") {
    // without the filter, the ascending as-of window orders the null
    // first and its payload would leak into the pre-first-event slot
    val ev = Seq(
      (1L, Some("2024-01-02 10:00:00"), 1.0),
      (1L, Option.empty[String], 9.0))
      .toDF("user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Resample.gapFill(ev, "user_id", "ts",
      Map("value" -> "v"), stepSeconds = 86400L).collect()
    out.length shouldBe 1
    out(0).isNullAt(2) shouldBe true // Jan2 00:00 precedes the event
  }

  test("chunked grid generation is seamless past the 4096-slot chunk size") {
    // 3 days at minute steps = 4321 slots: spans a chunk boundary
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-04 00:00:00", 2.0))
      .toDF("user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val g = Resample.gapFill(ev, "user_id", "ts", Map("value" -> "v"), 60L)
    g.count() shouldBe 4321L
    // slots are distinct, contiguous, and minute-aligned
    val slots = g.select("slot").collect().map(_.getLong(0)).sorted
    slots.distinct.length shouldBe 4321
    slots.zip(slots.tail).foreach { case (a, b) => (b - a) shouldBe 60L }
  }

  test("pre-1970 timestamps align to the floor boundary, not toward zero") {
    // 1969-12-31 18:00 UTC = epoch -21600s. Floor day-alignment puts
    // its slot at 1969-12-31 00:00 (-86400), NOT 1970-01-01 (0) as
    // truncating division would — pinned so both engine and oracle
    // keep floor semantics for negative epochs.
    val ev = Seq((1L, "1969-12-31 18:00:00", 5.0))
      .toDF("user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val out = Resample.gapFill(ev, "user_id", "ts",
      Map("value" -> "v"), stepSeconds = 86400L).collect()
    out.length shouldBe 1
    out.head.getLong(1) shouldBe -86400L
    // the slot boundary precedes the event, so it samples null — same
    // boundary-sampling contract as the positive-epoch test above
    out.head.isNullAt(2) shouldBe true
  }

  test("trendSlope recovers an exact linear series; constant x reports 0") {
    // y = 3x + 7 over x in 0..4 -> slope exactly 3; single-x group -> 0
    val s = (0L to 4L).map(x => ("lin", x, 3.0 * x + 7)) :+ (("flat", 2L, 9.0)) :+ (("flat", 2L, 11.0))
    val out = Resample.trendSlope(s.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    out("lin") shouldBe ((5L, 3.0))
    out("flat") shouldBe ((2L, 0.0))
  }

  test("autocorr1: alternating series -1, rising series ~1, constant 0, gaps drop pairs") {
    // alternating 1,2,1,2,... has EXACT r1 = -1 (hand-checked sums:
    // n=5, sab=10, sa=7, sb=8, saa=11, sbb=14 -> -6/(√6·√6))
    val rows =
      (0L to 5L).map(x => ("alt", x, if (x % 2 == 0) 1L else 2L)) ++
      (0L to 5L).map(x => ("lin", x, x)) ++
      (0L to 5L).map(x => ("const", x, 7L)) ++
      Seq(("gap", 0L, 3L), ("gap", 1L, 5L), ("gap", 3L, 9L))
    val out = Resample.autocorr1(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    out("alt")._1 shouldBe 5L
    out("alt")._2 shouldBe (-1.0 +- 1e-9)
    out("lin")._2 shouldBe (1.0 +- 1e-9)
    out("const") shouldBe ((5L, 0.0))
    // the x=1 -> x=3 jump is NOT a lag-1 pair; the lone surviving pair
    // has zero variance per arm -> 0
    out("gap") shouldBe ((1L, 0.0))
  }

  test("ewma folds in order-column order; single point returns itself") {
    val s = Seq(
      ("a", "d1", 1.0), ("a", "d2", 2.0), ("a", "d3", 3.0),
      ("b", "d1", 7.0)).toDF("g", "day", "v")
    val out = Resample.ewma(s, "g", "day", "v", alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // a: seed 1, (1+2)/2 = 1.5, (1.5+3)/2 = 2.25
    out("a") shouldBe ((3L, 3.0, 2.25))
    out("b") shouldBe ((1L, 7.0, 7.0))
  }

  test("holt tracks a drifting series with a trend component ewma misses") {
    val implicits = spark.implicits; import implicits._
    // a: [4, 8, 6] — l=4,t=0; x=8: l=6,t=1; x=6: l=6.5,t=0.75 -> 7.25
    // b: single point — level = value, trend 0, forecast = value
    val s = Seq(("a", "d1", 4.0), ("a", "d2", 8.0), ("a", "d3", 6.0),
      ("b", "d1", 5.0)).toDF("g", "day", "v")
    val out = Resample.holt(s, "g", "day", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    out("a") shouldBe ((3L, 6.5, 0.75, 7.25))
    out("b") shouldBe ((1L, 5.0, 0.0, 5.0))
    // a pure linear ramp is tracked exactly in the limit direction:
    // forecast overshoots toward the next ramp value, ewma lags below
    val ramp = (1 to 8).map(i => ("r", f"d$i%02d", i.toDouble)).toDF("g", "day", "v")
    val h = Resample.holt(ramp, "g", "day", "v").collect()(0)
    val e = Resample.ewma(ramp, "g", "day", "v").collect()(0)
    h.getDouble(5) should be > e.getDouble(3) // forecast > flat ewma
    h.getDouble(4) should be > 0.0 // positive trend detected
  }

  test("decayedScores halves a contribution per half-life with exact totals") {
    // key a: 10 at T and 10 one half-life earlier -> 10 + 5 = 15
    // key b: 8 two half-lives before T -> 2
    val ev = Seq(
      ("a", 86400000000L, 10.0), ("a", 0L, 10.0),
      ("b", -86400000000L, 8.0))
      .toDF("k", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Resample.decayedScores(ev, "k", "ts", "v", halfLifeDays = 1.0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    out("a") shouldBe ((2L, 15.0))
    out("b") shouldBe ((1L, 2.0))
  }

  test("trailingDeviation scores exact bp vs the preceding window") {
    // window 2: day 3 has trail {1,2}=3, v=6 -> 6*2*1e4/3 - 1e4 = 30000
    // day 4 has trail {2,6}=8, v=4 -> 4*2*1e4 div 8 - 1e4 = 0
    val s = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 6L), ("g", 4L, 4L))
      .toDF("g", "d", "v")
    val out = Resample.trailingDeviation(s, "g", "d", "v", window = 2)
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    out.keySet shouldBe Set(3L, 4L) // first `window` rows dropped
    out(3L) shouldBe ((3L, 30000L))
    out(4L) shouldBe ((8L, 0L))
    // zero trailing sums are dropped, not divided
    val z = Seq(("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 5L))
      .toDF("g", "d", "v")
    Resample.trailingDeviation(z, "g", "d", "v", window = 2)
      .count() shouldBe 0L
  }

  test("theilSen takes the exact pairwise-slope median, odd and even") {
    // odd: y = 1,2,4 at x = 0,1,2 -> slopes 1, 1.5, 2 -> median 1.5
    val odd = Seq(("g", 0L, 1L), ("g", 1L, 2L), ("g", 2L, 4L))
      .toDF("g", "x", "y")
    val ro = Resample.theilSen(odd, "g", "x", "y").collect()(0)
    ro.getLong(1) shouldBe 3L
    ro.getDouble(2) shouldBe 1.5
    // even: y = 0,1,3,4 -> sorted slopes 1,1,4/3,1.5,1.5,2 ->
    // middles (4/3, 1.5) -> 1.416667
    val even = Seq(("g", 0L, 0L), ("g", 1L, 1L), ("g", 2L, 3L),
      ("g", 3L, 4L)).toDF("g", "x", "y")
    val re = Resample.theilSen(even, "g", "x", "y").collect()(0)
    re.getLong(1) shouldBe 6L
    re.getDouble(2) shouldBe 1.416667
  }

  test("theilSen shrugs off the outlier day that swings OLS") {
    // clean slope 1 with one wild final day (an end outlier tilts
    // OLS hard; a center one would cancel)
    val pts = (0L to 10L).map(x => ("g", x, if (x == 10L) 500L else x))
    val ts = Resample.theilSen(pts.toDF("g", "x", "y"), "g", "x", "y")
      .collect()(0).getDouble(2)
    val ols = Resample.trendSlope(pts.toDF("g", "x", "y"), "g", "x", "y")
      .collect()(0).getDouble(2)
    ts shouldBe 1.0 +- 0.2
    math.abs(ols - 1.0) should be > 5.0
  }

  test("crossCorr peaks at the planted lead and matches hand-computed r") {
    // y at day d is 10x of x at day d-1: a one-step lead, r(lag=1) = 1
    val xs = Seq((0L, 1L), (1L, 3L), (2L, 2L), (3L, 5L), (4L, 4L))
      .toDF("d", "x")
    val ys = Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 50L), (5L, 40L))
      .toDF("d", "y")
    val out = Resample.crossCorr(xs, ys, "d", "x", "y", maxLag = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    out(1L)._1 shouldBe 5L
    out(1L)._2 shouldBe 1.0 +- 1e-12
    // lag 0 by hand: pairs a=(3,2,5,4), b=(10,30,20,50) ->
    // num=20, da=20, db=3500 -> r = 20/sqrt(70000)
    out(0L)._1 shouldBe 4L
    out(0L)._2 shouldBe 20.0 / math.sqrt(70000.0) +- 1e-12
    // lag -1 pairs x at d in {2,3,4} with y at d-1 in {1,2,3}
    out(-1L)._1 shouldBe 3L
  }

  test("crossCorr: constant arms report r = 0; empty lags are absent") {
    val xs = Seq((0L, 1L), (1L, 2L)).toDF("d", "x")
    val flat = Seq((0L, 7L), (1L, 7L)).toDF("d", "y")
    val out = Resample.crossCorr(xs, flat, "d", "x", "y", maxLag = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out(0L) shouldBe 0.0
    // lags beyond the 2-day overlap produce no pairs -> no row
    out.keySet shouldBe Set(-1L, 0L, 1L)
  }

  test("logLogSlope recovers exact power-law exponents per group") {
    // g2: y = x^2 -> slope 2, r2 1; gm: y = 1000/x -> slope -1;
    // flat: zero y-variance -> slope ~0 (p6 rounding keeps den/dy a
    // hair off exact zero); xone: x constant at 1 (ln = 0 EXACTLY) ->
    // den = 0 -> NULL slope/r2; nonpositive x dropped
    val df = Seq(
      ("g2", 1.0, 1.0), ("g2", 2.0, 4.0), ("g2", 3.0, 9.0),
      ("g2", 4.0, 16.0),
      ("gm", 1.0, 1000.0), ("gm", 2.0, 500.0), ("gm", 4.0, 250.0),
      ("gm", -5.0, 100.0), // dropped: no log of a negative price
      ("flat", 1.0, 7.0), ("flat", 2.0, 7.0), ("flat", 3.0, 7.0),
      ("xone", 1.0, 2.0), ("xone", 1.0, 8.0))
      .toDF("g", "x", "y")
    val out = Resample.logLogSlope(df, "g", "x", "y").collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    out("g2")._1 shouldBe 4L
    out("g2")._2.get shouldBe 2.0 +- 1e-5
    out("g2")._3.get shouldBe 1.0 +- 1e-5
    out("gm")._1 shouldBe 3L
    out("gm")._2.get shouldBe -1.0 +- 1e-5
    out("flat")._2.get shouldBe 0.0 +- 1e-4
    out("xone")._2 shouldBe None
    out("xone")._3 shouldBe None
  }

  test("concurrency matches the hand-walked sweep line across buckets") {
    // [0,2), [1,3), [2,4): deltas +1@0 +1@1 (+1-1)@2 -1@3 -1@4
    // -> open 1/2/2/1/0; bucketWidth 2 forces cross-bucket offsets
    val iv = Seq((0L, 2L), (1L, 3L), (2L, 4L)).toDF("s", "e")
    val out = Resample.concurrency(iv, "s", "e", bucketWidth = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 0L)
    // zero-length and inverted intervals never open; nulls drop
    val bad = Seq((Option(5L), Option(5L)), (Option(9L), Option(8L)),
      (Option.empty[Long], Option(1L)), (Option(6L), Option(7L)))
      .toDF("s", "e")
    Resample.concurrency(bad, "s", "e").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(6L -> 1L, 7L -> 0L)
    an[IllegalArgumentException] should be thrownBy
      Resample.concurrency(iv, "s", "e", bucketWidth = 0L)
  }
  private def tsRows(key: String, dayCounts: Seq[(Int, Int)]) =
    dayCounts.flatMap { case (day, n) =>
      Seq.fill(n)((key,
        new java.sql.Timestamp(day.toLong * 86400000L + 43200000L)))
    }

  test("weekdaySeasonality hand-computed eta-squared cards") {
    // two weeks where day%7==0 carries 10 events, the rest 1:
    // within-weekday counts are constant -> eta2 exactly 1, seasonal
    val strong = tsRows("g", (0 until 14).map(d =>
      (d, if (d % 7 == 0) 10 else 1)))
    val r = Resample.weekdaySeasonality(strong.toDF("k", "ts"), "k", "ts")
      .collect().head
    r.getLong(1) shouldBe 14L
    r.getDouble(2) shouldBe 1.0
    r.getBoolean(3) shouldBe true
    // constant series: SS_total = 0 -> degenerate, not seasonal
    val flat = tsRows("f", (0 until 14).map((_, 2)))
    val rf = Resample.weekdaySeasonality(flat.toDF("k", "ts"), "k", "ts")
      .collect().head
    rf.getDouble(2) shouldBe 0.0
    rf.getBoolean(3) shouldBe false
    // one bump on day 0/7's weekday: eta2 = 24/52
    val mixed = tsRows("m", (0 until 14).map(d => (d, if (d == 0) 3 else 1)))
    val rm = Resample.weekdaySeasonality(mixed.toDF("k", "ts"), "k", "ts")
      .collect().head
    rm.getDouble(2) shouldBe graft.functions.Rounding.p6d(24.0 / 52.0)
    rm.getBoolean(3) shouldBe true
  }

  test("seasonalNaiveError hand-computed with a gap (missing days pair nothing)") {
    // days 0,1,2,7,8 with counts 5,3,9,5,4:
    //   lag1 pairs (1,0)(2,1)(8,7): sae1 = 2+6+1 = 9 over 3
    //   lag7 pairs (7,0)(8,1): sae7 = 0+1 = 1 over 2
    //   ratio = (1/2)/(9/3) = 0.166667
    val rows = tsRows("g", Seq((0, 5), (1, 3), (2, 9), (7, 5), (8, 4)))
    val r = Resample.seasonalNaiveError(rows.toDF("k", "ts"), "k", "ts")
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) shouldBe ((5L, 3L, 9L, 2L, 1L))
    r.getDouble(6) shouldBe 0.166667
  }

  test("seasonalNaiveError: constant series and pairless series report NULL ratio") {
    val const = tsRows("c", Seq((0, 2), (1, 2), (2, 2)))
    val rc = Resample.seasonalNaiveError(const.toDF("k", "ts"), "k", "ts")
      .collect().head
    rc.getLong(3) shouldBe 0L // sae1 = 0
    assert(rc.isNullAt(6))
    // single day: no lag pairs at all
    val single = tsRows("s", Seq((5, 4)))
    val rs = Resample.seasonalNaiveError(single.toDF("k", "ts"), "k", "ts")
      .collect().head
    (rs.getLong(2), rs.getLong(4)) shouldBe ((0L, 0L))
    assert(rs.isNullAt(6))
  }
  test("burstiness: metronome -1, Poisson-boundary 0, degenerate NULL") {
    def evs(key: Long, secs: Seq[Long]) = secs.zipWithIndex.map {
      case (t, i) => (key, new java.sql.Timestamp(t * 1000L), i.toLong)
    }
    // gaps 10,10: sigma 0 -> B = -1; gaps 0,100: CV = 1 -> B = 0
    val rows = evs(1L, Seq(0L, 10L, 20L)) ++ evs(2L, Seq(0L, 0L, 100L)) ++
      evs(3L, Seq(5L, 5L, 5L)) ++ evs(4L, Seq(42L))
    val out = Resample.burstiness(rows.toDF("k", "ts", "tie"),
        "k", "ts", "tie")
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getDouble(4) shouldBe -1.0
    out(1L).getLong(3) shouldBe 10L // exact mean gap
    out(2L).getDouble(4) shouldBe 0.0
    assert(out(3L).isNullAt(4)) // all gaps zero
    assert(out(4L).isNullAt(4)) // single event: no gaps
    (out(4L).getLong(1), out(4L).getLong(2)) shouldBe ((1L, 0L))
  }
}
