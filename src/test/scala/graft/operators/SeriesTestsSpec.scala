package graft.operators

import graft.SparkSpec
import graft.functions.Rounding.p6d

class SeriesTestsSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def series(ys: Seq[Long], g: String = "g") =
    ys.zipWithIndex.map { case (y, i) => (g, i.toLong, y) }
      .toDF("g", "o", "y")

  // driver mirror of ljungBox's integer algebra (BigInt-exact)
  private def lbMirror(ys: Seq[Long], m: Int): (Double, Long) = {
    val n = ys.size
    val s = ys.map(BigInt(_)).sum
    val syy = ys.map(y => BigInt(y) * y).sum
    val varn2 = BigInt(n) * n * syy - BigInt(n) * s * s
    val terms = (1 to m).flatMap { k =>
      if (k >= n) None
      else {
        val c = (0 until n - k).map(t => BigInt(ys(t)) * ys(t + k)).sum
        val head = ys.take(n - k).map(BigInt(_)).sum
        val tail = ys.drop(k).map(BigInt(_)).sum
        val covn2 = BigInt(n) * n * c - BigInt(n) * s * (head + tail) +
          BigInt(n - k) * s * s
        val rho =
          if (varn2 > 0) p6d(covn2.toDouble / varn2.toDouble) else 0.0
        Some(p6d(rho * rho / (n - k).toDouble))
      }
    }
    val st = terms
      .map(t => BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum
    (p6d(n.toDouble * (n.toDouble + 2.0) * st.toDouble), terms.size.toLong)
  }

  test("ljungBox matches the BigInt driver mirror exactly") {
    val ys = (1 to 60).map(i => ((i * 37 + 11) % 23 + (i % 5) * 7).toLong)
    val r = SeriesTests.ljungBox(series(ys), "g", "o", "y", maxLag = 7)
      .collect().head
    val (q, m) = lbMirror(ys, 7)
    r.getAs[Long]("n") shouldBe 60L
    r.getAs[Long]("m_lags") shouldBe m
    r.getAs[Double]("q_stat") shouldBe q
  }

  test("ljungBox separates a ramp from hash-scrambled noise") {
    val ramp = (1 to 80).map(_.toLong) // strong positive ACF at all lags
    val rampRow = SeriesTests.ljungBox(series(ramp), "g", "o", "y")
      .collect().head
    rampRow.getAs[Long]("reject") shouldBe 1L
    // white noise from the md5 integer: no memory at any lag
    val noise = (1 to 200).map { i =>
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"lb|$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 4), 16)
    }
    val noiseRow = SeriesTests.ljungBox(series(noise), "g", "o", "y")
      .collect().head
    noiseRow.getAs[Long]("reject") shouldBe 0L
  }

  test("runsTest counts runs exactly and signs the z by clustering") {
    // 3/9 above mean (mean = 35: values 80,80,80 above): pattern
    // AAABBBBBB -> 2 runs
    val blocky = series(Seq(80L, 80L, 80L, 10L, 10L, 10L, 10L, 10L, 10L))
    val b = SeriesTests.runsTest(blocky, "g", "o", "y").collect().head
    b.getAs[Long]("n") shouldBe 9L
    b.getAs[Long]("n_above") shouldBe 3L
    b.getAs[Long]("runs") shouldBe 2L
    b.getAs[Double]("z") should be < 0.0 // clustered: too FEW runs
    // perfect alternation: maximal runs, z > 0
    val alt = series((1 to 20).map(i => if (i % 2 == 0) 100L else 1L))
    val a = SeriesTests.runsTest(alt, "g", "o", "y").collect().head
    a.getAs[Long]("runs") shouldBe 20L
    a.getAs[Double]("z") should be > 0.0
    // constant series: nothing above the mean, Var = 0 -> z = 0
    val const = SeriesTests.runsTest(series(Seq.fill(6)(5L)), "g", "o", "y")
      .collect().head
    const.getAs[Long]("n_above") shouldBe 0L
    const.getAs[Double]("z") shouldBe 0.0
  }

  test("pettitt finds a level shift at the right index, hand-checked U") {
    // 1,2,3,101,102,103: ranks 1..6, mid2 = 2..12 even
    // W2_t cum: 2,6,12,20,30,42; U_t = W2_t - 7t: -5,-8,-9,-8,-5
    // K = 9 at t = 3 (the last low point)
    val r = SeriesTests.pettitt(
      series(Seq(1L, 2L, 3L, 101L, 102L, 103L)), "g", "o", "y")
      .collect().head
    r.getAs[Long]("n") shouldBe 6L
    r.getAs[Long]("k_stat") shouldBe 9L
    r.getAs[Long]("t_star") shouldBe 3L
    r.getAs[Long]("ord_star") shouldBe 2L // 0-based ord of the 3rd row
    r.getAs[Double]("p_approx") shouldBe
      p6d(math.min(1.0, 2.0 * math.exp(-6.0 * 81.0 / (216.0 + 36.0))))
  }

  test("pettitt midranks stay integer under ties and tie-break earliest") {
    // all equal: every U_t = 0, argmax tie-breaks to t = 1
    val r = SeriesTests.pettitt(series(Seq(7L, 7L, 7L, 7L)), "g", "o", "y")
      .collect().head
    r.getAs[Long]("k_stat") shouldBe 0L
    r.getAs[Long]("t_star") shouldBe 1L
    r.getAs[Double]("p_approx") shouldBe 1.0
  }

  test("acf exposes the lag table: alternation is -1 at lag 1, +1 at lag 2") {
    val alt = series((1 to 40).map(i => if (i % 2 == 0) 10L else 0L))
    val rho = SeriesTests.acf(alt, "g", "o", "y", maxLag = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    rho(1L) should be(-1.0 +- 0.06) // full-mean ACF edge effects
    rho(2L) should be(1.0 +- 0.06)
    // constant series: zero variance -> rho pinned to 0
    val const = SeriesTests.acf(series(Seq.fill(10)(5L)), "g", "o", "y", 2)
      .collect().map(_.getDouble(3)).toSet
    const shouldBe Set(0.0)
  }

  test("seasonalDecompose centers indices and finds the boosted weekday") {
    val sp = spark; import sp.implicits._
    // 10 weeks of contiguous days, dow 1..7 cycling; dow 3 runs +70
    val rows = (0 until 70).map { i =>
      val dow = i % 7 + 1
      ("g", f"day$i%03d", dow.toLong,
        100L + (if (dow == 3) 70L else 0L))
    }.toDF("g", "o", "dow", "y")
    val out = SeriesTests.seasonalDecompose(rows, "g", "o", "dow", "y")
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    out.size shouldBe 7
    // indices sum to ~0 and the boosted dow dominates
    out.values.sum shouldBe 0.0 +- 1e-4
    out.maxBy(_._2)._1 shouldBe 3L
    out(3L) should be > 50.0
  }

  test("seasonalDecompose flat series gives all-zero indices") {
    val sp = spark; import sp.implicits._
    val flat = (0 until 35).map(i =>
      ("h", f"day$i%03d", (i % 7 + 1).toLong, 42L))
      .toDF("g", "o", "dow", "y")
    val out = SeriesTests.seasonalDecompose(flat, "g", "o", "dow", "y")
      .collect().map(_.getDouble(3)).toSet
    out shouldBe Set(0.0)
  }

  test("hurstRS separates a ramp from hash noise") {
    // pure ramp: strongly persistent, H near 1
    val ramp = series((1 to 256).map(_.toLong * 3))
    val hr = SeriesTests.hurstRS(ramp, "g", "o", "y").collect().head
    hr.getAs[Long]("n_points") shouldBe 256L
    hr.getAs[Long]("n_sizes") shouldBe 4L
    hr.getAs[Double]("hurst") should be > 0.85
    // md5-derived iid noise: H near 0.5
    val noise = series((1 to 512).map { i =>
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"h|$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 3), 16)
    })
    val hn = SeriesTests.hurstRS(noise, "g", "o", "y").collect().head
    hn.getAs[Double]("hurst") should be(0.5 +- 0.2)
  }
}
