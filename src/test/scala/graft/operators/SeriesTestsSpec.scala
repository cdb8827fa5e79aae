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
}
