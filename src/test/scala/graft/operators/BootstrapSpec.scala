package graft.operators

import graft.SparkSpec
import graft.functions.Rounding.p6d

import java.math.{BigDecimal => JBD, RoundingMode}

/** The resampling estimators' randomness is a content hash, so every
  * number they emit is EXACTLY reproducible on the driver: these specs
  * mirror the md5-uniform, the Poisson ladder, and the decimal moment
  * sums in plain Scala/BigDecimal and assert bit equality — the same
  * double-discipline contract the DuckDB oracles hold.
  */
class BootstrapSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  // driver mirror of Bootstrap.u48: md5 48-bit prefix / 2^48
  private def u48d(tag: String, b: Int, key: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$tag|$b|$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16).toDouble /
      281474976710656.0
  }

  private def poissonWd(u: Double): Long = {
    val idx = Bootstrap.poissonCdf1.indexWhere(u < _)
    if (idx < 0) 7L else idx.toLong
  }

  private def d2(x: Double) = JBD.valueOf(x).setScale(2, RoundingMode.HALF_UP)
  private def d6(x: Double) = JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP)

  test("poissonW weights are Poisson(1)-shaped and sum near n") {
    val n = 5000
    val ws = (1 to n).map(i => poissonWd(u48d("pb", 0, i.toString)))
    val total = ws.sum.toDouble
    total should be(n.toDouble +- 3 * math.sqrt(n.toDouble)) // Var = n
    // P(0) = 1/e: the zero share lands near 36.8%
    ws.count(_ == 0L).toDouble / n should be(0.3679 +- 0.03)
    ws.max should be <= 7L
  }

  test("poissonBootstrapMean matches the driver-side BigDecimal mirror exactly") {
    val rows = (1 to 200).map(i => ("g", i.toLong, (i % 37 + 1).toDouble)) ++
      (1 to 60).map(i => ("h", (1000 + i).toLong, (i % 11 + 2) * 3.0))
    val out = Bootstrap
      .poissonBootstrapMean(rows.toDF("g", "k", "x"), "g", "k", "x")
      .collect().map(r => r.getString(0) -> r).toMap

    for ((g, grp) <- rows.groupBy(_._1)) {
      val n = grp.size
      val sx = grp.map(r => d2(r._3)).reduce(_ add _)
      val reps = (0 until 32).flatMap { b =>
        val w = grp.map { case (_, k, x) =>
          (poissonWd(u48d("pb", b, k.toString)), d2(x))
        }
        val sw = w.map(_._1).sum
        if (sw == 0L) None
        else {
          val swx = w.map { case (wi, xi) =>
            xi.multiply(JBD.valueOf(wi)) }.reduce(_ add _)
          Some((b, p6d(swx.doubleValue / sw.toDouble)))
        }
      }
      val used = reps.size
      val sorted = reps.sortBy(r => (r._2, r._1)).map(_._2)
      val loR = math.max(1, math.ceil(used * 0.05).toLong).toInt
      val hiR = math.ceil(used * 0.95).toInt
      val sm = reps.map(r => d6(r._2)).reduce(_ add _)
      val sq = reps.map { r => val k = d6(r._2); k.multiply(k) }
        .reduce(_ add _)
      val se = p6d(math.sqrt(math.max(0.0,
        (sq.doubleValue - sm.doubleValue * sm.doubleValue / used) /
          (used - 1.0))))
      val r = out(g)
      r.getLong(1) shouldBe n.toLong
      r.getDouble(2) shouldBe p6d(sx.doubleValue / n)
      r.getLong(3) shouldBe used.toLong
      r.getDouble(4) shouldBe se
      r.getDouble(5) shouldBe sorted(loR - 1)
      r.getDouble(6) shouldBe sorted(hiR - 1)
    }
  }

  test("poissonBootstrapMean is partitioning-invariant") {
    val df = (1 to 300).map(i => (s"g${i % 3}", i.toLong, i * 1.5))
      .toDF("g", "k", "x")
    val a = Bootstrap.poissonBootstrapMean(df.repartition(7), "g", "k", "x")
      .collect().sortBy(_.getString(0)).map(_.toSeq)
    val b = Bootstrap.poissonBootstrapMean(df.coalesce(1), "g", "k", "x")
      .collect().sortBy(_.getString(0)).map(_.toSeq)
    a shouldBe b
  }

  test("jackknifeRatio matches the closed form on block totals") {
    // group "g": blocks (n=10,d=5), (n=20,d=10), (n=6,d=2)
    // theta = 36/17; leave-outs: 26/12, 16/7, 30/15
    val df = Seq(
      ("g", "b1", 4.0, 2.0), ("g", "b1", 6.0, 3.0),
      ("g", "b2", 20.0, 10.0), ("g", "b3", 6.0, 2.0))
      .toDF("g", "blk", "num", "den")
    val r = Bootstrap.jackknifeRatio(df, "g", "blk", "num", "den")
      .collect().head
    val th = Seq(26.0 / 12, 16.0 / 7, 30.0 / 15).map(p6d)
    val g = 3.0
    val sm = th.map(d6).reduce(_ add _)
    val sq = th.map { t => val k = d6(t); k.multiply(k) }.reduce(_ add _)
    r.getLong(1) shouldBe 3L
    r.getDouble(2) shouldBe p6d(36.0 / 17)
    r.getDouble(3) shouldBe
      p6d(g * p6d(36.0 / 17) - (g - 1) * (sm.doubleValue / g))
    r.getDouble(4) shouldBe p6d(math.sqrt(math.max(0.0,
      (g - 1) / g * (sq.doubleValue -
        sm.doubleValue * sm.doubleValue / g))))
  }

  test("jackknifeRatio drops a block whose removal empties the denominator") {
    // one block holds ALL of the denominator: its leave-out is 0/0
    val df = Seq(("g", "b1", 10.0, 5.0), ("g", "b2", 3.0, 0.0))
      .toDF("g", "blk", "num", "den")
    val r = Bootstrap.jackknifeRatio(df, "g", "blk", "num", "den")
      .collect().head
    // b1's removal leaves den = 0 (dropped); b2's leaves den = 5 (kept)
    r.getLong(1) shouldBe 1L
    r.getDouble(2) shouldBe p6d(13.0 / 5)
  }

  test("randomizationTest: strong separation gives the floor p-value, null gives a large one") {
    // strong effect: arm 1 values ~100x arm 0 -> no relabeling reaches it
    val strong = (1 to 400).map { i =>
      val arm = if (i % 2 == 0) 1L else 0L
      ("g", i.toString, arm, if (arm == 1L) 500.0 + i % 7 else 5.0 + i % 7)
    }.toDF("g", "k", "arm", "x")
    val rs = Bootstrap.randomizationTest(strong, "g", "k", "arm", "x")
      .collect().head
    rs.getAs[Long]("n_extreme") shouldBe 0L
    rs.getAs[Double]("p_value") shouldBe
      p6d(1.0 / (rs.getAs[Long]("reps_used") + 1.0))

    // null: the arm is ITSELF a hash coin from a different salt, so
    // the observed diff is a typical draw -> p far from the floor
    val nullDf = (1 to 400).map { i =>
      ("g", i.toString, if (u48d("arm", 0, i.toString) < 0.5) 1L else 0L,
        (i % 23).toDouble)
    }.toDF("g", "k", "arm", "x")
    val rn = Bootstrap.randomizationTest(nullDf, "g", "k", "arm", "x")
      .collect().head
    rn.getAs[Double]("p_value") should be > 0.1
  }

  test("randomizationTest d_obs is the exact two-arm mean difference") {
    val df = Seq(("g", "a", 1L, 10.0), ("g", "b", 1L, 14.0),
      ("g", "c", 0L, 3.0), ("g", "d", 0L, 5.0))
      .toDF("g", "k", "arm", "x")
    val r = Bootstrap.randomizationTest(df, "g", "k", "arm", "x")
      .collect().head
    r.getAs[Long]("n") shouldBe 4L
    r.getAs[Long]("n1") shouldBe 2L
    r.getAs[Double]("d_obs") shouldBe p6d(12.0 - 4.0)
  }
}
