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

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // spec-local 48-bit md5 uniform (used to construct a null arm from
  // an independent salt — NOT the operator's derivation)
  private def u48d(tag: String, b: Int, key: String): Double =
    java.lang.Long.parseLong(md5hex(s"$tag|$b|$key").substring(0, 12),
      16).toDouble / 281474976710656.0

  // driver mirror of Bootstrap.poissonReplicateSums' uniform:
  // replicate b reads the (b mod 5)'th 24-bit hex slot of digest
  // md5("tag|(b div 5)|key") over 2^24
  private def u24d(tag: String, b: Int, key: String): Double = {
    val hex = md5hex(s"$tag|${b / 5}|$key")
    val i = b % 5
    java.lang.Long.parseLong(hex.substring(6 * i, 6 * i + 6), 16)
      .toDouble / 16777216.0
  }

  // driver mirror of Bootstrap.randomizationTest's coin: bit
  // (b mod 48) of the 48-bit md5 prefix of "tag|(b div 48)|key"
  private def coinD(tag: String, b: Int, key: String): Long = {
    val h = java.lang.Long.parseLong(
      md5hex(s"$tag|${b / 48}|$key").substring(0, 12), 16)
    (h >> (b % 48)) & 1L
  }

  private def poissonWd(u: Double): Long = {
    val idx = Bootstrap.poissonCdf1.indexWhere(u < _)
    if (idx < 0) 7L else idx.toLong
  }

  private def d2(x: Double) = JBD.valueOf(x).setScale(2, RoundingMode.HALF_UP)
  private def d6(x: Double) = JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP)

  test("poissonW weights are Poisson(1)-shaped and sum near n") {
    val n = 5000
    val ws = (1 to n).map(i => poissonWd(u24d("pb", 0, i.toString)))
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
          (poissonWd(u24d("pb", b, k.toString)), d2(x))
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

  test("poissonBootstrapMean keeps a group whose replicates all drew zero weight") {
    // a single-row group where every replicate's Poisson draw is 0
    // (P = e^-reps, so findable at reps = 8): the card must still
    // carry the observed mean, with reps_used = 0 and NULL se/ci —
    // never silently dropping the group
    val k = (1 to 200000).find { i =>
      (0 until 8).forall(b => poissonWd(u24d("pb", b, i.toString)) == 0L)
    }.getOrElse(fail("no all-zero key found — derivation changed?"))
    val df = ((1 to 50).map(i => ("big", i.toLong, i.toDouble)) :+
      ("solo", k.toLong, 42.0)).toDF("g", "k", "x")
    val out = Bootstrap.poissonBootstrapMean(df, "g", "k", "x", reps = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    out.keySet shouldBe Set("big", "solo")
    val solo = out("solo")
    solo.getLong(1) shouldBe 1L
    solo.getDouble(2) shouldBe 42.0
    solo.getLong(3) shouldBe 0L
    solo.isNullAt(4) shouldBe true
    solo.isNullAt(5) shouldBe true
    solo.isNullAt(6) shouldBe true
    out("big").getLong(3) should be > 0L
  }

  test("randomizationTest matches the driver-side BigDecimal mirror exactly") {
    val rows = (1 to 150).map { i =>
      ("g", i.toString, if (i % 3 == 0) 1L else 0L, (i % 13 + 1) * 2.0)
    }
    val r = Bootstrap.randomizationTest(
      rows.toDF("g", "k", "arm", "x"), "g", "k", "arm", "x")
      .collect().head
    val n = rows.size
    val n1 = rows.count(_._3 == 1L)
    val sx = rows.map(t => d2(t._4)).reduce(_ add _)
    val sx1 = rows.filter(_._3 == 1L).map(t => d2(t._4)).reduce(_ add _)
    def diff(nb: Long, sb: JBD): Double =
      p6d(sb.doubleValue / nb -
        sx.subtract(sb).doubleValue / (n - nb))
    val dObs = diff(n1.toLong, sx1)
    val reps = (0 until 32).flatMap { b =>
      val lab = rows.map(t => (coinD("rt", b, t._2), d2(t._4)))
      val nb = lab.map(_._1).sum
      if (nb == 0L || nb == n.toLong) None
      else Some(diff(nb, lab.collect { case (1L, x) => x }
        .reduce(_ add _)))
    }
    val nExtreme = reps.count(db => math.abs(db) >= math.abs(dObs))
    r.getAs[Long]("n") shouldBe n.toLong
    r.getAs[Long]("n1") shouldBe n1.toLong
    r.getAs[Double]("d_obs") shouldBe dObs
    r.getAs[Long]("reps_used") shouldBe reps.size.toLong
    r.getAs[Long]("n_extreme") shouldBe nExtreme.toLong
    r.getAs[Double]("p_value") shouldBe
      p6d((nExtreme + 1.0) / (reps.size + 1.0))
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

  test("randomizationTest pivot equals the exploded per-replicate form " +
    "on groups with nulls, negatives, and a >48-rep digest rollover") {
    // mixed fixture: several groups, negative values, a null value, a
    // null arm, a null key, and reps = 50 so replicate 48/49 read the
    // SECOND digest (the b div 48 rollover the pivot must reproduce)
    val rows: Seq[(String, String, java.lang.Long, java.lang.Double)] =
      (1 to 120).map { i =>
        val g = s"g${i % 3}"
        val arm: java.lang.Long = if (i % 5 == 0) null else (i % 2).toLong
        val x: java.lang.Double =
          if (i % 17 == 0) null else (i % 29 - 14) * 1.25
        (g, if (i == 7) null else i.toString, arm, x)
      }
    val df = rows.toDF("g", "k", "arm", "x")
    val fast = Bootstrap.randomizationTest(df, "g", "k", "arm", "x",
      reps = 50).collect().map(r => r.getString(0) -> r).toMap
    // driver reference: the pre-round-15 exploded semantics, replayed
    // per (group, replicate) over BigDecimal sums
    for ((g, grp) <- rows.groupBy(_._1)) {
      val n = grp.size.toLong
      val n1 = grp.flatMap(t => Option(t._3).map(_.toLong)).sum
      val xs = grp.map(t => Option(t._4).map(d => d2(d)))
      val sx = xs.flatten.reduce(_ add _)
      val sx1 = grp.collect {
        case (_, _, a, x) if a != null && x != null =>
          d2(x).multiply(JBD.valueOf(a.toLong))
      }.reduce(_ add _)
      def diff(nb: Long, sb: JBD): Double =
        p6d(sb.doubleValue / nb -
          sx.subtract(sb).doubleValue / (n - nb))
      val dObs = diff(n1, sx1)
      // concat_ws SKIPS a null key, so its digest input is "rt|j"
      // with no trailing separator — the mirror must match that
      def coinN(b: Int, key: String): Long = {
        val s = if (key == null) s"rt|${b / 48}" else s"rt|${b / 48}|$key"
        val h = java.lang.Long.parseLong(md5hex(s).substring(0, 12), 16)
        (h >> (b % 48)) & 1L
      }
      val reps = (0 until 50).flatMap { b =>
        val lab = grp.map(t => (coinN(b, t._2), t._4))
        val nb = lab.map(_._1).sum
        if (nb == 0L || nb == n) None
        else {
          val sb = lab.collect { case (1L, x) if x != null => d2(x) }
            .foldLeft(JBD.ZERO)(_ add _)
          Some(diff(nb, sb))
        }
      }
      val nExtreme = reps.count(db => math.abs(db) >= math.abs(dObs))
      val r = fast(g)
      r.getAs[Long]("n") shouldBe n
      r.getAs[Long]("n1") shouldBe n1
      r.getAs[Double]("d_obs") shouldBe dObs
      r.getAs[Long]("reps_used") shouldBe reps.size.toLong
      r.getAs[Long]("n_extreme") shouldBe nExtreme.toLong
    }
  }

  test("randomizationTest raises on a group whose cents sum could pass 2^53") {
    val df = Seq(("g", "a", 1L, 9.0e13), ("g", "b", 0L, 9.0e13))
      .toDF("g", "k", "arm", "x")
    val e = intercept[Exception] {
      Bootstrap.randomizationTest(df, "g", "k", "arm", "x").collect()
    }
    e.getMessage should include("randomizationTest")
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
