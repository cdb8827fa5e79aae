package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck laws for the operators whose contracts are algebraic —
  * random inputs, invariant assertions, seeded for reproducibility.
  * Ten cases per law keeps the Spark-job cost bounded while still
  * sweeping sizes and shapes no hand-written example covers.
  */
class OperatorLawsSpec extends SparkSpec {


  test("sessionize partitions events: gaps within <= gap, sum of sessions = n") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(1, 40)
      secs <- Gen.listOfN(n, Gen.choose(0L, 20000L))
    } yield secs
    check(Prop.forAll(gen) { secs =>
      val ev = secs.zipWithIndex.map { case (s, i) => (1L, i.toLong, s) }
        .toDF("user_id", "event_id", "sec")
        .withColumn("ts", timestamp_seconds(col("sec")))
      val out = Sessionize.sessions(ev, "user_id", "ts", gapSeconds = 900)
        .collect().map(r => (r.getTimestamp(2).getTime / 1000,
          r.getTimestamp(3).getTime / 1000, r.getLong(4)))
      val sorted = secs.sorted
      // events are partitioned: session sizes sum to n
      val partitioned = out.map(_._3).sum == secs.length
      // session boundaries: consecutive sessions separated by > gap
      val bounds = out.sortBy(_._1)
      val separated = bounds.zip(bounds.drop(1)).forall {
        case ((_, e1, _), (s2, _, _)) => s2 - e1 > 900
      }
      // every session's span is covered by events with gaps <= gap
      val dense = bounds.forall { case (s, e, _) =>
        val inSess = sorted.filter(t => t >= s && t <= e)
        inSess.zip(inSess.drop(1)).forall { case (a, b) => b - a <= 900 }
      }
      partitioned && separated && dense
    })
  }

  test("dedupParagraphs: output paragraphs are globally distinct and kept counts add up") {
    val implicits = spark.implicits; import implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon")
    val para = Gen.listOfN(2, word).map(_.mkString(" "))
    val doc = Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, para).map(_.mkString("\n")))
    val gen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, doc))
    check(Prop.forAll(gen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.dedupParagraphs(docs, "text", "doc_id", sep = "\n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val outParas = out.flatMap(_._2.split("\n"))
      val inDistinct = texts.flatMap(_.split("\n")).filter(_.trim.nonEmpty).distinct
      // every distinct input paragraph survives exactly once, globally
      outParas.sorted.toSeq == inDistinct.sorted &&
        // and per-doc counts match the reassembled text
        out.forall { case (_, t, k) => t.split("\n").length.toLong == k }
    })
  }

  test("keySkew: gini in [0, 10000), zero iff uniform, totals conserved") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      nKeys <- Gen.choose(1, 12)
      counts <- Gen.listOfN(nKeys, Gen.choose(1, 9))
    } yield counts
    check(Prop.forAll(gen) { counts =>
      val rows = counts.zipWithIndex.flatMap { case (c, k) =>
        Seq.fill(c)(("g", s"k$k"))
      }
      val r = Profile.keySkew(rows.toDF("grp", "key"), "key", "grp").head()
      val (nk, nr, mx, gini) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      nk == counts.length && nr == counts.sum && mx == counts.max &&
        gini >= 0L && gini < 10000L &&
        ((counts.distinct.length == 1) == (gini == 0L))
    })
  }

  test("ksByGroup: bounded bp, zero for the whole-corpus group, symmetric split bound") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(2, 30)
      vals <- Gen.listOfN(n, Gen.choose(0L, 6L))
      cut <- Gen.choose(1, n - 1)
    } yield (vals, cut)
    check(Prop.forAll(gen) { case (vals, cut) =>
      val rows = vals.zipWithIndex.map { case (v, i) =>
        (if (i < cut) "a" else "b", v)
      }
      val out = Profile.ksByGroup(rows.toDF("grp", "v"), "v", "grp")
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val bounded = out.values.forall(k => k >= 0L && k <= 10000L)
      val whole = Profile.ksByGroup(
        vals.map(("w", _)).toDF("grp", "v"), "v", "grp").head().getLong(2)
      bounded && whole == 0L
    })
  }

  test("autocorr1 stays in [-1, 1] and is exactly 0 for constant series") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(2, 25)
      ys <- Gen.listOfN(n, Gen.choose(0L, 50L))
    } yield ys
    check(Prop.forAll(gen) { ys =>
      val rows = ys.zipWithIndex.map { case (y, x) => ("s", x.toLong, y) } ++
        ys.indices.map(x => ("const", x.toLong, 7L))
      val out = Resample.autocorr1(rows.toDF("g", "x", "y"), "g", "x", "y")
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      out("s") >= -1.0 - 1e-9 && out("s") <= 1.0 + 1e-9 && out("const") == 0.0
    })
  }

  test("freqSpectrum conserves types and token mass per group") {
    val implicits = spark.implicits; import implicits._
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val doc = Gen.choose(1, 10).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val gen = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, doc))
    check(Prop.forAll(gen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s") }
        .toDF("doc_id", "text", "source")
      val out = TfIdf.freqSpectrum(docs, "text", "source")
        .collect().map(r => (r.getLong(2), r.getLong(3)))
      val toks = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      out.map(_._1).sum == toks.distinct.length.toLong &&
        out.map(_._2).sum == toks.length.toLong
    })
  }

  test("kcore at the fixpoint: all surviving degrees >= k, never grows") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(4, 20)
      m <- Gen.choose(3, 30)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    check(Prop.forAll(gen) { edges =>
      edges.isEmpty || {
        val df = edges.toDF("id_a", "id_b")
        // enough rounds to guarantee convergence on <= 20 nodes
        val out = KCore.kcore(df, "id_a", "id_b", k = 2, rounds = 20)
          .collect().map(r => r.getLong(0) -> r.getLong(1))
        val nodes = out.map(_._1).toSet
        out.forall(_._2 >= 2L) &&
          // closed: every surviving node's surviving-neighbor count IS its deg
          out.forall { case (v, deg) =>
            edges.count { case (a, b) =>
              (a == v && nodes(b)) || (b == v && nodes(a))
            }.toLong == deg
          }
      }
    })
  }

  test("shuffleRank is a contiguous permutation for arbitrary sizes and widths") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(1, 400)
      p <- Gen.choose(1, 4)
    } yield (n, p)
    check(Prop.forAll(gen) { case (n, p) =>
      val df = (0L until n.toLong).map(i => (i, i)).toDF("id", "v")
      val ranks = Sampling.shuffleRank(df, "id", hexPrefix = p)
        .select("shuffle_rank").collect().map(_.getLong(0)).sorted
      ranks.toSeq == (0L until n.toLong)
    })
  }

  test("kAnonymity histogram conserves rows and is permutation-invariant") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(1, 60)
      qs <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 4), Gen.oneOf("x", "y")))
    } yield qs
    check(Prop.forAll(gen) { qs =>
      val df = qs.toDF("q1", "q2")
      val out = Audit.kAnonymity(df, Seq("q1", "q2"), k = 3L).collect()
      val conserved = out.map(_.getLong(2)).sum == qs.length
      val flags = out.forall(r => r.getBoolean(3) == (r.getLong(0) < 3L))
      val shuffled = Audit.kAnonymity(
        scala.util.Random.javaRandomToRandom(new java.util.Random(7))
          .shuffle(qs).toDF("q1", "q2"), Seq("q1", "q2"), k = 3L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      conserved && flags &&
        shuffled == out.map(r => (r.getLong(0), r.getLong(1))).toSet
    })
  }

  test("tCloseness: tv in [0,1]; a single class always matches the global distribution") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 3)))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("q", "sv")
      val out = Audit.tCloseness(df, Seq("q"), "sv", maxTv = 0.5).collect()
      val bounded = out.forall { r =>
        val tv = r.getDouble(2); tv >= 0.0 && tv <= 1.0 + 1e-6
      }
      val one = Audit.tCloseness(
        rows.map { case (_, s) => ("only", s) }.toDF("q", "sv"),
        Seq("q"), "sv", maxTv = 0.5).collect()
      bounded && one.length == 1 && one.head.getDouble(2) == 0.0
    })
  }

  test("basket pair supports: n_ab <= min(n_a, n_b) and lift_bp is the exact floor") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(2, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 8L), Gen.choose(1L, 6L)))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("basket", "item")
      val nb = rows.map(_._1).distinct.length.toLong
      Basket.pairAffinity(df, "basket", "item", minPairs = 1L)
        .collect().forall { r =>
          val (ab, na, nbi, lift) =
            (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
          ab <= math.min(na, nbi) && lift == ab * nb * 10000L / (na * nbi)
        }
    })
  }

  test("weightedRanks with uniform weights equals unweighted ranks on random graphs") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      m <- Gen.choose(1, 15)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(1L, 8L), Gen.choose(1L, 8L)))
    } yield es.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    check(Prop.forAll(gen) { es =>
      es.isEmpty || {
        val p = es.toDF("id_a", "id_b")
        val unw = PageRank.ranks(p, iterations = 2)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        val w = PageRank.weightedRanks(p.withColumn("w", lit(1L)),
            iterations = 2)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        w == unw
      }
    })
  }

  test("rankAuc is invariant under monotone transforms and ~antisymmetric under label flip") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(4, 40)
      rows <- Gen.listOfN(n,
        Gen.zip(Gen.choose(0, 50), Gen.oneOf(0L, 1L)))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val hasBoth = rows.exists(_._2 == 1L) && rows.exists(_._2 == 0L)
      !hasBoth || {
        val df = rows.map { case (s, l) => (s.toDouble, l) }.toDF("s", "lab")
        def auc(d: org.apache.spark.sql.DataFrame) =
          Metrics.rankAuc(d, "s", "lab", 8.0).collect().head.getDouble(2)
        val base = auc(df)
        // rank-preserving transform: same AUC to the bit
        val mono = auc(df.withColumn("s", col("s") * 3.0 + 7.0))
        // flipped labels: AUC mirrors (up to the 6-place rounding of
        // the two complementary ratios)
        val flip = auc(df.withColumn("lab", lit(1L) - col("lab")))
        mono == base && math.abs(flip - (1.0 - base)) <= 1e-6
      }
    })
  }

  test("theilSen is shift-invariant and scale-equivariant in y") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(2, 12)
      ys <- Gen.listOfN(n, Gen.choose(-20L, 20L))
    } yield ys
    check(Prop.forAll(gen) { ys =>
      val s = ys.zipWithIndex.map { case (y, x) => ("g", x.toLong, y) }
        .toDF("g", "x", "y")
      def slope(d: org.apache.spark.sql.DataFrame) =
        Resample.theilSen(d, "g", "x", "y").collect().head.getDouble(2)
      val base = slope(s)
      val shifted = slope(s.withColumn("y", col("y") + 100L))
      val scaled = slope(s.withColumn("y", col("y") * 4L))
      shifted == base && math.abs(scaled - 4.0 * base) <= 4e-6
    })
  }

  test("decayedScores is exactly invariant under a whole-stream time shift") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(1, 25)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L),
        Gen.choose(0L, 20L), Gen.choose(1, 1000)))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      def scores(shiftDays: Long) = {
        val df = rows.map { case (u, d, v) => (u, d + shiftDays, v / 10.0) }
          .toDF("u", "d", "v")
          .withColumn("ts", timestamp_micros(col("d") * 86400000000L))
        Resample.decayedScores(df, "u", "ts", "v", halfLifeDays = 3.0)
          .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      }
      scores(0L) == scores(365L)
    })
  }

  test("markov transition counts conserve sequence length minus one per group") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      g1 <- Gen.choose(1, 15)
      g2 <- Gen.choose(1, 15)
      t1 <- Gen.listOfN(g1, Gen.oneOf("a", "b", "c"))
      t2 <- Gen.listOfN(g2, Gen.oneOf("a", "b", "c"))
    } yield (t1, t2)
    check(Prop.forAll(gen) { case (t1, t2) =>
      val rows = t1.zipWithIndex.map { case (t, i) => ("g1", i.toLong, t) } ++
        t2.zipWithIndex.map { case (t, i) => ("g2", i.toLong, t) }
      val out = Markov.transitions(rows.toDF("g", "o", "t"),
        Seq("g"), Seq("o"), "t").collect()
      out.map(_.getLong(2)).sum == (t1.length - 1) + (t2.length - 1) &&
        out.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 10000L)
    })
  }

  test("rollingActives at window 1 equals plain daily distinct actives") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 10L)))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("u", "d")
        .withColumn("ts", timestamp_micros(col("d") * 86400000000L))
      val w1 = Cohorts.rollingActives(df, "u", "ts", window = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val daily = rows.distinct.groupBy(_._2).view
        .mapValues(_.map(_._1).distinct.size.toLong).toMap
      w1 == daily
    })
  }

  test("trailingDeviation is identically zero on constant series") {
    val implicits = spark.implicits; import implicits._
    val gen = Gen.zip(Gen.choose(3, 30), Gen.choose(1L, 500L))
    check(Prop.forAll(gen) { case (n, v) =>
      val s = (0 until n).map(d => ("g", d.toLong, v)).toDF("g", "d", "v")
      val out = Resample.trailingDeviation(s, "g", "d", "v", window = 2)
        .collect()
      out.length == math.max(n - 2, 0) && out.forall(_.getLong(4) == 0L)
    })
  }

  test("mutualInfo and chiSquare are symmetric in their arguments") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(2, 30)
      rows <- Gen.listOfN(n,
        Gen.zip(Gen.oneOf("x", "y", "z"), Gen.oneOf("u", "v")))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("a", "b")
      val m1 = Profile.mutualInfo(df, "a", "b").collect().head
      val m2 = Profile.mutualInfo(df, "b", "a").collect().head
      val c1 = Profile.chiSquare(df, "a", "b").collect().head.getDouble(5)
      val c2 = Profile.chiSquare(df, "b", "a").collect().head.getDouble(5)
      m1.getDouble(2) == m2.getDouble(2) && // MI symmetric
        m1.getDouble(3) == m2.getDouble(4) && // H(a) swaps to H(b)
        c1 == c2
    })
  }

  test("gini: in [0, 10000), 0 iff uniform, scale- and bucket-invariant") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(1, 15)
      vals <- Gen.listOfN(n, Gen.choose(0L, 200L))
      scale <- Gen.choose(1L, 7L)
    } yield (vals, scale)
    check(Prop.forAll(gen) { case (vals, scale) =>
      def run(vs: Seq[Long], bw: Long) = Pareto.gini(
        vs.zipWithIndex.map { case (v, i) => ("g", i.toLong, v.toDouble) }
          .toDF("g", "k", "v"), "g", "k", "v", bucketWidthCents = bw)
        .collect().map(_.getLong(2)).headOption
      val base = run(vals, 1L << 20)
      if (vals.sum == 0L) base.isEmpty
      else {
        val g = base.get
        val uniform = vals.distinct.length == 1
        g >= 0L && g < 10000L && (g == 0L) == uniform &&
          // scaling every value by a constant changes nothing
          run(vals.map(_ * scale), 1L << 20).get == g &&
          // the bucketed rank is bucket-width-independent
          run(vals, 50L).get == g
      }
    })
  }

  test("crossCorr(x,y) at lag l equals crossCorr(y,x) at -l") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(3, 20)
      xs <- Gen.listOfN(n, Gen.choose(0L, 50L))
      ys <- Gen.listOfN(n, Gen.choose(0L, 50L))
    } yield (xs, ys)
    check(Prop.forAll(gen) { case (xs, ys) =>
      val xdf = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("d", "x")
      val ydf = ys.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("d", "y")
      val ab = Resample.crossCorr(xdf, ydf, "d", "x", "y", maxLag = 3)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val ba = Resample.crossCorr(ydf, xdf, "d", "y", "x", maxLag = 3)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      ab.keySet == ba.keySet.map(-_) &&
        ab.forall { case (l, r) => r == ba(-l) }
    })
  }

  test("twoProportionZ: swapping arms negates z, significance unchanged") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      na <- Gen.choose(1, 40); ka <- Gen.choose(0, na)
      nb <- Gen.choose(1, 40); kb <- Gen.choose(0, nb)
    } yield (na, ka, nb, kb)
    check(Prop.forAll(gen) { case (na, ka, nb, kb) =>
      def rows(swap: Boolean) =
        ((1 to na).map(i => ("t", if (swap) 1L else 0L,
          if (i <= ka) 1L else 0L)) ++
          (1 to nb).map(i => ("t", if (swap) 0L else 1L,
            if (i <= kb) 1L else 0L))).toDF("t", "arm", "ok")
      def run(swap: Boolean) = Metrics.twoProportionZ(rows(swap),
        "t", "arm", "ok").collect().head
      val f = run(false); val s = run(true)
      f.getDouble(5) == -s.getDouble(5) &&
        f.getBoolean(6) == s.getBoolean(6)
    })
  }

  test("dispersionIndex: nonnegative, 0 iff constant across ALL periods") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      m <- Gen.choose(1, 8)
      counts <- Gen.listOfN(m, Gen.choose(1, 6))
    } yield counts
    check(Prop.forAll(gen) { counts =>
      val rows = counts.zipWithIndex.flatMap { case (c, p) =>
        (1 to c).map(_ => ("k", p.toLong)) }.toDF("k", "p")
      val f = Profile.dispersionIndex(rows, "k", "p").collect()
        .head.getLong(3)
      val uniform = counts.distinct.length == 1
      f >= 0L && (f == 0L) == uniform
    })
  }

  test("revenueBridge: the waterfall identity reconciles every period") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(1, 25)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L),
        Gen.choose(1L, 5L), Gen.choose(0L, 50L)))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val df = rows.map { case (k, p, v) => (s"u$k", p, v.toDouble) }
        .toDF("k", "p", "v")
      val out = Cohorts.revenueBridge(df, "k", "p", "v").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      val totals = rows.groupBy(_._2)
        .view.mapValues(_.map(_._3 * 100).sum).toMap
      out.forall { case (p, (nw, ex, con, chn)) =>
        totals.getOrElse(p, 0L) - totals.getOrElse(p - 1L, 0L) ==
          nw - chn + ex - con
      }
    })
  }

  test("concurrency: counts nonnegative, close at 0, bucket-width invariant") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(1, 20)
      ivs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 40L),
        Gen.choose(1L, 15L)))
    } yield ivs.map { case (s, len) => (s, s + len) }
    check(Prop.forAll(gen) { ivs =>
      val df = ivs.toDF("s", "e")
      val out = Resample.concurrency(df, "s", "e").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      out.forall(_._2 >= 0L) && out.last._2 == 0L &&
        Resample.concurrency(df, "s", "e", bucketWidth = 3L).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
          .sameElements(out)
    })
  }

  test("proximatePairs equals the brute-force quadratic reference") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(1, 25)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 3L),
        Gen.choose(0L, 30L)))
    } yield rows.zipWithIndex.map { case ((c, d), i) => (i.toLong, c, d) }
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("id", "cell", "day")
      val out = FuzzyJoin.proximatePairs(df, Seq("cell"), "id", "day",
          window = 4L)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      val brute = (for {
        a <- rows; b <- rows
        if a._2 == b._2 && a._1 < b._1 && math.abs(a._3 - b._3) <= 4L
      } yield (a._1, b._1)).toSet
      out == brute
    })
  }

  test("woeIv: total information value is nonnegative") {
    val implicits = spark.implicits; import implicits._
    val gen = for {
      n <- Gen.choose(2, 40)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.oneOf(0L, 1L)))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val out = Metrics.woeIv(rows.toDF("bin", "y"), "bin", "y")
        .collect().map(_.getDouble(4))
      out.forall(_ >= -1e-12)
    })
  }
}
