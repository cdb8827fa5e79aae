package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val ids = spark.range(10000).select(col("id"))

  test("sample is deterministic and approximately the requested fraction") {
    val s1 = Sampling.deterministicSample(ids, "id", 25)
    val s2 = Sampling.deterministicSample(ids, "id", 25)
    s1.exceptAll(s2).count() shouldBe 0
    s1.count().toDouble shouldBe (2500.0 +- 200.0)
  }

  test("growing the dataset never moves existing rows across splits") {
    val small = Sampling.datasetSplit(spark.range(1000).toDF("id"), "id")
    val big = Sampling.datasetSplit(spark.range(5000).toDF("id"), "id")
    small.join(big.withColumnRenamed("split", "split2"), "id")
      .filter(col("split") =!= col("split2")).count() shouldBe 0
  }

  test("splits partition the data with expected proportions") {
    val out = Sampling.datasetSplit(ids, "id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.values.sum shouldBe 10000
    out("train").toDouble shouldBe (8000.0 +- 400.0)
    out("val").toDouble shouldBe (1000.0 +- 150.0)
    out("test").toDouble shouldBe (1000.0 +- 150.0)
  }

  test("mixturePlan: binding source keeps 100%, others scale, unlisted drop") {
    import spark.implicits._
    // A: 100 tokens, B: 300, C: 50 (not in recipe)
    // recipe A:B = 3:1 -> targets .75/.25; shares (of 450): A=2/9, B=6/9, C=1/9
    // scale = min(share/target) = min((2/9)/.75, (6/9)/.25) = 8/27
    // keep A = .75*(8/27)/(2/9) = 1.0 (binding); keep B = .25*(8/27)/(6/9) = 1/9
    val df = Seq(("A", 100L), ("B", 300L), ("C", 50L)).toDF("src", "n")
    val out = Sampling.mixturePlan(df, "src", col("n"), Map("A" -> 3.0, "B" -> 1.0))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4)))).toMap
    out("A") shouldBe ((100L, 0.75, 1.0))
    out("B")._2 shouldBe 0.25
    out("B")._3 shouldBe (1.0 / 9) +- 1e-12
    out("C") shouldBe ((50L, 0.0, 0.0))
    // achieved mix check: kept tokens follow the 3:1 recipe
    val keptA = 100L * out("A")._3; val keptB = 300L * out("B")._3
    keptA / keptB shouldBe 3.0 +- 1e-9
  }

  test("mixturePlan rejects empty and non-positive recipes") {
    import spark.implicits._
    val df = Seq(("A", 1L)).toDF("src", "n")
    an[IllegalArgumentException] should be thrownBy
      Sampling.mixturePlan(df, "src", col("n"), Map.empty)
    an[IllegalArgumentException] should be thrownBy
      Sampling.mixturePlan(df, "src", col("n"), Map("A" -> 0.0))
  }

  test("temperatureMixture: tau=1 proportional, tau=2 flattens, tau=inf-ish uniform") {
    import spark.implicits._
    // A: 900 tokens, B: 100 -> tau=1 shares .9/.1; tau=2 shares 3:1
    val df = Seq(("A", 900L), ("B", 100L)).toDF("src", "n")
    def mix(tau: Double) =
      Sampling.temperatureMixture(df, "src", col("n"), tau)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val t1 = mix(1.0)
    t1("A")._2 shouldBe 0.9 +- 1e-12
    t1("B")._2 shouldBe 0.1 +- 1e-12
    // proportional sampling duplicates nothing: every epochs factor = 1
    t1("A")._3 shouldBe 1.0 +- 1e-12
    t1("B")._3 shouldBe 1.0 +- 1e-12
    val t2 = mix(2.0)
    t2("A")._2 shouldBe 0.75 +- 1e-12 // sqrt(900):sqrt(100) = 3:1
    t2("B")._2 shouldBe 0.25 +- 1e-12
    // flattening up-samples the small source, down-samples the big one
    t2("B")._3 shouldBe 2.5 +- 1e-12  // .25 * 1000 / 100
    t2("A")._3 shouldBe (0.75 * 1000 / 900) +- 1e-12
    val t100 = mix(100.0)
    t100("A")._2 shouldBe 0.5 +- 1e-2 // near-uniform
    // probabilities always sum to 1
    Seq(t1, t2, t100).foreach(m => m.values.map(_._2).sum shouldBe 1.0 +- 1e-12)
    an[IllegalArgumentException] should be thrownBy
      Sampling.temperatureMixture(df, "src", col("n"), 0.5)
  }

  test("leakage-safe split keeps every near-dup candidate pair in ONE split") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val splits = graft.SparkEntry.queries("q116_leakage_safe_splits")(spark, dir)
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id")
    pairs.count() should be > 0L // the planted near-dups produce edges
    val a = splits.select(col("doc_id").as("id_a"), col("split").as("split_a"))
    val b = splits.select(col("doc_id").as("id_b"), col("split").as("split_b"))
    // the invariant the operator exists for: no candidate edge straddles
    pairs.join(a, "id_a").join(b, "id_b")
      .filter(col("split_a") =!= col("split_b"))
      .count() shouldBe 0L
    // and the naive per-doc split DOES straddle on this corpus — the
    // guard is not vacuous
    val naive = Sampling.datasetSplit(docs.select("doc_id"), "doc_id")
    val na = naive.select(col("doc_id").as("id_a"), col("split").as("split_a"))
    val nb = naive.select(col("doc_id").as("id_b"), col("split").as("split_b"))
    pairs.join(na, "id_a").join(nb, "id_b")
      .filter(col("split_a") =!= col("split_b"))
      .count() should be > 0L
  }

  test("epochShards: every epoch covers all rows, orders differ across epochs") {
    import spark.implicits._
    val d = (1L to 200L).toDF("doc_id")
    val out = Sampling.epochShards(d, "doc_id", epochs = 2, shards = 8)
    out.count() shouldBe 400L
    // per-epoch: every doc exactly once, all shards populated
    val perEpoch = out.groupBy("epoch")
      .agg(countDistinct(col("doc_id")).as("docs"),
        countDistinct(col("shard")).as("shards"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    perEpoch(0L) shouldBe ((200L, 8L))
    perEpoch(1L) shouldBe ((200L, 8L))
    // the epochs are genuinely different plans: some doc changes shard
    val e0 = out.filter(col("epoch") === 0).select(col("doc_id"), col("shard").as("s0"))
    val e1 = out.filter(col("epoch") === 1).select(col("doc_id"), col("shard").as("s1"))
    e0.join(e1, "doc_id").filter(col("s0") =!= col("s1")).count() should be > 0L
    // and deterministic: same inputs, same assignments
    val again = Sampling.epochShards(d, "doc_id", epochs = 2, shards = 8)
    again.exceptAll(out).count() shouldBe 0L
  }

  test("ppsSample matches an independent hash-order crossing recurrence") {
    val implicits = spark.implicits; import implicits._
    val rows = (1L to 50L).map(i => (i, (i * 7 % 23 + 1)))
    val df = rows.toDF("doc_id", "w")
    val n = 10L
    val out = Sampling.ppsSample(df, "doc_id", "w", n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // independent replication: md5("pps|<key>") order, integer stride
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ordered = rows.sortBy { case (k, _) => (md5hex(s"pps|$k"), k) }
    val total = rows.map(_._2).sum
    val stride = total / n
    var cum = 0L
    val want = ordered.flatMap { case (k, w) =>
      val before = cum / stride; cum += w
      val hits = cum / stride - before
      if (hits >= 1) Some(k -> ((w, hits))) else None
    }.toMap
    out shouldBe want
    out.values.map(_._2).sum shouldBe total / stride // all crossings land
  }

  test("ppsSample: weight >= stride is always selected; hexPrefix-invariant") {
    val implicits = spark.implicits; import implicits._
    // one whale (w=1000) among 100 ants (w=1): stride = 1100/10 = 110,
    // the whale crosses >= 9 boundaries and MUST be in every sample
    val df = ((1L to 100L).map(i => (i, 1L)) :+ (999L, 1000L))
      .toDF("doc_id", "w")
    val out = Sampling.ppsSample(df, "doc_id", "w", n = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    out(999L) should be >= 9L
    // prefix width only changes the bucketing, never the hash order
    val p1 = Sampling.ppsSample(df, "doc_id", "w", 10L, hexPrefix = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val p3 = Sampling.ppsSample(df, "doc_id", "w", 10L, hexPrefix = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    p1 shouldBe p3
    // zero/negative/null weights are dropped, not boundary-welded
    val dirty = Seq((1L, Option(5L)), (2L, Option(0L)), (3L, Option(-2L)),
      (4L, Option.empty[Long])).toDF("doc_id", "w")
    Sampling.ppsSample(dirty, "doc_id", "w", n = 5L)
      .collect().map(_.getLong(0)).toSet shouldBe Set(1L)
  }

  // reference Efraimidis–Spirakis score replicated outside Spark
  private def esScore(key: Long, w: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"wrs|$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 12), 16)
    math.log((h.toDouble + 1.0) / 281474976710656.0) / w.toDouble
  }

  test("weightedSample picks exactly the reference top-n, no repeats") {
    import spark.implicits._
    val rows = (1L to 40L).map(k => (k, (k % 7) + 1L))
    val df = rows.toDF("k", "w")
    val expect = rows.sortBy { case (k, w) => (-esScore(k, w), k) }
      .take(10).map(_._1)
    val got = Sampling.weightedSample(df, "k", "w", n = 10)
      .collect().map(_.getLong(0))
    got.sorted.toSeq shouldBe expect.sorted.toSeq
    got.distinct.length shouldBe 10
  }

  test("negativeSamples rejects user positives and replays deterministically") {
    import spark.implicits._
    val pos = Seq((1L, 1L), (1L, 2L), (2L, 1L)).toDF("u", "i")
    val items = Seq(1L, 2L, 3L, 4L).toDF("item")
    val out = Sampling.negativeSamples(pos, "u", "i", items, "item", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every sampled negative is in the id space and NOT a positive of
    // that user
    all(out.map(_._2)) should (be >= 1L and be <= 4L)
    out.foreach { case (u, ni, _) =>
      withClue(s"user $u drew own positive $ni: ") {
        Set((1L, 1L), (1L, 2L), (2L, 1L)) should not contain ((u, ni))
      }
    }
    // at most k draws per positive, exact replay across invocations
    out.length should be <= 3 * 3
    val again = Sampling.negativeSamples(pos, "u", "i", items, "item", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    again.sorted.toSeq shouldBe out.sorted.toSeq
    an[IllegalArgumentException] should be thrownBy
      Sampling.negativeSamples(pos, "u", "i", items, "item", k = 0)
  }

  test("weightedSample is monotone in weight and drops non-positive weights") {
    import spark.implicits._
    val base = (1L to 20L).map(k => (k, 2L))
    val in10 = Sampling.weightedSample(base.toDF("k", "w"), "k", "w", 10)
      .collect().map(_.getLong(0)).toSet
    val loser = (1L to 20L).find(!in10.contains(_)).get
    // boost the loser's weight far above the field: it must enter
    val boosted = base.map { case (k, w) => (k, if (k == loser) 1000L else w) }
    val in10b = Sampling.weightedSample(boosted.toDF("k", "w"), "k", "w", 10)
      .collect().map(_.getLong(0)).toSet
    in10b should contain(loser)
    val dirty = Seq((1L, Option(5L)), (2L, Option(0L)),
      (3L, Option.empty[Long])).toDF("k", "w")
    Sampling.weightedSample(dirty, "k", "w", 5)
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
  }

  test("effectiveSampleSize: n on equal weights, collapses on a whale") {
    val implicits = spark.implicits
    import implicits._
    import graft.functions.Rounding.p6d
    val rows = Seq(("eq", 10L), ("eq", 10L), ("eq", 10L),
      ("wh", 1000L), ("wh", 1L), ("wh", 1L),
      ("dirty", 5L), ("dirty", -1L), ("dirty", 0L))
    val out = Sampling.effectiveSampleSize(rows.toDF("g", "w"), "g", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    out("eq") shouldBe ((3L, 3.0, 1000000L))
    val essW = 1002.0 * 1002.0 / 1000002.0
    out("wh") shouldBe ((3L, p6d(essW),
      math.floor(essW / 3.0 * 1000000 + 0.5).toLong))
    out("dirty") shouldBe ((1L, 1.0, 1000000L))
  }

  test("neymanAllocation sends the budget to big-and-volatile strata") {
    val implicits = spark.implicits
    import implicits._
    // A: n=2 sd=5 -> w=10; B: constant -> w=0; C: n=2 sd=10 -> w=20
    val rows = Seq(("G", "A", 0.0), ("G", "A", 10.0),
      ("G", "B", 7.0), ("G", "B", 7.0), ("G", "B", 7.0),
      ("G", "C", 0.0), ("G", "C", 20.0))
    val out = Sampling.neymanAllocation(rows.toDF("g", "st", "v"),
        "g", "st", "v", totalN = 100L)
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap
    out("A") shouldBe ((2L, 5.0, 333333L, 33L))
    out("B") shouldBe ((3L, 0.0, 0L, 0L))
    out("C") shouldBe ((2L, 10.0, 666667L, 67L))
    // an all-constant group cannot allocate: NULL, not a crash
    val flat = Seq(("F", "A", 3.0), ("F", "A", 3.0))
    val rf = Sampling.neymanAllocation(flat.toDF("g", "st", "v"),
      "g", "st", "v", 10L).collect().head
    assert(rf.isNullAt(4) && rf.isNullAt(5))
    an[IllegalArgumentException] should be thrownBy
      Sampling.neymanAllocation(flat.toDF("g", "st", "v"), "g", "st",
        "v", 0L)
  }
}
