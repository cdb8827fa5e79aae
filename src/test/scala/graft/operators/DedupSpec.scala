package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
  }

  test("exactClusters groups case-insensitive duplicates, keeps min id") {
    val d = docs(1L -> "Hello World", 2L -> "hello world", 3L -> "other")
    val out = Dedup.exactClusters(d, "text", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._2)
    out shouldBe Array((2L, 1L), (1L, 3L)) // (n_docs, keep_id)
  }

  test("dropExactDups keeps exactly one row per content, the min id") {
    val d = docs(1L -> "a b", 2L -> "A B", 3L -> "c")
    val out = Dedup.dropExactDups(d, "text", "doc_id").collect().map(_.getLong(0)).sorted
    out shouldBe Array(1L, 3L)
  }

  test("keepFirst is deterministic under explicit priority") {
    val d = docs(5L -> "k1", 3L -> "k1", 9L -> "k2")
    val out = Dedup.keepFirst(d, Seq("text"), Seq(col("doc_id").asc))
      .collect().map(_.getLong(0)).sorted
    out shouldBe Array(3L, 9L)
  }

  test("minhashCandidates surfaces a planted near-duplicate pair") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = base + " ok" // one extra token -> most shingles shared
    val other = "completely unrelated text about databases and distributed systems design"
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Dedup.minhashCandidates(d, "text", "doc_id", bands = 3, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((1L, 2L))
    pairs should not contain ((1L, 3L))
  }

  test("ngramJaccard: identical docs = 1.0, planted pair high, bounded") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val d = docs(1L -> base, 2L -> base, 3L -> (base + " extra"))
    val cand = Dedup.minhashCandidates(d, "text", "doc_id", bands = 3, rowsPerBand = 2)
    val out = Dedup.ngramJaccard(d, "text", "doc_id", cand)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    out((1L, 2L)) shouldBe 1.0
    all(out.values) should (be >= 0.0 and be <= 1.0)
  }

  test("prefixFilterPairs is exact-complete: finds ALL pairs at Jaccard >= t") {
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "the quick brown fox leaps over a lazy dog",
      4L -> "completely unrelated text about database systems",
      5L -> "unrelated text about distributed database systems",
      6L -> "the quick brown fox jumps over the lazy dog")
    val d = docs(texts: _*)
    val t = 0.5
    val got = Dedup.prefixFilterPairs(d, "text", "doc_id", minJaccard = t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force truth over distinct lowercase word sets
    def toks(s: String) = s.toLowerCase.split("\\s+").toSet
    val want = (for {
      (ia, ta) <- texts; (ib, tb) <- texts if ia < ib
      sa = toks(ta); sb = toks(tb)
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= t
    } yield (ia, ib)).toSet
    got shouldBe want
    want should contain((1L, 6L)) // sanity: the planted exact dup is in truth
  }

  test("prefixFilterPairs over 3-shingles is exact-complete vs brute force") {
    val texts = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta",
      2L -> "alpha beta gamma delta epsilon zeta theta", // shares 4 of ~5 shingles
      3L -> "alpha beta gamma other words here now",
      4L -> "totally different text with no overlap at all",
      5L -> "alpha beta gamma delta epsilon zeta eta") // exact dup of 1
    val d = docs(texts: _*)
    val t = 0.5
    val got = Dedup.prefixFilterPairs(d, "text", "doc_id",
        minJaccard = t, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def shingles(s: String) =
      s.toLowerCase.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val want = (for {
      (ia, ta) <- texts; (ib, tb) <- texts if ia < ib
      sa = shingles(ta); sb = shingles(tb)
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= t
    } yield (ia, ib)).toSet
    got shouldBe want
    want should contain((1L, 5L)) // sanity: the exact dup is in truth
    want should contain((1L, 2L))
  }

  test("prefixFilterPairs refuses an adversarial near-identical corpus loudly") {
    // 40 near-identical docs: every doc shares its RARE units with all
    // others, so the true >= t output is quadratic (40*39/2 = 780
    // pairs) — posting sparsity cannot hold and the candidate bound
    // pre-estimate must trip instead of running quadratic silently
    val texts = (1L to 40L).map(i =>
      i -> s"shared boilerplate sentence repeated across documents number $i")
    val d = docs(texts: _*)
    val e = intercept[IllegalStateException] {
      Dedup.prefixFilterPairs(d, "text", "doc_id", minJaccard = 0.5,
        maxCandidates = 100L)
    }
    e.getMessage should include("maxCandidates=100")
    e.getMessage should include("raise maxCandidates")
    // raising the cap opts in and the result is still exact-complete
    val got = Dedup.prefixFilterPairs(d, "text", "doc_id", minJaccard = 0.5,
        maxCandidates = 10000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def toks(s: String) = s.toLowerCase.split("\\s+").toSet
    val want = (for {
      (ia, ta) <- texts; (ib, tb) <- texts if ia < ib
      sa = toks(ta); sb = toks(tb)
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.5
    } yield (ia, ib)).toSet
    got shouldBe want
    want.size shouldBe 780 // the quadratic truth the guard warned about
  }

  test("winnowedPairs links docs sharing a long substring, drops boilerplate") {
    val plagiarized = "the stolen paragraph verbatim copied entirely here"
    val d = docs(
      1L -> s"intro alpha $plagiarized outro one",
      2L -> s"different beginning $plagiarized other ending",
      3L -> "completely unrelated text with nothing in common at all")
    val out = Dedup.winnowedPairs(d, "text", "doc_id",
        k = 8, w = 4, minShared = 2, maxDf = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    out.keySet should contain((1L, 2L))
    out((1L, 2L)) should be >= 2L
    out.keySet should not contain ((1L, 3L))
    out.keySet should not contain ((2L, 3L))
    // the tightest legal cap still keeps 2-doc buckets -> pair survives
    Dedup.winnowedPairs(d, "text", "doc_id", k = 8, w = 4,
      minShared = 1, maxDf = 2).count() should be >= 1L
  }

  test("simhashPairs finds identical docs at hamming 0") {
    val d = docs(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta", 3L -> "unrelated words entirely different")
    val out = Dedup.simhashPairs(d, "text", "doc_id", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    out((1L, 2L)) shouldBe 0
  }

  test("simhashSignatures64 bands are 16-bit and stable for equal docs") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "alpha beta gamma", 3L -> "x y z")
    val rows = Dedup.simhashSignatures64(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
    rows(1L) shouldBe rows(2L)
    rows.values.flatten.foreach { s => s should (be >= 0L and be <= 65535L) }
  }

  test("simhashPairs rejects maxHamming >= band count") {
    val d = docs(1L -> "a b c")
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(d, "text", "doc_id", maxHamming = 4)
    }
  }

  private def embFrame(rows: (Long, Seq[Double])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(DoubleType)))))

  test("embeddingNearDups finds identical vectors") {
    val v1 = Seq.tabulate(8)(i => math.sin(i + 1))
    val v2 = v1.map(_ * 1.001) // nearly parallel
    val v3 = Seq.tabulate(8)(i => math.cos(3 * i) * (if (i % 2 == 0) 1 else -1))
    val out = Dedup.embeddingNearDups(embFrame(1L -> v1, 2L -> v2, 3L -> v3),
        "embedding", "vec_id", bands = 2, planesPerBand = 2, dims = 8, minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out should contain((1L, 2L))
  }

  test("embeddingNearDups: planted near-dup survives the default 16-plane banding") {
    // a scaled copy is exactly parallel (cosine 1): every plane dot has
    // the same sign, so ALL band keys match — banding cannot lose it
    val base = Seq.tabulate(64)(i => math.sin(i * 0.7) + 0.1)
    val noise = Seq.tabulate(64)(i => math.cos(i * 1.3) * 0.9)
    val out = Dedup.embeddingNearDups(
        embFrame(1L -> base, 2L -> base.map(_ * 0.5), 3L -> noise),
        "embedding", "vec_id") // library defaults: bands=4, planesPerBand=16
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out shouldBe Array((1L, 2L))
  }

  test("embeddingNearDups candidates only grow with extra bands") {
    // band 0 at r planes IS the old single-bucket form — adding bands
    // must be a superset (the OR-amplification direction)
    val vs = (1L to 12L).map(i =>
      i -> Seq.tabulate(16)(d => math.sin(i * 3.1 + d * 0.9)))
    val one = Dedup.embeddingNearDups(embFrame(vs: _*), "embedding", "vec_id",
      bands = 1, planesPerBand = 4, dims = 16, minCosine = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val four = Dedup.embeddingNearDups(embFrame(vs: _*), "embedding", "vec_id",
      bands = 4, planesPerBand = 4, dims = 16, minCosine = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    one.subsetOf(four) shouldBe true
    four.size should be >= one.size
  }

  test("dupSpans reports spans shared across docs, not within one doc") {
    val d = docs(
      1L -> "the quick brown fox jumps high",
      2L -> "note the quick brown fox jumps again",
      // doc 3 repeats a 3-gram INTERNALLY; distinct-shingle expansion
      // must count it once, so it never reaches minDocs
      3L -> "solo alpha beta gamma solo alpha beta gamma",
      4L -> "unrelated words only here")
    val out = Dedup.dupSpans(d, "text", "doc_id", n = 3, minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (_, n, minDoc) => n shouldBe 2L; minDoc shouldBe 1L }
    // docs 1 and 2 share the 5-word run -> exactly three 3-spans survive
    out.map(_._1).sorted shouldBe
      Array("brown fox jumps", "quick brown fox", "the quick brown")
  }

  test("crossSourceOverlap canonicalizes the source pair and counts cells") {
    import spark.implicits._
    // near-identical texts across sources: wiki~crawl twice (docs 1-2,
    // 5-6), crawl~crawl once (3-4); the long shared run guarantees
    // shared band keys under (3,2) banding
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, run, "wiki"), (2L, run, "crawl"),
      (3L, run + " tail", "crawl"), (4L, run + " tail", "crawl"),
      (5L, run + " other", "crawl"), (6L, run + " other", "wiki"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.crossSourceOverlap(docs, "text", "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // every candidate cell is (least, greatest)-ordered
    out.keys.foreach { case (a, b) => a should be <= b }
    out(("crawl", "wiki")) should be >= 2L
    out(("crawl", "crawl")) should be >= 1L
  }

  test("dedupParagraphs keeps first occurrence, reassembles in order, drops emptied docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha one\nBOILER\nalpha two"),
      (2L, "BOILER\nbeta one"),   // BOILER lost to doc 1 pos 1
      (3L, "BOILER"),             // every paragraph lost -> doc dropped
      (4L, "alpha one\ngamma")    // "alpha one" lost to doc 1 pos 0
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "text", "doc_id", sep = "\n")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    out(1L) shouldBe (("alpha one\nBOILER\nalpha two", 3L))
    out(2L) shouldBe (("beta one", 1L))
    out(4L) shouldBe (("gamma", 1L))
    out.contains(3L) shouldBe false // C4 behavior: fully-duplicated doc removed
  }

  test("dedupParagraphs skips empty paragraphs and preserves winners under any split") {
    import spark.implicits._
    // empty segments from doubled separators never count as paragraphs
    val docs = Seq((1L, "a\n\nb"), (2L, "b\n\na")).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "text", "doc_id", sep = "\n")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "a\nb"
    out.contains(2L) shouldBe false // both its paragraphs lost to doc 1
  }

  test("dedupParagraphs local scope collapses within-doc repeats only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "header\nbody one\nheader\nbody two"), // in-doc repeated header
      (2L, "header\nbody three")                   // cross-doc repeat SURVIVES locally
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "text", "doc_id", sep = "\n",
        global = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "header\nbody one\nbody two"
    out(2L) shouldBe "header\nbody three"
  }

  test("canonicalReps keeps the quality argmax, not the min id") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // doc 2 is the near-dup of doc 1 but much longer -> higher n_tokens
    // leg of the quality score; the min-id policy would keep doc 1
    val richer = base + " with considerably more useful additional context words"
    val d = docs(1L -> base, 2L -> richer, 9L -> "unrelated standalone text entirely")
    val q = graft.functions.TextFns.qualityScore(col("text"))
    val out = Dedup.canonicalReps(d, "text", "doc_id", q)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // cluster id is the min member id; the representative is the argmax
    out(1L)._2 shouldBe 2L // n_members
    out(1L)._1 shouldBe 2L // rep_id: quality beat min-id
    out(9L) shouldBe ((9L, 1L)) // singleton cluster keeps itself
  }

  test("canonicalReps breaks exact quality ties by min id") {
    val txt = "identical content words repeated here for the tie case today ok"
    val d = docs(7L -> txt, 4L -> txt)
    val q = graft.functions.TextFns.qualityScore(col("text"))
    val out = Dedup.canonicalReps(d, "text", "doc_id", q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out shouldBe Array((4L, 4L, 2L))
  }

  test("bandBucketStats prices the pair expansion per band") {
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(1L -> txt, 2L -> txt, 3L -> "entirely different other words here today")
    val out = Dedup.bandBucketStats(d, "text", "doc_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out.keySet shouldBe Set("b0", "b1", "b2")
    for ((_, (nBuckets, nDocs, maxBucket, pairs)) <- out) {
      nDocs shouldBe 3L        // every doc keys into every band
      nBuckets shouldBe 2L     // the identical pair shares its bucket
      maxBucket shouldBe 2L
      pairs shouldBe 1L        // 2*(2-1)/2
    }
  }

  test("minhashCalibration puts an identical pair at full agreement, top decile") {
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = docs(1L -> txt, 2L -> txt)
    val out = Dedup.minhashCalibration(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out shouldBe Array((6L, 9L, 1L)) // 6/6 signature positions, jaccard 1.0 capped into decile 9
  }

  test("containmentPairs flags the engulfed doc that Jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val big = small + " " + (1 to 40).map(i => s"filler$i word$i more$i").mkString(" ")
    val d = docs(1L -> small, 2L -> big, 3L -> "totally unrelated content about other things")
    val out = Dedup.containmentPairs(d, "text", "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    val (cont, jac, flag) = out((1L, 2L))
    cont shouldBe 1.0 // every small-doc shingle appears in the big doc
    jac should be < 0.5 // symmetric similarity is low
    flag shouldBe 1L
  }
}
