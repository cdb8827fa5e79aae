package graft.api

import graft.SparkSpec
import graft.operators.{Audit, Basket, Dedup, Hits, PageRank, Profile, Sampling, Sessionize, TfIdf, Triangles}
import org.apache.spark.sql.functions._

class SyntaxSpec extends SparkSpec {

  import syntax._

  private lazy val implicits = spark.implicits
  import implicits._

  test("facade methods produce the same plans as direct operator calls") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "something else entirely here")).toDF("doc_id", "text")
    // sameResult = canonicalized-plan equality: the facade adds NOTHING
    docs.dropExactDups("text", "doc_id").queryExecution.analyzed
      .sameResult(Dedup.dropExactDups(docs, "text", "doc_id")
        .queryExecution.analyzed) shouldBe true
    docs.deterministicSample("doc_id", 25).queryExecution.analyzed
      .sameResult(Sampling.deterministicSample(docs, "doc_id", 25)
        .queryExecution.analyzed) shouldBe true
  }

  test("a curation chain composes through the facade") {
    val docs = Seq(
      (1L, "the stream of data is clean and ready for the training corpus today"),
      (2L, "the stream of data is clean and ready for the training corpus today"),
      (3L, "a different document about the engine and its many moving parts in code"))
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, "totally unrelated benchmark text avoiding collisions"))
      .toDF("doc_id", "text")
    val out = docs
      .dropExactDups("text", "doc_id")
      .decontaminateAgainst(evalSet, "text", "doc_id", n = 3)
      .deterministicSample("doc_id", 100)
    out.select("doc_id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L)
  }

  test("round-9 facade methods produce the same plans as direct calls") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma other"))
      .toDF("doc_id", "text")
    docs.prefixFilterPairs("text", "doc_id").queryExecution.analyzed
      .sameResult(Dedup.prefixFilterPairs(docs, "text", "doc_id",
          minJaccard = 0.5, shingleN = 3)
        .queryExecution.analyzed) shouldBe true
    docs.winnowedPairs("text", "doc_id").queryExecution.analyzed
      .sameResult(Dedup.winnowedPairs(docs, "text", "doc_id")
        .queryExecution.analyzed) shouldBe true
    docs.distinctNgramRatios("text", "doc_id").count() shouldBe 6L // 2 docs x n=1..3
    val ev = Seq((1L, 0L, "a", 1L), (1L, 30L, "b", 2L))
      .toDF("user_id", "sec", "event_type", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    ev.transitionMatrix("user_id", "ts", "event_type", "event_id", 3600)
      .collect().map(r => (r.getString(0), r.getString(1))) shouldBe
        Array(("a", "b"))
  }

  test("second-session facade methods produce the same plans as direct calls") {
    val docs = Seq((1L, "a a b", "s"), (2L, "a c c", "s"))
      .toDF("doc_id", "text", "source")
    docs.freqSpectrum("text", "source").queryExecution.analyzed
      .sameResult(TfIdf.freqSpectrum(docs, "text", "source")
        .queryExecution.analyzed) shouldBe true
    docs.labelEntropy("source", "doc_id").queryExecution.analyzed
      .sameResult(Profile.labelEntropy(docs, "source", "doc_id")
        .queryExecution.analyzed) shouldBe true
    docs.keySkew("source", "doc_id").count() shouldBe 2L
    // ksByGroup eagerly checkpoints its count table, so plans carry
    // distinct RDD ids — compare RESULTS instead of plan identity
    val sized = docs.withColumn("n_chars", expr("length(text)"))
    sized.ksDrift("n_chars", "source").count() shouldBe
      Profile.ksByGroup(sized, "n_chars", "source").count()
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    pairs.kcore().collect().length shouldBe 3
    val emb = Seq(Tuple1(Seq(1.0, 0.0)), Tuple1(Seq(0.9, 0.1)))
      .toDF("embedding")
    emb.dominantDirection("embedding", dims = 2).count() shouldBe 2L
    docs.epochShards("doc_id", 2, 4).count() shouldBe 4L
  }

  test("graph and basket facade methods delegate to the verified operators") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    pairs.localClustering().queryExecution.analyzed
      .sameResult(Triangles.localClusteringBp(pairs, "id_a", "id_b")
        .queryExecution.analyzed) shouldBe true
    val items = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
      .toDF("basket", "item")
    items.basketPairAffinity("basket", "item").queryExecution.analyzed
      .sameResult(Basket.pairAffinity(items, "basket", "item", minPairs = 2L)
        .queryExecution.analyzed) shouldBe true
    // bipartiteHits/weightedPageRank checkpoint per round: compare
    // results, not plans
    items.bipartiteHits("basket", "item").count() shouldBe
      Hits.bipartiteHits(items, "basket", "item", iterations = 2).count()
    val wp = Seq((1L, 2L, 3L), (2L, 3L, 1L)).toDF("id_a", "id_b", "w")
    wp.weightedPageRank().count() shouldBe
      PageRank.weightedRanks(wp, iterations = 3).count()
    val seeds = Seq(1L).toDF("node")
    pairs.personalizedPageRank(seeds).collect().toSet shouldBe
      PageRank.personalizedRanks(pairs, seeds, iterations = 4)
        .collect().toSet
    val docs = Seq((1L, "a b", "s"), (2L, "a c", "t")).toDF("doc_id", "text", "source")
    docs.jsDivergence("text", "source").queryExecution.analyzed
      .sameResult(Profile.jsDivergence(docs, "text", "source")
        .queryExecution.analyzed) shouldBe true
    val priv = Seq(("x", "m", "s1"), ("x", "m", "s2")).toDF("q1", "q2", "sv")
    priv.kAnonymity(Seq("q1", "q2"), 5L).queryExecution.analyzed
      .sameResult(Audit.kAnonymity(priv, Seq("q1", "q2"), 5L)
        .queryExecution.analyzed) shouldBe true
    priv.lDiversity(Seq("q1"), "sv", 2L).queryExecution.analyzed
      .sameResult(Audit.lDiversity(priv, Seq("q1"), "sv", 2L)
        .queryExecution.analyzed) shouldBe true
    priv.tCloseness(Seq("q1"), "sv").queryExecution.analyzed
      .sameResult(Audit.tCloseness(priv, Seq("q1"), "sv")
        .queryExecution.analyzed) shouldBe true
    // kaplanMeier/nelsonAalen checkpoint their phase-1 frame: compare
    // results, not plans
    val obs = Seq((1L, 1L), (2L, 0L), (3L, 1L)).toDF("dur", "ev")
    obs.kaplanMeier("dur", "ev").collect().toSeq shouldBe
      graft.operators.Survival.kaplanMeier(obs, "dur", "ev").collect().toSeq
    obs.nelsonAalen("dur", "ev").collect().toSeq shouldBe
      graft.operators.Survival.nelsonAalen(obs, "dur", "ev").collect().toSeq
    val items2 = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
      .toDF("basket", "item")
    items2.associationRules("basket", "item").queryExecution.analyzed
      .sameResult(Basket.associationRules(items2, "basket", "item",
        minPairs = 2L).queryExecution.analyzed) shouldBe true
    val txt = Seq((1L, "a b a b")).toDF("doc_id", "text")
    txt.phraseMatches("text", "doc_id", "a b").queryExecution.analyzed
      .sameResult(graft.operators.TextIndex.phraseMatches(txt, "text",
        "doc_id", "a b").queryExecution.analyzed) shouldBe true
    val ev2 = Seq(("g", java.sql.Date.valueOf("2024-01-01")))
      .toDF("g", "day")
    ev2.cusumChangePoint("g", "day").queryExecution.analyzed
      .sameResult(Profile.cusumChangePoint(ev2, "g", "day")
        .queryExecution.analyzed) shouldBe true
    val ord = Seq(("u", java.sql.Date.valueOf("2024-01-01"), BigDecimal(1)))
      .toDF("u", "day", "amt")
    ord.cohortLtv("u", "day", "amt").queryExecution.analyzed
      .sameResult(graft.operators.Cohorts.cohortLtv(ord, "u", "day", "amt")
        .queryExecution.analyzed) shouldBe true
    val ser = Seq(("g", "d1", 1.0), ("g", "d2", 2.0)).toDF("g", "day", "v")
    ser.holt("g", "day", "v").queryExecution.analyzed
      .sameResult(graft.operators.Resample.holt(ser, "g", "day", "v")
        .queryExecution.analyzed) shouldBe true
    // abcClassification/ppsSample collect bucket offsets eagerly:
    // compare results
    val kv = Seq(("a", 60.0), ("b", 40.0)).toDF("k", "v")
    kv.abcClassification("k", "v").collect().toSeq shouldBe
      graft.operators.Pareto.abcClassification(kv, "k", "v").collect().toSeq
    val wts = Seq((1L, 5L), (2L, 5L)).toDF("k", "w")
    wts.ppsSample("k", "w", 2L).collect().toSeq shouldBe
      Sampling.ppsSample(wts, "k", "w", 2L).collect().toSeq
    // bfsLayers/greedyCoverage run driver rounds: compare results
    val bedges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val bseeds = Seq(1L).toDF("n")
    bedges.bfsLayers("a", "b", bseeds, "n", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      graft.operators.Bfs.layers(bedges, "a", "b", bseeds, "n", 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gdocs = Seq((1L, "a b c"), (2L, "c d e")).toDF("doc_id", "text")
    gdocs.greedyCoverage("text", "doc_id", k = 2, shingleN = 1)
      .collect().toSeq shouldBe
      graft.operators.Selection.greedyCoverage(gdocs, "text", "doc_id",
        k = 2, shingleN = 1).collect().toSeq
  }

  test("metric ops facade delegates to the verified operators") {
    // rankAuc/gainsTable collect bucket offsets eagerly: compare results
    val sc = Seq(("a", 3.0, 1L), ("b", 2.0, 0L), ("c", 1.0, 1L))
      .toDF("id", "s", "lab")
    sc.rankAuc("s", "lab").collect().toSeq shouldBe
      graft.operators.Metrics.rankAuc(sc, "s", "lab").collect().toSeq
    sc.gainsTable("s", "id", "lab", tiles = 3).collect().toSet shouldBe
      graft.operators.Metrics.gainsTable(sc, "s", "id", "lab", tiles = 3)
        .collect().toSet
    sc.calibrationBins("s", "lab", 1.0).queryExecution.analyzed
      .sameResult(graft.operators.Metrics.calibrationBins(sc, "s", "lab", 1.0)
        .queryExecution.analyzed) shouldBe true
    // exactQuantiles/quantilesFromCounts assemble driver rows:
    // compare results
    sc.exactQuantiles("s", Seq(0.5), 1.0).collect().toSeq shouldBe
      graft.operators.Metrics.exactQuantiles(sc, "s", Seq(0.5), 1.0)
        .collect().toSeq
    val qc = Seq((1.0, 2L), (3.0, 1L)).toDF("v", "c")
    qc.quantilesFromCounts("v", "c", Seq(0.5), 1.0).collect().toSeq shouldBe
      graft.operators.Metrics.quantilesFromCounts(qc, "v", "c", Seq(0.5),
        1.0).collect().toSeq
    // cohensKappa localCheckpoints the cell table: compare results
    val ck = Seq(("g", "x", "x"), ("g", "x", "y")).toDF("g", "a", "b")
    ck.cohensKappa("g", "a", "b").collect().toSeq shouldBe
      graft.operators.Metrics.cohensKappa(ck, "g", "a", "b")
        .collect().toSeq
    // ndcgAtK/fleissKappa localCheckpoint: compare results
    val nd = Seq(("g", 2.0, 1L, 1L), ("g", 1.0, 2L, 0L))
      .toDF("q", "s", "id", "rel")
    nd.ndcgAtK("q", "s", "id", "rel", k = 2).collect().toSeq shouldBe
      graft.operators.Metrics.ndcgAtK(nd, "q", "s", "id", "rel", k = 2)
        .collect().toSeq
    val mr = Seq(("g", 1L, 2.0, 1L, 1L), ("g", 1L, 1.0, 2L, 0L))
      .toDF("g", "qq", "s", "id", "rel")
    mr.meanReciprocalRank("g", "qq", "s", "id", "rel")
      .queryExecution.analyzed
      .sameResult(graft.operators.Metrics.meanReciprocalRank(mr, "g",
        "qq", "s", "id", "rel").queryExecution.analyzed) shouldBe true
    val fk = Seq(("g", 1L, "x", "x", "y")).toDF("g", "i", "r1", "r2", "r3")
    fk.fleissKappa("g", "i", Seq("r1", "r2", "r3")).collect().toSeq shouldBe
      graft.operators.Metrics.fleissKappa(fk, "g", "i",
        Seq("r1", "r2", "r3")).collect().toSeq
    // topKDrift/weekdaySeasonality/seasonalNaiveError localCheckpoint:
    // compare results
    val td = Seq(("g", 0L, "a", 1.0), ("g", 1L, "a", 2.0))
      .toDF("g", "arm", "key", "v")
    td.topKDrift("g", "arm", "key", "v", k = 2).collect().toSeq shouldBe
      graft.operators.Profile.topKDrift(td, "g", "arm", "key", "v", k = 2)
        .collect().toSeq
    // linkageQuality/exactDupPairs/reshardChurn: plan or result parity
    val lp = Seq((1L, 2L)).toDF("id_a", "id_b")
    lp.linkageQuality(lp).collect().toSeq shouldBe
      graft.operators.Metrics.linkageQuality(lp, lp).collect().toSeq
    val cal = Seq(("g", 1.0, 1L), ("g", 2.0, 0L)).toDF("g", "s", "y")
    cal.isotonicCalibration("g", "s", "y", 1.0).collect().toSeq shouldBe
      graft.operators.Metrics.isotonicCalibration(cal, "g", "s", "y", 1.0)
        .collect().toSeq
    cal.calibrationCard("g", "s", "y", 1.0).queryExecution.analyzed
      .sameResult(graft.operators.Metrics.calibrationCard(cal, "g", "s",
        "y", 1.0).queryExecution.analyzed) shouldBe true
    cal.prCurve("g", "s", "y", Seq(1L)).queryExecution.analyzed
      .sameResult(graft.operators.Metrics.prCurve(cal, "g", "s", "y",
        Seq(1L)).queryExecution.analyzed) shouldBe true
    val dd = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "text")
    dd.exactDupPairs("text", "doc_id").queryExecution.analyzed
      .sameResult(graft.operators.Dedup.exactDupPairs(dd, "text",
        "doc_id").queryExecution.analyzed) shouldBe true
    val rk = Seq(Tuple1(1L), Tuple1(2L)).toDF("k")
    rk.reshardChurn("k", 4, 5).queryExecution.analyzed
      .sameResult(graft.operators.Packing.reshardChurn(rk, "k", 4, 5)
        .queryExecution.analyzed) shouldBe true
    val wts = Seq(("g", new java.sql.Timestamp(43200000L)),
      ("g", new java.sql.Timestamp(86400000L + 43200000L))).toDF("k", "ts")
    wts.weekdaySeasonality("k", "ts").collect().toSeq shouldBe
      graft.operators.Resample.weekdaySeasonality(wts, "k", "ts")
        .collect().toSeq
    wts.seasonalNaiveError("k", "ts").collect().toSeq shouldBe
      graft.operators.Resample.seasonalNaiveError(wts, "k", "ts")
        .collect().toSeq
    val bev = Seq((1L, new java.sql.Timestamp(1000L), 1L),
      (1L, new java.sql.Timestamp(2000L), 2L)).toDF("k", "ts", "tie")
    bev.burstiness("k", "ts", "tie").queryExecution.analyzed
      .sameResult(graft.operators.Resample.burstiness(bev, "k", "ts",
        "tie").queryExecution.analyzed) shouldBe true
    val sev = Seq((1L, new java.sql.Timestamp(1000L), 1L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    sev.nextActionEntropy("user_id", "ts", "event_type", "event_id",
        3600L).queryExecution.analyzed
      .sameResult(graft.operators.Sessionize.nextActionEntropy(sev,
        "user_id", "ts", "event_type", "event_id", 3600L)
        .queryExecution.analyzed) shouldBe true
    sev.streaks("user_id", "ts", "event_type", "event_id")
      .queryExecution.analyzed
      .sameResult(graft.operators.Sessionize.streaks(sev, "user_id",
        "ts", "event_type", "event_id").queryExecution.analyzed) shouldBe true
    val es = Seq(("g", 1L, 2.0), ("g", 0L, 1.0)).toDF("g", "arm", "v")
    es.effectSize("g", "arm", "v").queryExecution.analyzed
      .sameResult(graft.operators.Hypothesis.effectSize(es, "g", "arm",
        "v").queryExecution.analyzed) shouldBe true
    val rc = Seq(("g", 1L, 1L)).toDF("g", "e", "o")
    rc.riskCard("g", "e", "o").queryExecution.analyzed
      .sameResult(graft.operators.Hypothesis.riskCard(rc, "g", "e", "o")
        .queryExecution.analyzed) shouldBe true
    val vr = Seq((1L, "a b", "s")).toDF("doc_id", "text", "source")
    vr.vocabRichness("text", "source").queryExecution.analyzed
      .sameResult(graft.operators.TfIdf.vocabRichness(vr, "text",
        "source").queryExecution.analyzed) shouldBe true
    vr.readability("text", "source").queryExecution.analyzed
      .sameResult(graft.operators.TfIdf.readability(vr, "text",
        "source").queryExecution.analyzed) shouldBe true
    val th = Seq(("g", 2.0), ("g", 3.0)).toDF("g", "v")
    th.theil("g", "v").queryExecution.analyzed
      .sameResult(graft.operators.Pareto.theil(th, "g", "v")
        .queryExecution.analyzed) shouldBe true
    val hg = Seq(("g", 1L, 2.0), ("g", 0L, 2.0)).toDF("g", "arm", "v")
    hg.hellinger("g", "arm", "v").queryExecution.analyzed
      .sameResult(graft.operators.Profile.hellinger(hg, "g", "arm", "v")
        .queryExecution.analyzed) shouldBe true
    val crv = Seq(("g", "x", "p"), ("g", "y", "q")).toDF("g", "a", "b")
    crv.cramersV("g", "a", "b").collect().toSeq shouldBe
      graft.operators.Profile.cramersV(crv, "g", "a", "b")
        .collect().toSeq
    val ew = Seq(("g", 2L), ("g", 3L)).toDF("g", "w")
    ew.effectiveSampleSize("g", "w").queryExecution.analyzed
      .sameResult(graft.operators.Sampling.effectiveSampleSize(ew, "g",
        "w").queryExecution.analyzed) shouldBe true
    val qq = Seq(("g", 0L, 1.0), ("g", 1L, 2.0)).toDF("g", "arm", "v")
    qq.qqShift("g", "arm", "v", Seq(0.5)).collect().toSeq shouldBe
      graft.operators.Metrics.qqShift(qq, "g", "arm", "v", Seq(0.5))
        .collect().toSeq
    val pm = Seq(("g", 1.0, 2.0), ("g", 2.0, 3.0)).toDF("g", "x", "y")
    pm.pearsonMatrix("g", Seq("x", "y")).collect().toSeq shouldBe
      graft.operators.Profile.pearsonMatrix(pm, "g", Seq("x", "y"))
        .collect().toSeq
    val pq = Seq(("g", 1.0, 2.0, 3.0), ("g", 2.0, 3.0, 4.0))
      .toDF("g", "x", "y", "z")
    pq.partialCorrelation("g", "x", "y", "z").queryExecution.analyzed
      .sameResult(graft.operators.Profile.partialCorrelation(pq, "g",
        "x", "y", "z").queryExecution.analyzed) shouldBe true
    val bd = Seq((1L, "a b", "s1"), (2L, "b c", "s2"))
      .toDF("doc_id", "text", "source")
    bd.burrowsDelta("text", "source", topK = 2).collect().toSeq shouldBe
      graft.operators.TfIdf.burrowsDelta(bd, "text", "source", topK = 2)
        .collect().toSeq
    bd.keyness("text", "source", k = 1).collect().toSeq shouldBe
      graft.operators.TfIdf.keyness(bd, "text", "source", k = 1)
        .collect().toSeq
    bd.lexicalDispersion("text", "source", topK = 2)
      .collect().toSeq shouldBe
      graft.operators.TfIdf.lexicalDispersion(bd, "text", "source",
        topK = 2).collect().toSeq
    sev.hourEntropy("user_id", "ts").queryExecution.analyzed
      .sameResult(graft.operators.Sessionize.hourEntropy(sev, "user_id",
        "ts").queryExecution.analyzed) shouldBe true
    val vm = Seq(("g", "c", "l")).toDF("g", "c", "l")
    vm.vMeasure("g", "c", "l").collect().toSeq shouldBe
      graft.operators.Metrics.vMeasure(vm, "g", "c", "l")
        .collect().toSeq
    val ht = Seq((4.0, 1L), (2.0, 2L), (1.0, 3L)).toDF("v", "tie")
    ht.hillTail("v", "tie", k = 2).collect().toSeq shouldBe
      graft.operators.Pareto.hillTail(ht, "v", "tie", k = 2)
        .collect().toSeq
    val rmd = Seq((1L, 1L), (2L, 0L)).toDF("dur", "ev")
    rmd.rmst("dur", "ev", tau = 10L).collect().toSeq shouldBe
      graft.operators.Survival.rmst(rmd, "dur", "ev", tau = 10L)
        .collect().toSeq
    rmd.medianSurvival("dur", "ev").collect().toSeq shouldBe
      graft.operators.Survival.medianSurvival(rmd, "dur", "ev")
        .collect().toSeq
    val pr = Seq(("g", 0L), ("g", 1L)).toDF("g", "arm")
    pr.poissonRateTest("g", "arm", 10L, 10L).queryExecution.analyzed
      .sameResult(graft.operators.Hypothesis.poissonRateTest(pr, "g",
        "arm", 10L, 10L).queryExecution.analyzed) shouldBe true
    val ny = Seq(("g", "a", 1.0), ("g", "a", 2.0)).toDF("g", "st", "v")
    ny.neymanAllocation("g", "st", "v", 10L).queryExecution.analyzed
      .sameResult(graft.operators.Sampling.neymanAllocation(ny, "g",
        "st", "v", 10L).queryExecution.analyzed) shouldBe true
    val fr = Seq(("g", 1.0, 2.0)).toDF("g", "t1", "t2")
    fr.friedman("g", Seq("t1", "t2")).queryExecution.analyzed
      .sameResult(graft.operators.Hypothesis.friedman(fr, "g",
        Seq("t1", "t2")).queryExecution.analyzed) shouldBe true
    val sp = Seq(("g", 1L), ("g", 0L)).toDF("g", "y")
    sp.sprt("g", "y", p0 = 0.2, p1 = 0.4).queryExecution.analyzed
      .sameResult(graft.operators.Hypothesis.sprt(sp, "g", "y", 0.2, 0.4)
        .queryExecution.analyzed) shouldBe true
    val cm = Seq(("g", "s", 1L, 1L), ("g", "s", 0L, 0L))
      .toDF("g", "st", "e", "o")
    cm.cmh("g", "st", "e", "o").queryExecution.analyzed
      .sameResult(graft.operators.Hypothesis.cmh(cm, "g", "st", "e", "o")
        .queryExecution.analyzed) shouldBe true
    cm.mhOddsRatio("g", "st", "e", "o").queryExecution.analyzed
      .sameResult(graft.operators.Hypothesis.mhOddsRatio(cm, "g", "st",
        "e", "o").queryExecution.analyzed) shouldBe true
    val rbd = Seq(("g", 0L, 1L, 2.0), ("g", 1L, 1L, 2.0))
      .toDF("g", "arm", "item", "s")
    rbd.rbo("g", "arm", "item", "s", k = 5).collect().toSeq shouldBe
      graft.operators.Metrics.rbo(rbd, "g", "arm", "item", "s", k = 5)
        .collect().toSeq
    val mkd = Seq(("g", 1L, 1L), ("g", 2L, 2L)).toDF("g", "x", "y")
    mkd.mannKendall("g", "x", "y").collect().toSeq shouldBe
      graft.operators.Hypothesis.mannKendall(mkd, "g", "x", "y")
        .collect().toSeq
    val lpd = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    lpd.linkPrediction("id_a", "id_b").collect().toSeq shouldBe
      graft.operators.Triangles.linkPrediction(lpd, "id_a", "id_b")
        .collect().toSeq
    val wd = Seq(("g", 0L, 1.0), ("g", 1L, 2.0)).toDF("g", "arm", "v")
    wd.wasserstein1d("g", "arm", "v").queryExecution.analyzed
      .sameResult(graft.operators.Profile.wasserstein1d(wd, "g", "arm",
        "v").queryExecution.analyzed) shouldBe true
    val tsh = Seq(("a", 9.0), ("b", 1.0)).toDF("k", "v")
    tsh.topShares("k", "v", Seq(5000L)).collect().toSeq shouldBe
      graft.operators.Pareto.topShares(tsh, "k", "v", Seq(5000L))
        .collect().toSeq
    val mk = Seq(("g", 1L, "a"), ("g", 2L, "b")).toDF("g", "ord", "t")
    mk.markovTransitions(Seq("g"), Seq("ord"), "t").queryExecution.analyzed
      .sameResult(graft.operators.Markov.transitions(mk, Seq("g"),
        Seq("ord"), "t").queryExecution.analyzed) shouldBe true
    // chiSquare/mutualInfo checkpoint the cell table eagerly: compare
    // results
    val ct = Seq(("x", "u"), ("x", "v"), ("y", "u")).toDF("ca", "cb")
    ct.chiSquare("ca", "cb").collect().toSet shouldBe
      graft.operators.Profile.chiSquare(ct, "ca", "cb").collect().toSet
    ct.mutualInfo("ca", "cb").collect().toSeq shouldBe
      graft.operators.Profile.mutualInfo(ct, "ca", "cb").collect().toSeq
    ct.fdStrength(Seq("ca"), "cb").queryExecution.analyzed
      .sameResult(graft.operators.Audit.fdStrength(ct, Seq("ca"), "cb")
        .queryExecution.analyzed) shouldBe true
    // zipfFit checkpoints its top-K cut eagerly: compare results
    val zd = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    zd.zipfFit("text", topK = 3).collect().toSeq shouldBe
      graft.operators.TfIdf.zipfFit(zd, "text", topK = 3).collect().toSeq
    val ra = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "neighbor_id", "rank")
    val rb = Seq((1L, 20L, 1)).toDF("query_id", "neighbor_id", "rank")
    ra.rrfFuse(rb).queryExecution.analyzed
      .sameResult(graft.operators.Similarity.rrfFuse(ra, rb)
        .queryExecution.analyzed) shouldBe true
    // sphericalLloydIvfTopK collects its init and localCheckpoints
    // each assignment: compare results
    val sv = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(0.1, 0.9))).toDF("id", "v")
    sv.filter(col("id") === 1L)
      .sphericalLloydIvfTopK(sv, "id", "v", k = 2, nCells = 2,
        nprobe = 1, iters = 2).collect().toSeq shouldBe
      graft.operators.Similarity.sphericalLloydIvfTopK(
        sv.filter(col("id") === 1L), sv, "id", "v", k = 2, nCells = 2,
        nprobe = 1, iters = 2).collect().toSeq
    // weightedSample/theilSen/decayedScores are plan-equal; mmr runs
    // driver rounds: compare results
    val ws = Seq((1L, 3L), (2L, 5L)).toDF("k", "w")
    ws.weightedSample("k", "w", 1).queryExecution.analyzed
      .sameResult(graft.operators.Sampling.weightedSample(ws, "k", "w", 1)
        .queryExecution.analyzed) shouldBe true
    val srs = Seq(("g", 0L, 1L), ("g", 1L, 2L)).toDF("g", "x", "y")
    srs.theilSen("g", "x", "y").queryExecution.analyzed
      .sameResult(graft.operators.Resample.theilSen(srs, "g", "x", "y")
        .queryExecution.analyzed) shouldBe true
    val dev = Seq(("u", 0L, 1.0)).toDF("k", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    dev.decayedScores("k", "ts", "v", 1.0).queryExecution.analyzed
      .sameResult(graft.operators.Resample.decayedScores(dev, "k", "ts",
        "v", 1.0).queryExecution.analyzed) shouldBe true
    val np = Seq((1L, 1L)).toDF("u", "i")
    val ni = Seq(1L, 2L).toDF("item")
    np.negativeSamples("u", "i", ni, "item", 2).queryExecution.analyzed
      .sameResult(Sampling.negativeSamples(np, "u", "i", ni, "item", 2)
        .queryExecution.analyzed) shouldBe true
    val tdv = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L))
      .toDF("g", "d", "v")
    tdv.trailingDeviation("g", "d", "v", 2).queryExecution.analyzed
      .sameResult(graft.operators.Resample.trailingDeviation(tdv, "g", "d",
        "v", 2).queryExecution.analyzed) shouldBe true
    val xz = Seq(("k", 1L, 2.0), ("k", 2L, 3.0)).toDF("k", "mon", "q")
    xz.xyzClassification("k", "mon", "q").queryExecution.analyzed
      .sameResult(graft.operators.Pareto.xyzClassification(xz, "k", "mon",
        "q").queryExecution.analyzed) shouldBe true
    val rav = Seq((1L, 0L)).toDF("user_id", "d")
      .withColumn("ts", timestamp_micros(col("d")))
    rav.rollingActives("user_id", "ts", 7).queryExecution.analyzed
      .sameResult(graft.operators.Cohorts.rollingActives(rav, "user_id",
        "ts", 7).queryExecution.analyzed) shouldBe true
    val tle = Seq((1L, 0L, "view")).toDF("user_id", "d", "event_type")
      .withColumn("ts", timestamp_micros(col("d")))
    tle.temporalLabels("user_id", "ts", "event_type", "buy",
        "1970-01-03", "1970-01-05").queryExecution.analyzed
      .sameResult(graft.operators.Cohorts.temporalLabels(tle, "user_id",
        "ts", "event_type", "buy", "1970-01-03", "1970-01-05")
        .queryExecution.analyzed) shouldBe true
    val mh = Seq(("m", "f", 1.0)).toDF("m", "f", "v")
    mh.hhi("m", "f", "v").queryExecution.analyzed
      .sameResult(graft.operators.Profile.hhi(mh, "m", "f", "v")
        .queryExecution.analyzed) shouldBe true
    val bk = Seq((1L, 2L)).toDF("b", "i")
    bk.cosineTopK("b", "i", 3, 1L).queryExecution.analyzed
      .sameResult(graft.operators.Basket.cosineTopK(bk, "b", "i", 3, 1L)
        .queryExecution.analyzed) shouldBe true
    val wl = Seq(("s", 1L)).toDF("grp", "ok")
    wl.wilsonLowerBound("grp", "ok").queryExecution.analyzed
      .sameResult(graft.operators.Metrics.wilsonLowerBound(wl, "grp", "ok")
        .queryExecution.analyzed) shouldBe true
    val ccx = Seq((0L, 1L)).toDF("d", "x")
    val ccy = Seq((0L, 2L)).toDF("d", "y")
    ccx.crossCorr(ccy, "d", "x", "y", 2).queryExecution.analyzed
      .sameResult(graft.operators.Resample.crossCorr(ccx, ccy, "d", "x",
        "y", 2).queryExecution.analyzed) shouldBe true
    val wv = Seq(("b", 1L)).toDF("bin", "y")
    wv.woeIv("bin", "y").queryExecution.analyzed
      .sameResult(graft.operators.Metrics.woeIv(wv, "bin", "y")
        .queryExecution.analyzed) shouldBe true
    val pc = Seq((1L, 0L)).toDF("day", "bad")
    pc.pChart("day", "bad").queryExecution.analyzed
      .sameResult(graft.operators.Audit.pChart(pc, "day", "bad")
        .queryExecution.analyzed) shouldBe true
    // gini localCheckpoints internally, so compare results, not plans
    val gd = Seq(("g", "k1", 1.0), ("g", "k2", 3.0)).toDF("g", "k", "v")
    gd.gini("g", "k", "v").collect().toSeq shouldBe
      graft.operators.Pareto.gini(gd, "g", "k", "v").collect().toSeq
    val ab = Seq(("t", 0L, 1L)).toDF("t", "arm", "ok")
    ab.twoProportionZ("t", "arm", "ok").queryExecution.analyzed
      .sameResult(graft.operators.Metrics.twoProportionZ(ab, "t", "arm",
        "ok").queryExecution.analyzed) shouldBe true
    val di = Seq(("k", 1L)).toDF("k", "p")
    di.dispersionIndex("k", "p").queryExecution.analyzed
      .sameResult(graft.operators.Profile.dispersionIndex(di, "k", "p")
        .queryExecution.analyzed) shouldBe true
    val ll = Seq(("g", 2.0, 4.0)).toDF("g", "x", "y")
    ll.logLogSlope("g", "x", "y").queryExecution.analyzed
      .sameResult(graft.operators.Resample.logLogSlope(ll, "g", "x", "y")
        .queryExecution.analyzed) shouldBe true
    // concurrency localCheckpoints internally: compare results
    val cv = Seq((0L, 2L), (1L, 3L)).toDF("s", "e")
    cv.concurrency("s", "e").collect().toSeq shouldBe
      graft.operators.Resample.concurrency(cv, "s", "e").collect().toSeq
    val sm = Seq(("u", 1L), ("u", 9L)).toDF("u", "d")
    val wall = org.apache.spark.sql.functions.lit(5L)
    sm.segmentMigration("u", "d", wall).queryExecution.analyzed
      .sameResult(graft.operators.Cohorts.segmentMigration(sm, "u", "d",
        wall).queryExecution.analyzed) shouldBe true
    // revenueBridge localCheckpoints internally: compare results
    val rbr = Seq(("u", 1L, 3.0), ("u", 2L, 5.0)).toDF("u", "mon", "v")
    rbr.revenueBridge("u", "mon", "v").collect().toSeq shouldBe
      graft.operators.Cohorts.revenueBridge(rbr, "u", "mon", "v")
        .collect().toSeq
    val pp = Seq((1L, "c", 10L), (2L, "c", 11L)).toDF("id", "cell", "day")
    pp.proximatePairs(Seq("cell"), "id", "day", 3L).queryExecution.analyzed
      .sameResult(graft.operators.FuzzyJoin.proximatePairs(pp, Seq("cell"),
        "id", "day", 3L).queryExecution.analyzed) shouldBe true
    val mw = Seq(("g", 0L, 1.0), ("g", 1L, 2.0)).toDF("g", "arm", "v")
    mw.mannWhitneyU("g", "arm", "v").queryExecution.analyzed
      .sameResult(graft.operators.Hypothesis.mannWhitneyU(mw, "g", "arm",
        "v").queryExecution.analyzed) shouldBe true
    // kendallTau localCheckpoints the cells table: compare results
    val kt = Seq(("g", 1L, 1L), ("g", 2L, 2L)).toDF("g", "x", "y")
    kt.kendallTau("g", "x", "y").collect().toSeq shouldBe
      graft.operators.Hypothesis.kendallTau(kt, "g", "x", "y")
        .collect().toSeq
    mw.cliffsDelta("g", "arm", "v").queryExecution.analyzed
      .sameResult(graft.operators.Hypothesis.cliffsDelta(mw, "g", "arm",
        "v").queryExecution.analyzed) shouldBe true
    // kruskalWallis localCheckpoints the cells table: compare results
    val kw = Seq(("g", 0L, 1.0), ("g", 1L, 2.0), ("g", 2L, 3.0))
      .toDF("g", "arm", "v")
    kw.kruskalWallis("g", "arm", "v").collect().toSeq shouldBe
      graft.operators.Hypothesis.kruskalWallis(kw, "g", "arm", "v")
        .collect().toSeq
    val mn = Seq(("g", 0L, 1L), ("g", 1L, 0L)).toDF("g", "a", "b")
    mn.mcnemar("g", "a", "b").queryExecution.analyzed
      .sameResult(graft.operators.Hypothesis.mcnemar(mn, "g", "a", "b")
        .queryExecution.analyzed) shouldBe true
    val cq = Seq(("g", 1L, 0L, 1L)).toDF("g", "t1", "t2", "t3")
    cq.cochranQ("g", Seq("t1", "t2", "t3")).queryExecution.analyzed
      .sameResult(graft.operators.Hypothesis.cochranQ(cq, "g",
        Seq("t1", "t2", "t3")).queryExecution.analyzed) shouldBe true
    val cam = Seq(("g", 1L, 1L), ("g", 2L, 0L)).toDF("g", "w", "s")
    cam.cochranArmitage("g", "w", "s").queryExecution.analyzed
      .sameResult(graft.operators.Hypothesis.cochranArmitage(cam, "g",
        "w", "s").queryExecution.analyzed) shouldBe true
    // logRank localCheckpoints the count table: compare results
    val lr = Seq((1L, 1L, 0L), (2L, 1L, 1L)).toDF("dur", "ev", "arm")
    lr.logRank("dur", "ev", "arm").collect().toSeq shouldBe
      graft.operators.Survival.logRank(lr, "dur", "ev", "arm")
        .collect().toSeq
  }

  test("event ops facade delegates to the verified operators") {
    val ev = Seq((1L, 0L), (1L, 30L), (1L, 5000L)).toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    ev.sessionize("user_id", "ts", 3600).queryExecution.analyzed
      .sameResult(Sessionize.sessions(ev, "user_id", "ts", 3600)
        .queryExecution.analyzed) shouldBe true
    ev.sessionize("user_id", "ts", 3600).count() shouldBe 2L
  }

  test("round-12 facade methods produce the same plans as direct calls") {
    import graft.operators.{Bootstrap, Hypothesis, Metrics, Pareto, SeriesTests}
    val series = Seq(("g", 1L, 10L), ("g", 2L, 12L), ("g", 3L, 9L))
      .toDF("g", "o", "y")
    series.ljungBox("g", "o", "y", 2).queryExecution.analyzed
      .sameResult(SeriesTests.ljungBox(series, "g", "o", "y", 2)
        .queryExecution.analyzed) shouldBe true
    series.pettitt("g", "o", "y").queryExecution.analyzed
      .sameResult(SeriesTests.pettitt(series, "g", "o", "y")
        .queryExecution.analyzed) shouldBe true
    val vals = Seq(("g", "a", 1L, 2.0), ("g", "b", 2L, 3.0))
      .toDF("g", "arm", "k", "x")
    vals.levene("g", "arm", "x").queryExecution.analyzed
      .sameResult(Hypothesis.levene(vals, "g", "arm", "x")
        .queryExecution.analyzed) shouldBe true
    vals.poissonBootstrapMean("g", "k", "x").queryExecution.analyzed
      .sameResult(Bootstrap.poissonBootstrapMean(vals, "g", "k", "x")
        .queryExecution.analyzed) shouldBe true
    vals.meanExcess("g", "x", Seq(1.0)).queryExecution.analyzed
      .sameResult(Pareto.meanExcess(vals, "g", "x", Seq(1.0))
        .queryExecution.analyzed) shouldBe true
    val pv = Seq(("f", "h", 0.01)).toDF("f", "k", "p")
    pv.multipleTesting("f", "k", "p").queryExecution.analyzed
      .sameResult(Hypothesis.multipleTesting(pv, "f", "k", "p")
        .queryExecution.analyzed) shouldBe true
    // (kendallsW/theilU/weightedKappa localCheckpoint internally —
    // each call pins a fresh RDD, so plan equality cannot hold;
    // their delegation is 1:1 like every other method here)
    val et = Seq(("g", "a", 1.0)).toDF("g", "v", "x")
    et.etaSquared("g", "v", "x").queryExecution.analyzed
      .sameResult(graft.operators.Profile.etaSquared(et, "g", "v", "x")
        .queryExecution.analyzed) shouldBe true
  }
}
