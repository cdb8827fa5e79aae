package graft

import graft.operators.{Components, CurationPipeline, Dedup, SnapshotPipeline}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke: run the headline pipelines at replay-generated volumes
  * well past the test scale factors (no input files needed) and print
  * wall-clock per stage. Usage:
  *   runMain graft.ScaleSmoke [rows] [stageSubstring...]
  * — with stage substrings, only stages whose name contains one of
  * them run (the text chains always pay the docs-parquet write).
  *
  * This is the "would it survive 100x" probe: the snapshot chain and
  * dedup operators must scale linearly in rows with stable plans —
  * any superlinear blowup here is a red flag before it becomes one on
  * a cluster.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // every smoke temp dir (docs corpus parquet + the streaming state
    // stores) is recorded here and drained before spark.stop() — the
    // same /tmp pile-up class Bench/Verify's drainInvocationStateDirs
    // hook prevents; ~15 dirs per run would otherwise accumulate on
    // the box across rounds
    val smokeTmpDirs = scala.collection.mutable.ArrayBuffer.empty[String]
    def smokeTmp(prefix: String, suffix: String): String = {
      val parent = java.nio.file.Files.createTempDirectory(prefix).toString
      smokeTmpDirs += parent
      parent + suffix
    }

    def events(n: Long) = spark.read.format("graft.sources.ReplaySource")
      .option("rows", n).option("partitions", cpus.toInt * 4)
      .option("seed", 7).load()

    val only = args.drop(1)
    def willRun(name: String): Boolean = only.isEmpty || only.exists(name.contains)
    // force = a prerequisite stage (docs write, state build) that must
    // run whenever a selected stage depends on its side effect
    def time(name: String, force: Boolean = false)(f: => Long): Unit =
      if (force || willRun(name)) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n%,d")
      }

    var ccStatePath: String = null
    println(s"=== scale smoke at $rows rows, local[$cpus] ===")
    time("generate+count") { events(rows).count() }
    time("snapshot chain (proc+curate)") {
      SnapshotPipeline.curateEvents(
        SnapshotPipeline.processEvents(events(rows))).count()
    }
    time("popularity + topk") {
      SnapshotPipeline.popularity(
        SnapshotPipeline.curateEvents(
          SnapshotPipeline.processEvents(events(rows)))).count()
    }
    time("exact dedup clusters") {
      Dedup.exactClusters(
        events(rows).select(col("event_id").as("doc_id"),
          concat_ws(" ", col("event_type"), col("props"), (col("user_id") % 5000)).as("text")),
        "text", "doc_id").count()
    }
    time("keep-first window dedup") {
      Dedup.keepFirst(events(rows), Seq("user_id"), Seq(col("event_id").asc)).count()
    }

    // the shape/budget transforms: all running-window ops partitioned by
    // a shard/group key — the probe checks the windows stay shard-
    // parallel (wall ~ rows/cores) with no single-partition collapse
    time("shuffle rank (global order)") {
      val ranked = operators.Sampling.shuffleRank(
        events(rows).select(col("event_id").as("id")), "id")
      // contiguity at scale: max rank + 1 == row count
      val mx = ranked.agg(max("shuffle_rank"), count(lit(1))).collect()(0)
      require(mx.getLong(0) + 1 == mx.getLong(1),
        s"rank not contiguous: max=${mx.getLong(0)} n=${mx.getLong(1)}")
      mx.getLong(1)
    }
    time("pack windows (1000 shards)") {
      operators.Packing.packByConcat(
        events(rows).select(col("event_id").as("id"),
          pmod(col("user_id"), lit(1000)).as("shard"),
          (pmod(col("event_id"), lit(180)) + 20).as("n")),
        col("n"), budget = 2048L, shardCol = "shard", orderCol = "id")
        .select("shard", "pack_seq").distinct().count()
    }

    // connected components over planted candidate graphs at edge volumes
    // a 100-TB near-dup pass would emit. Two regimes:
    //  - LSH-like: short chains (id -> id+1 where id%8<5 builds 6-node
    //    paths) — the locally-dense shape real banding produces;
    //    convergence should be a small constant number of rounds.
    //  - adversarial: 1024-node paths — the diameter case pointer
    //    jumping exists for; rounds must stay O(log n), not O(n).
    // localEdgeLimit = 0 forces the distributed loop — the probe
    // measures the 100-TB path, not the driver fast path small graphs
    // would otherwise take
    def ccProbe(name: String, keep: Column): Unit = time(name) {
      val edges = events(rows).select(col("event_id").as("id_a"))
        .filter(keep)
        .select(col("id_a"), (col("id_a") + 1).as("id_b"))
      val labels = Components.connectedComponents(edges, localEdgeLimit = 0L)
      val n = labels.count()
      Components.free(labels)
      println(f"    rounds-to-convergence: ${Components.lastRounds}")
      n
    }
    ccProbe("connected components (6-chains)", pmod(col("id_a"), lit(8)) < 5)
    ccProbe("connected components (1024-paths)", pmod(col("id_a"), lit(1024)) < 1023)

    // incremental maintenance: fold the 6-chain graph into a state
    // table, then bridge batches at two sparsities. Reads are O(state)
    // every tick (node semi-joins don't prune component-partitioned
    // files); the WRITE is what bucket partitioning bounds — and only
    // when touched components number well under nBuckets, else carried
    // co-residents make every bucket dirty. Probe nBuckets is sized
    // accordingly (8192 for a ~7.5M-node state).
    val ccBuckets = sys.env.getOrElse("SPARK_GRAFT_CC_BUCKETS", "8192").toInt
    def bridgeTick(name: String, every: Int): Unit = time(name) {
      val bridges = events(rows).select(col("event_id").as("id_a"))
        .filter(pmod(col("id_a"), lit(every)) === 5)
        .select(col("id_a"), (col("id_a") + 3).as("id_b"))
      graft.streaming.StreamingComponents.acceptEdges(
        bridges, ccStatePath, nBuckets = ccBuckets).count()
    }
    // stage names declared once and shared by the force lists and the
    // time() calls — a renamed stage cannot silently drop out of the
    // prerequisite forcing
    val tick1 = "streaming components tick 1 (build)"
    val tick2 = "streaming components tick 2 (12% touched)"
    val tick3 = "streaming components tick 3 (0.01% touched)"
    // the build tick must run whenever a bridge tick is selected — the
    // later ticks fold into the state table it creates
    val anyTick = Seq(tick1, tick2, tick3).exists(willRun)
    time(tick1, force = anyTick) {
      val ccState = smokeTmp("graft_smoke_cc", "/components")
      ccStatePath = ccState
      val chains = events(rows).select(col("event_id").as("id_a"))
        .filter(pmod(col("id_a"), lit(8)) < 5)
        .select(col("id_a"), (col("id_a") + 1).as("id_b"))
      graft.streaming.StreamingComponents.acceptEdges(
        chains, ccState, nBuckets = ccBuckets).count()
    }
    bridgeTick(tick2, 128)
    bridgeTick(tick3, 131072)

    // Synthetic English-ish documents for the text chains: 24 words, every
    // 4th a stopword (ratio 0.25 -> passes the quality + LID gates), the
    // rest drawn from a 20,000-word synthetic vocabulary ("w<k>") so the
    // shingle space is corpus-like — a tiny vocab makes every MinHash
    // bucket collide and the candidate stage quadratic, which benchmarks
    // the degenerate input, not the operator. Groups of 4 consecutive ids
    // share a seed and differ only in the final word — planted near-dup
    // clusters, so banding has real work and a known answer shape.
    def docs(n: Long) = {
      val stops = array(Seq("the", "of", "and", "is", "to", "in", "a",
        "for", "on", "with").map(lit): _*)
      val seed = floor(col("event_id") / 4).cast("long")
      def content(k: Column) = concat(lit("w"), pmod(k, lit(20000)))
      val words = (0 until 23).map { i =>
        if (i % 4 == 0) element_at(stops, (pmod(hash(seed, lit(i)), lit(10)) + 1).cast("int"))
        else content(hash(seed, lit(i)))
      } :+ content(pmod(col("event_id"), lit(4)))
      events(n).select(col("event_id").as("doc_id"),
        concat_ws(" ", words: _*).as("text"))
    }

    // Materialize the synthetic docs to parquet and run the text chains
    // off the file — like a real corpus, where `text` is a plain column.
    // Feeding the generator expression directly inlines its 24-term
    // concat into every gate predicate that references text (~10 copies)
    // and blows the 64 KB generated-method limit, silently dropping the
    // gate stages out of codegen — benchmarking the fallback
    // interpreter, not the operator.
    val simhashStage = "simhash banded pairs"
    val tfidfStage = "tfidf top terms"
    val spansStage = "duplicate spans"
    val curationStage = "curation pipeline (no audit)"
    val screenStage = "streaming curation screen"
    val paraStage = "paragraph dedup + reassembly"
    val lmStage = "unigram lm score"
    val bpeStage = "bpe pair stats"
    val lineDupStage = "line dup screens"
    val noveltyStage = "gram novelty"
    val decontStage = "streaming screen + decontamination"
    val docsPath = smokeTmp("graft_smoke_docs", "/docs")
    // the docs write must run whenever any text-chain stage is
    // selected — they all read the parquet it produces
    val docsWrite = "write documents parquet"
    val winnowStage = "winnowing fingerprint pairs"
    val prefixStage = "prefix-filter join (3-shingles)"
    val ksStage = "ks drift by source"
    val phraseStage = "phrase search (stopword posting)"
    val coverageStage = "greedy coverage (3 rounds)"
    val textStages = Seq(docsWrite, simhashStage, tfidfStage, spansStage,
      curationStage, screenStage, paraStage, lmStage, bpeStage,
      lineDupStage, noveltyStage, decontStage, winnowStage, prefixStage,
      ksStage, phraseStage, coverageStage)
    val anyText = textStages.exists(willRun)
    time(docsWrite, force = anyText) {
      docs(rows).write.mode("overwrite").parquet(docsPath); rows
    }
    def docsPq = spark.read.parquet(docsPath)

    time(simhashStage) {
      Dedup.simhashPairs(docsPq, "text", "doc_id", maxHamming = 3).count()
    }
    // corpus-statistics chains: ~24 tokens/doc -> ~240M (doc, term)
    // rows through the tf aggregate / span aggregate; both must stay
    // hash-aggregated with map-side combine (no sort, no hot-key
    // window) for wall to track rows/cores
    time(tfidfStage) {
      operators.TfIdf.topTerms(docsPq, "text", "doc_id", k = 3).count()
    }
    time(spansStage) {
      Dedup.dupSpans(docsPq, "text", "doc_id", n = 5, minDocs = 2).count()
    }
    // worst-case duplicate factor: every token is a "paragraph", so the
    // winner aggregate sees ~24x rows collapsing to a ~20k-row winner
    // set — the boilerplate-blowup shape the min(struct) aggregation
    // exists for (a row_number window would pin each hot paragraph on
    // one task)
    time(paraStage) {
      Dedup.dedupParagraphs(docsPq, "text", "doc_id", sep = " ").count()
    }
    // ~24 tokens/doc through the count-table join and per-doc mean —
    // the hot term ("the"-class tokens in every doc) rides the
    // AQE-splittable join, not a window
    time(lmStage) {
      operators.TfIdf.lmScore(docsPq, "text", "doc_id").count()
    }
    // vocabulary-bounded: pair counting touches ~20k distinct words
    // regardless of corpus rows
    time(bpeStage) {
      operators.Bpe.pairStats(docsPq, "text", k = 30).count()
    }
    // per-row native expression: must run at scan speed — the filter
    // references the struct so the projection can't be pruned away by
    // the count
    time(lineDupStage) {
      docsPq.select(graft.expressions.GraftFunctions.lineDupStats(
          regexp_replace(col("text"), " +", "\n")).as("st"))
        .filter(col("st.n_lines") >= 0).count()
    }
    // document-frequency join over distinct trigrams (~22 grams/doc →
    // ~220M (doc, gram) rows through the df aggregate and back through
    // the join); hot grams ride the AQE-splittable equi-join
    time(noveltyStage) {
      val g = docsPq.select(col("doc_id"),
        explode(graft.expressions.GraftFunctions
          .distinctWordShingles(col("text"), 3)).as("g"))
      val dfreq = g.groupBy("g").agg(count(lit(1)).as("df"))
      g.join(dfreq, "g").groupBy("doc_id")
        .agg(sum(when(col("df") === 1, 1L).otherwise(0L)).as("u")).count()
    }
    time(curationStage) {
      val r = CurationPipeline.run(docsPq, "text", "doc_id", withAudit = false)
      val n = r.kept.count(); r.unpersist(); n
    }
    // the stateful streaming screen: half the corpus as "already
    // accepted" state, the other half screened against it — the shape
    // of an incremental ingest tick at scale (state tables + anti-joins
    // + band screen, not just the stateless pipeline above)
    time(screenStage) {
      val state = smokeTmp("graft_smoke_state", "/state")
      val half = rows / 2
      graft.streaming.StreamingCuration.acceptBatch(
        docsPq.filter(col("doc_id") < half), "text", "doc_id", state).count()
      graft.streaming.StreamingCuration.acceptBatch(
        docsPq.filter(col("doc_id") >= half), "text", "doc_id", state).count()
    }
    // the screen with the decontamination stage ARMED: 0.1% of docs
    // play the benchmark; the per-batch cost over the inert screen is
    // the gram explode + broadcast join — the number that says what
    // arming decontamination costs an ingest tick
    time(decontStage) {
      val state = smokeTmp("graft_smoke_decont", "/state")
      graft.streaming.StreamingCuration.registerEvalSet(
        docsPq.filter(col("doc_id") % 1000 === 0), "text", state, n = 5)
      val half = rows / 2
      graft.streaming.StreamingCuration.acceptBatch(
        docsPq.filter(col("doc_id") < half && col("doc_id") % 1000 =!= 0),
        "text", "doc_id", state).count()
      graft.streaming.StreamingCuration.acceptBatch(
        docsPq.filter(col("doc_id") >= half && col("doc_id") % 1000 =!= 0),
        "text", "doc_id", state).count()
    }
    // round-9 operators at volume. Winnowing: the planted 4-doc groups
    // share 23 of 24 words -> long shared substrings guarantee shared
    // selected fingerprints; the maxDf cap is what keeps the ubiquitous
    // stopword-window fingerprints from going quadratic
    time(winnowStage) {
      Dedup.winnowedPairs(docsPq, "text", "doc_id",
        k = 8, w = 4, minShared = 2, maxDf = 20).count()
    }
    // exact-complete prefix join over 3-shingle sets: the 20k-word
    // vocabulary keeps shingle postings sparse (the q143 lesson — raw
    // tokens on a tiny vocab make the TRUE output quadratic)
    time(prefixStage) {
      Dedup.prefixFilterPairs(docsPq, "text", "doc_id",
        minJaccard = 0.5, shingleN = 3).count()
    }
    // phrase search with a STOPWORD first term — the worst-case common
    // posting (~0.6 rows/doc) joined against a rare second term; cost
    // must track the stop posting linearly, never the posting space
    time(phraseStage) {
      operators.TextIndex.phraseMatches(docsPq, "text", "doc_id",
        "the w0").count()
    }
    // greedy coverage, 3 rounds: the (doc, shingle) table computes
    // once; each round is one broadcast anti-join + hash agg +
    // TakeOrdered(1) — k-rounds driver shape, linear per round
    time(coverageStage) {
      operators.Selection.greedyCoverage(docsPq, "text", "doc_id",
        k = 3, shingleN = 3).count()
    }
    // value-compressed fuzzy match: 40x40 synthetic two-word names over
    // n rows (duplication factor n/1600) — cost must track DISTINCT
    // names, not rows (the q144 lesson)
    time("fuzzy nearest match") {
      val names = events(rows).select(col("event_id").as("id"),
        concat(lit("w"), pmod(col("user_id"), lit(40)), lit(" x"),
          pmod(col("event_id"), lit(40))).as("name"))
      operators.FuzzyJoin.nearestMatch(names, "name", "id", maxDist = 3)
        .count()
    }
    // CDC compaction: one key-partitioned window over the full log
    time("cdc compaction") {
      operators.Relational.cdcCompact(events(rows), "user_id",
        Seq(col("ts"), col("event_id")),
        col("event_type") === "purchase").count()
    }
    // round-9 second-session operators at volume.
    // k-core over a random graph (mean degree ~4): per-round cost must
    // track edges linearly — degree agg + two semi-joins, no blowup
    time("kcore peeling (4 rounds)") {
      val m = rows / 2
      val edges = events(rows).select(
        pmod(col("event_id") * 31L + 7L, lit(m)).as("id_a"),
        pmod(col("user_id") * 131L + col("event_id"), lit(m)).as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
      operators.KCore.kcore(edges, "id_a", "id_b", k = 2, rounds = 4).count()
    }
    // binless KS: the broadcast histogram is bounded by DISTINCT
    // token-length values — invariant to row count by construction
    time(ksStage) {
      operators.Profile.ksByGroup(
        docsPq.select(pmod(col("doc_id"), lit(7)).as("source"),
          graft.functions.TextFns.bpeishTokenCount(col("text")).as("v")),
        "v", "source").count()
    }
    // dominant direction at rows/10 vectors x 64 dims: the O(n·d²)
    // outer-product aggregate is the inherent covariance cost (the
    // documented scale remedy is fitting on a sample)
    time("dominant direction (n/10 x 64d)") {
      val vecs = events(rows / 10).select(
        transform(sequence(lit(1), lit(64)),
          i => pmod(hash(col("event_id"), i), lit(1000)).cast("double")
            / 500.0 - 1.0).as("embedding"))
      operators.Pca.dominantDirection(vecs, "embedding", dims = 64).count()
    }
    // round-9 continuation operators at volume.
    // basket affinity: 8-item baskets over a 50k-item vocabulary —
    // per-basket pair expansion is <= 28 pairs/basket by construction,
    // so cost must track baskets linearly (the per-basket bound is the
    // operator's whole scale contract)
    time("basket affinity (8-item baskets)") {
      operators.Basket.pairAffinity(
        events(rows).select((col("event_id") / 8L).cast("long").as("basket"),
          pmod(hash(col("event_id")), lit(50000)).as("item")),
        "basket", "item", minPairs = 2L).count()
    }
    // bipartite HITS, 2 rounds: per round two edge-join shuffles + two
    // hash aggregates + two one-row max attachments — linear in edges
    time("bipartite hits (2 rounds)") {
      operators.Hits.bipartiteHits(
        events(rows).select(pmod(col("user_id"), lit(rows / 100)).as("h"),
          pmod(hash(col("event_id")), lit(rows / 100)).as("a")),
        "h", "a", iterations = 2).count()
    }
    // local clustering over a random graph (mean degree ~4): wedge
    // volume is sum(deg^2)/2 — bounded degrees keep it linear. Edges
    // are canonicalized (a<b, distinct) per Triangles' input contract
    time("local clustering (mean deg 4)") {
      val m = rows / 2
      val raw = events(rows).select(
        pmod(col("event_id") * 31L + 7L, lit(m)).as("x"),
        pmod(col("user_id") * 131L + col("event_id"), lit(m)).as("y"))
        .filter(col("x") =!= col("y"))
      val edges = raw.select(least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b")).distinct()
      operators.Triangles.localClusteringBp(edges, "id_a", "id_b").count()
    }
    // CUSUM change-point: one hash aggregate to (group, day) counts,
    // then windows over the DAY-bounded series — cost is the one
    // row-scale aggregate, the rest is 150x20 rows
    time("cusum change-point (150 days x 20 groups)") {
      operators.Profile.cusumChangePoint(
        events(rows).select(pmod(hash(col("user_id")), lit(20)).as("g"),
          date_add(lit("2024-01-01").cast("date"),
            pmod(col("event_id"), lit(150)).cast("int")).as("day")),
        "g", "day").count()
    }
    // cohort LTV: one keyed first-purchase aggregate + one equi-join +
    // the months^2-bounded matrix aggregate
    time("cohort ltv (n/100 users, 24 months)") {
      operators.Cohorts.cohortLtv(
        events(rows).select(pmod(col("user_id"), lit(rows / 100)).as("u"),
          date_add(lit("2023-01-01").cast("date"),
            pmod(hash(col("event_id")), lit(720)).cast("int")).as("day"),
          pmod(hash(col("event_id"), lit(7)), lit(100000))
            .cast("decimal(18,2)").as("amt")),
        "u", "day", "amt").count()
    }
    // BFS 3 layers over a random graph (mean degree ~4) from a 1%
    // seed cohort: per round one frontier join + distinct + anti-join
    // — frontier growth, not corpus size, drives each round
    time("bfs layers (depth 3, 1% seeds)") {
      val m = rows / 2
      val ed = events(rows).select(
        pmod(col("event_id") * 31L + 7L, lit(m)).as("id_a"),
        pmod(col("user_id") * 131L + col("event_id"), lit(m)).as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
      val sd = spark.range(m / 100).select((col("id") * 100L).as("n"))
      operators.Bfs.layers(ed, "id_a", "id_b", sd, "n", maxDepth = 3)
        .count()
    }
    // PPS sampling: one hash-order bucketing pass + bucketed prefix —
    // cost is the single aggregate over n weighted rows
    time("pps sample (1k of n rows)") {
      operators.Sampling.ppsSample(
        events(rows).select(col("event_id").as("k"),
          (pmod(hash(col("event_id")), lit(500)) + 1).cast("long").as("w")),
        "k", "w", n = 1000L).count()
    }
    // ABC classification: one hash aggregate to n/100 key totals,
    // then the bucketed DESC prefix — driver holds only bucket
    // offsets, so cost tracks the aggregate linearly
    time("abc classification (n/100 keys)") {
      operators.Pareto.abcClassification(
        events(rows).select(pmod(col("user_id"), lit(rows / 100)).as("k"),
          (pmod(hash(col("event_id")), lit(100000)).cast("double") / 100.0)
            .as("v")),
        "k", "v", bucketWidth = 256.0).count()
    }
    // round-10 operators at volume.
    // Kaplan–Meier: n observations collapse to <= 5000 distinct
    // durations in ONE hash aggregate; both global prefix phases are
    // bucketed (the driver holds ~80 offsets at bucketWidth 64), so
    // cost tracks rows linearly with a constant curve-table tail
    time("kaplan-meier churn (5k durations)") {
      operators.Survival.kaplanMeier(
        events(rows).select(
          pmod(hash(col("event_id")), lit(5000)).cast("long").as("dur"),
          pmod(col("event_id"), lit(2)).cast("long").as("ev")),
        "dur", "ev", bucketWidth = 64L).count()
    }
    // Nelson–Aalen on the same synthetic durations: identical two-phase
    // machinery with the additive d/n contribution — cost must match
    // the KM stage (the shared riskWithCumsum path)
    time("nelson-aalen hazard (5k durations)") {
      operators.Survival.nelsonAalen(
        events(rows).select(
          pmod(hash(col("event_id")), lit(5000)).cast("long").as("dur"),
          pmod(col("event_id"), lit(2)).cast("long").as("ev")),
        "dur", "ev", bucketWidth = 64L).count()
    }
    // streaming survival: two half-batches of observations merged into
    // duration-bounded state (<= 5000 rows regardless of stream
    // volume), then the live KM curve derived from the state
    time("streaming survival (2 batches + km view)") {
      val st = smokeTmp("graft_smoke_ssurv", "/state")
      val ob = events(rows).select(
        pmod(hash(col("event_id")), lit(5000)).cast("long").as("dur"),
        pmod(col("event_id"), lit(2)).cast("long").as("ev"),
        pmod(col("user_id"), lit(2)).as("half"))
      streaming.StreamingSurvival.acceptBatch(
        ob.filter(col("half") === 0), "dur", "ev", st)
      val merged = streaming.StreamingSurvival.mergeBatch(
        ob.filter(col("half") === 1), "dur", "ev", st)
      streaming.StreamingSurvival.kmView(merged, bucketWidth = 64L).count()
    }
    // association rules: pairAffinity's per-basket bounded expansion
    // plus a 2-element struct explode per pair — must track the basket
    // affinity stage with a constant factor, never a second pipeline
    // pass (the union-of-projections trap)
    time("association rules (8-item baskets)") {
      operators.Basket.associationRules(
        events(rows).select((col("event_id") / 8L).cast("long").as("basket"),
          pmod(hash(col("event_id")), lit(50000)).as("item")),
        "basket", "item", minPairs = 2L).count()
    }
    // streaming k-anonymity: two half-batches merged into state over a
    // 100k quasi-class vocabulary — per batch one hash aggregate plus
    // one full-outer merge bounded by the CLASS vocabulary, never by
    // stream volume; the gate read is the counts-of-counts tail
    time("streaming k-anonymity (2 batches)") {
      val st = smokeTmp("graft_smoke_skanon", "/state")
      val ev = events(rows).select(
        pmod(hash(col("user_id")), lit(1000)).as("q1"),
        pmod(hash(col("event_id")), lit(100)).as("q2"))
      streaming.StreamingKAnonymity.acceptBatch(
        ev.filter(col("q2") < 50), Seq("q1", "q2"), st)
      val merged = streaming.StreamingKAnonymity.mergeBatch(
        ev.filter(col("q2") >= 50), Seq("q1", "q2"), st)
      streaming.StreamingKAnonymity.kAnonymityView(merged, k = 10L).count()
    }
    // round-10 second-wave operators at volume.
    // rank metrics: n rows collapse to <= 100k distinct scores in one
    // hash aggregate; the bucketed prefix holds ~6k driver offsets at
    // bucketWidth 16 — cost must track rows with a constant rank tail
    time("rank auc + gains (100k scores)") {
      val scored = events(rows).select(
        col("event_id").as("id"),
        (pmod(hash(col("event_id")), lit(100000)).cast("double") / 100.0)
          .as("s"),
        pmod(col("event_id"), lit(5)).cast("long").as("lab"))
      operators.Metrics.rankAuc(scored, "s", "lab", bucketWidth = 16.0)
        .count() +
        operators.Metrics.gainsTable(scored, "s", "id", "lab",
          tiles = 10, bucketWidth = 16.0).count()
    }
    // markov transitions: one window pass over n/100-user day
    // sequences, then two vocabulary-bounded aggregates
    time("markov transitions (n/100 groups)") {
      operators.Markov.transitions(
        events(rows).select(pmod(col("user_id"), lit(rows / 100)).as("g"),
          col("event_id").as("o"),
          concat(lit("t"), pmod(col("event_id"), lit(12))).as("t")),
        Seq("g"), Seq("o"), "t").count()
    }
    // contingency statistics: the row-scale pass is ONE (a, b) cell
    // aggregate (100 x 50 grid); everything after is grid-sized
    time("chi-square + mutual info (100x50)") {
      val cat = events(rows).select(
        concat(lit("a"), pmod(hash(col("event_id")), lit(100))).as("ca"),
        concat(lit("b"), pmod(hash(col("user_id")), lit(50))).as("cb"))
      operators.Profile.chiSquare(cat, "ca", "cb").count() +
        operators.Profile.mutualInfo(cat, "ca", "cb").count()
    }
    // FD strength: kAnonymity's two-aggregate economics over n/200
    // determinant tuples
    time("fd strength (n/200 determinants)") {
      operators.Audit.fdStrength(
        events(rows).select(pmod(col("user_id"), lit(rows / 200)).as("det"),
          pmod(hash(col("event_id")), lit(7)).as("dep")),
        Seq("det"), "dep").count()
    }
    // Zipf fit: one corpus-scale token count (3 tokens/row, 30k-term
    // vocabulary), then the K-row rank join and a 5-sum aggregate
    time("zipf fit (top-200 of 30k terms)") {
      operators.TfIdf.zipfFit(
        events(rows).select(concat_ws(" ",
          concat(lit("t"), pmod(hash(col("event_id")), lit(30000))),
          concat(lit("t"), pmod(hash(col("user_id")), lit(3000))),
          concat(lit("t"), pmod(col("event_id"), lit(300)))).as("text")),
        "text", topK = 200).count()
    }
    // deterministic weighted sample: scan-resident scores into one
    // distributed TakeOrdered(1000) — no shuffle beyond top-n
    time("weighted sample (1k of n rows)") {
      operators.Sampling.weightedSample(
        events(rows).select(col("event_id").as("k"),
          (pmod(hash(col("event_id")), lit(100)) + 1).cast("long").as("w")),
        "k", "w", n = 1000).count()
    }
    // decayed leaderboard: decay in the scan projection, one hash
    // aggregate on n/100 keys, one-row max-ts broadcast
    time("decayed scores (n/100 keys)") {
      operators.Resample.decayedScores(
        events(rows).select(pmod(col("user_id"), lit(rows / 100)).as("k"),
          col("ts"), col("value")),
        "k", "ts", "value", halfLifeDays = 7.0).count()
    }
    // Theil-Sen: n rows pre-aggregate to 20 groups x 150 days; the
    // pair join is day-bounded (11k pairs/group), never row-quadratic
    time("theil-sen (20 groups x 150 days)") {
      operators.Resample.theilSen(
        events(rows)
          .groupBy(pmod(hash(col("user_id")), lit(20)).as("g"),
            pmod(col("event_id"), lit(150)).as("x"))
          .agg(count(lit(1)).cast("long").as("y")),
        "g", "x", "y").count()
    }
    // streaming funnel: two half-batches min-merged into (user, step)
    // state over n/100 users; the card reads state only
    time("streaming funnel (2 batches)") {
      val st = smokeTmp("graft_smoke_sfunnel", "/state")
      val steps = Seq("s0", "s1", "s2")
      val ev = events(rows).select(
        pmod(col("user_id"), lit(rows / 100)).as("u"), col("ts"),
        concat(lit("s"), pmod(col("event_id"), lit(4))).as("t"),
        pmod(col("event_id"), lit(2)).as("half"))
      streaming.StreamingFunnel.acceptBatch(
        ev.filter(col("half") === 0), "u", "ts", "t", steps, st)
      val merged = streaming.StreamingFunnel.mergeBatch(
        ev.filter(col("half") === 1), "u", "ts", "t", steps, st)
      streaming.StreamingFunnel.funnelView(merged, steps).count()
    }
    // exact global quantiles: two keys-only passes (count + filtered
    // rank) over n values — the 100-TB path percentile() cannot take
    time("exact quantiles (3 cuts)") {
      operators.Metrics.exactQuantiles(
        events(rows).select(col("value")),
        "value", Seq(0.5, 0.95, 0.99), bucketWidth = 16.0).count()
    }
    // streaming retention: two half-batches of (user, week) presence
    // merged into key-bounded state (n/200 users x 52 weeks); the card
    // read is two aggregates over the reduced state
    time("streaming retention (2 batches)") {
      val st = smokeTmp("graft_smoke_sret", "/state")
      val ev = events(rows).select(
        pmod(col("user_id"), lit(rows / 200)).as("u"), col("ts"),
        pmod(col("event_id"), lit(2)).as("half"))
      streaming.StreamingRetention.acceptBatch(
        ev.filter(col("half") === 0), "u", "ts", st)
      val merged = streaming.StreamingRetention.mergeBatch(
        ev.filter(col("half") === 1), "u", "ts", st)
      streaming.StreamingRetention.retentionView(merged).count()
    }
    // trailing deviation: one partitioned window over the 2k-group x
    // 150-day pre-aggregated series
    time("trailing deviation (2k groups)") {
      operators.Resample.trailingDeviation(
        events(rows)
          .groupBy(pmod(hash(col("user_id")), lit(2000)).as("g"),
            pmod(col("event_id"), lit(150)).as("d"))
          .agg(count(lit(1)).cast("long").as("c")),
        "g", "d", "c", window = 7).count()
    }
    // negative sampling: distinct positives, k-way literal explode,
    // one anti equi-join on (user, candidate)
    time("negative samples (k=2)") {
      val posPairs = events(rows).select(
        pmod(col("user_id"), lit(rows / 100)).as("u"),
        pmod(hash(col("event_id")), lit(100000)).as("i"))
      val dim = events(rows).filter(col("event_id") < 1000)
        .select((pmod(col("event_id"), lit(100000)) + 1).as("item"))
      operators.Sampling.negativeSamples(posPairs, "u", "i", dim,
        "item", k = 2).count()
    }
    // XYZ classification: one (key, period) aggregate over n rows,
    // then a key-level aggregate — the two-hash-agg economics
    time("xyz classification (n/100 keys)") {
      operators.Pareto.xyzClassification(
        events(rows).select(pmod(col("user_id"), lit(rows / 100)).as("k"),
          pmod(col("event_id"), lit(12)).as("mon"), col("value")),
        "k", "mon", "value").count()
    }
    // rolling actives: the coverage explode is 7x the DISTINCT
    // (user, day) table (n/100 users x ~150 days), never raw events
    time("rolling actives (n/100 users)") {
      operators.Cohorts.rollingActives(
        events(rows).select(pmod(col("user_id"), lit(rows / 100))
          .as("u"), col("ts")),
        "u", "ts", window = 7).count()
    }
    // MMR: k scans of an n/10-row 16-d corpus with all cosines as
    // plan literals — cost = k x (generate + scan), nothing retained
    time("mmr (3 rounds, n/10 vectors)") {
      val vecs = events(rows).filter(pmod(col("event_id"), lit(10)) === 0)
        .select(col("event_id").as("vec_id"),
          array((0 until 16).map(i =>
            (pmod(hash(col("event_id") + i), lit(1000)).cast("float") /
              1000.0f) + 0.001f): _*).as("embedding"))
      operators.Selection.mmr(vecs.filter(col("vec_id") =!= 0),
        vecs.limit(1), "vec_id", "embedding", k = 3).count()
    }
    // HHI: two keys-only hash aggregates (market x firm, then market)
    time("hhi (25 markets, n/100 firms)") {
      operators.Profile.hhi(
        events(rows).select(pmod(col("user_id"), lit(25)).as("m"),
          pmod(col("user_id"), lit(rows / 100)).as("f"), col("value")),
        "m", "f", "value").count()
    }
    // item-item cosine top-k: pairAffinity's per-basket pair bound
    // (~4 items/basket over a 2k-item vocabulary), then one window
    // partitioned by item
    time("cosine topk (n/4 baskets)") {
      operators.Basket.cosineTopK(
        events(rows).select(pmod(col("event_id"), lit(rows / 4)).as("b"),
          pmod(hash(col("event_id")), lit(2000)).as("i")),
        "b", "i", k = 5, minPairs = 2L).count()
    }
    // Wilson lower bound: ONE hash aggregate on the key, then
    // row-local double arithmetic
    time("wilson lower bound (n/100 keys)") {
      operators.Metrics.wilsonLowerBound(
        events(rows).select(pmod(col("user_id"), lit(rows / 100)).as("g"),
          when(pmod(col("event_id"), lit(3)) === 0, 1L).otherwise(0L)
            .as("ok")),
        "g", "ok", minN = 5L).count()
    }
    // cross-correlation: the explode is 15x the PRE-AGGREGATED 1500-day
    // series (never 15x raw events), one equi-join + one hash agg per lag
    time("cross-corr (15 lags, 1500-day series)") {
      val days = events(rows)
        .groupBy(pmod(col("event_id"), lit(1500)).as("d"))
        .agg(count(lit(1)).cast("long").as("v"))
      operators.Resample.crossCorr(days, days, "d", "v", "v",
        maxLag = 7).count()
    }
    // WoE/IV: one hash aggregate on the bin key plus a one-row totals
    // attach — n/1000 bins regardless of row count
    time("woe/iv (n/1000 bins)") {
      operators.Metrics.woeIv(
        events(rows).select(pmod(col("user_id"), lit(rows / 1000))
          .as("bin"),
          when(pmod(col("event_id"), lit(4)) === 0, 1L).otherwise(0L)
            .as("y")),
        "bin", "y").count()
    }
    // p-chart: one hash aggregate on the period key plus the one-row
    // global-rate attach — output = #periods (1500 here)
    time("p-chart (1500 periods)") {
      operators.Audit.pChart(
        events(rows).select(pmod(col("event_id"), lit(1500)).as("per"),
          when(pmod(col("user_id"), lit(5)) === 0, 1L).otherwise(0L)
            .as("bad")),
        "per", "bad").count()
    }
    // gini: one (group, key) hash aggregate, bucket-grain offsets,
    // one group aggregate — n/100 keys across 25 groups
    time("gini (25 groups, n/100 keys)") {
      operators.Pareto.gini(
        events(rows).select(pmod(col("user_id"), lit(25)).as("g"),
          pmod(col("user_id"), lit(rows / 100)).as("k"), col("value")),
        "g", "k", "value").count()
    }
    // two-proportion z: ONE conditional hash aggregate on the key
    time("ab z-test (n/1000 keys)") {
      operators.Metrics.twoProportionZ(
        events(rows).select(pmod(col("user_id"), lit(rows / 1000))
          .as("t"), pmod(col("event_id"), lit(2)).as("arm"),
          when(pmod(col("event_id"), lit(3)) === 0, 1L).otherwise(0L)
            .as("ok")),
        "t", "arm", "ok").count()
    }
    // dispersion index: (key, period) aggregate then key aggregate
    // plus the one-row global-M attach
    time("fano dispersion (n/100 keys)") {
      operators.Profile.dispersionIndex(
        events(rows).select(pmod(col("user_id"), lit(rows / 100)).as("k"),
          pmod(col("event_id"), lit(1500)).as("per")),
        "k", "per").count()
    }
    // log-log OLS: ONE hash aggregate over the pre-aggregated
    // (group, day) series — the ewma feeding contract
    time("elasticity (2k groups)") {
      operators.Resample.logLogSlope(
        events(rows)
          .groupBy(pmod(hash(col("user_id")), lit(2000)).as("g"),
            pmod(col("event_id"), lit(1500)).as("d"))
          .agg((count(lit(1)) + 1L).cast("double").as("x"),
            (sum(col("value").cast("decimal(18,2)")).cast("double")
              + lit(1.0)).as("y"))
          .select(col("g"), col("x"), col("y")),
        "g", "x", "y").count()
    }
    // sweep-line concurrency: one day-keyed delta aggregate over 2n
    // rows, then calendar-grain prefix work
    time("concurrency (1500-day calendar)") {
      operators.Resample.concurrency(
        events(rows).select(pmod(col("event_id"), lit(1500)).as("s"),
          (pmod(col("event_id"), lit(1500)) + 1L +
            pmod(col("user_id"), lit(30))).as("e")),
        "s", "e").count()
    }
    // segment migration: two filtered key aggregates + one full-outer
    // key join + the tiny matrix aggregate
    time("segment migration (n/100 keys)") {
      operators.Cohorts.segmentMigration(
        events(rows).select(pmod(col("user_id"), lit(rows / 100))
          .as("u"), pmod(col("event_id"), lit(1500)).as("d")),
        "u", "d", lit(750L)).count()
    }
    // streaming WoE: two half-batches of per-bin class counts merged
    // into bin-vocabulary-bounded state; the card reads the state only
    time("streaming woe (2 batches)") {
      val st = smokeTmp("graft_smoke_swoe", "/state")
      val ev = events(rows).select(
        pmod(col("user_id"), lit(1000)).as("bin"),
        when(pmod(col("event_id"), lit(3)) === 0, 1L).otherwise(0L)
          .as("y"),
        pmod(col("event_id"), lit(2)).as("half"))
      streaming.StreamingWoe.acceptBatch(
        ev.filter(col("half") === 0), "bin", "y", st)
      val merged = streaming.StreamingWoe.mergeBatch(
        ev.filter(col("half") === 1), "bin", "y", st)
      streaming.StreamingWoe.woeView(merged).count()
    }
    // revenue bridge: one (key, period) aggregate then ONE full-outer
    // shifted self-join at key grain — n/100 keys x 50 periods
    time("revenue bridge (n/100 keys)") {
      operators.Cohorts.revenueBridge(
        events(rows).select(pmod(col("user_id"), lit(rows / 100)).as("k"),
          pmod(col("event_id"), lit(50)).as("mon"), col("value")),
        "k", "mon", "value").count()
    }
    // proximity pairs: 3x explode + one equi-join on (keys, bucket);
    // pair cost bounded by per-cell multiplicity (n/5000 cells)
    time("proximity pairs (n/5000 cells)") {
      operators.FuzzyJoin.proximatePairs(
        events(rows).select(col("event_id").as("id"),
          pmod(hash(col("user_id")), lit(rows / 5000)).as("cell"),
          pmod(col("event_id"), lit(1500)).as("day")),
        Seq("cell"), "id", "day", window = 2L).count()
    }
    // streaming concurrency: two half-batches of day deltas merged
    // into calendar-bounded state; the card reads the state only
    time("streaming concur (2 batches)") {
      val st = smokeTmp("graft_smoke_sconc", "/state")
      val ev = events(rows).select(
        pmod(col("event_id"), lit(1500)).as("s"),
        (pmod(col("event_id"), lit(1500)) + 1L +
          pmod(col("user_id"), lit(30))).as("e"),
        pmod(col("event_id") + col("user_id"), lit(2)).as("half"))
      streaming.StreamingConcurrency.acceptBatch(
        ev.filter(col("half") === 0), "s", "e", st)
      val merged = streaming.StreamingConcurrency.mergeBatch(
        ev.filter(col("half") === 1), "s", "e", st)
      streaming.StreamingConcurrency.concurrencyView(merged).count()
    }
    // streaming A/B: two half-batches of per-key arm counts merged
    // into experiment-bounded state; the card reads the state only
    time("streaming-ab (2 batches)") {
      val st = smokeTmp("graft_smoke_sab", "/state")
      val ev = events(rows).select(
        pmod(col("user_id"), lit(200)).as("t"),
        pmod(col("event_id"), lit(2)).as("arm"),
        when(pmod(col("event_id"), lit(3)) === 0, 1L).otherwise(0L)
          .as("ok"),
        pmod(col("event_id") + col("user_id"), lit(2)).as("half"))
      streaming.StreamingAbTest.acceptBatch(
        ev.filter(col("half") === 0), "t", "arm", "ok", st)
      val merged = streaming.StreamingAbTest.mergeBatch(
        ev.filter(col("half") === 1), "t", "arm", "ok", st)
      streaming.StreamingAbTest.abView(merged, "t").count()
    }
    time("mann-whitney (200 groups)") {
      operators.Hypothesis.mannWhitneyU(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(2)).as("arm"),
          pmod(col("event_id"), lit(1000)).as("v")),
        "g", "arm", "v").count()
    }
    time("cliffs delta (200 groups)") {
      operators.Hypothesis.cliffsDelta(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(2)).as("arm"),
          pmod(col("event_id"), lit(1000)).as("v")),
        "g", "arm", "v").count()
    }
    time("kruskal-wallis (200 groups, 5 arms)") {
      operators.Hypothesis.kruskalWallis(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(5)).as("arm"),
          pmod(col("event_id"), lit(1000)).as("v")),
        "g", "arm", "v").count()
    }
    time("kendall tau (200 groups, 40x40)") {
      operators.Hypothesis.kendallTau(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(40)).as("x"),
          pmod(col("user_id") + col("event_id"), lit(40)).as("y")),
        "g", "x", "y").count()
    }
    time("isotonic calibration (200 groups)") {
      operators.Metrics.isotonicCalibration(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          col("value").cast("double").as("s"),
          pmod(col("event_id"), lit(3)).as("y")),
        "g", "s", "y", binWidth = 25.0).count()
    }
    time("calibration card (200 groups)") {
      operators.Metrics.calibrationCard(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          col("value").cast("double").as("s"),
          pmod(col("event_id"), lit(3)).as("y")),
        "g", "s", "y", binWidth = 25.0).count()
    }
    time("pr curve (5 thresholds)") {
      operators.Metrics.prCurve(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          col("value").cast("double").as("s"),
          pmod(col("event_id"), lit(3)).as("y")),
        "g", "s", "y", Seq(50L, 100L, 200L, 300L, 400L)).count()
    }
    time("exact dup pairs (n/4 dup groups)") {
      // every 4 consecutive ids share a text -> clusters of 4, pairs
      // bounded at 6 per cluster; singletons (none here) pre-filtered
      operators.Dedup.exactDupPairs(
        events(rows).select(col("event_id").as("doc_id"),
          concat_ws(" ", lit("t"), call_function("div", col("event_id"), lit(4L))).as("text")),
        "text", "doc_id").count()
    }
    time("linkage quality (n/20 pairs)") {
      val pred = events(rows).filter(pmod(col("event_id"), lit(20)) === 0)
        .select(col("event_id").as("id_a"),
          (col("event_id") + pmod(col("user_id"), lit(3)) + 1).as("id_b"))
      val truth = events(rows).filter(pmod(col("event_id"), lit(20)) === 0)
        .select(col("event_id").as("id_a"),
          (col("event_id") + 1).as("id_b"))
      operators.Metrics.linkageQuality(pred, truth).count()
    }
    time("reshard churn (32 -> 40)") {
      operators.Packing.reshardChurn(
        events(rows).select(pmod(col("event_id"), lit(rows / 8)).as("k")),
        "k", 32, 40).count()
    }
    time("streaming topk drift (2 batches)") {
      val st = smokeTmp("graft_smoke_stkd", "/state")
      val ev = events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
        pmod(col("event_id"), lit(2)).as("arm"),
        pmod(col("event_id"), lit(5000)).as("key"),
        col("value").cast("double").as("v"), col("event_id"))
      streaming.StreamingTopKDrift.acceptBatch(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        "g", "arm", "key", "v", st)
      val merged = streaming.StreamingTopKDrift.acceptBatch(
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "g", "arm", "key", "v", st)
      streaming.StreamingTopKDrift.driftView(merged, "g", k = 50).count()
    }
    time("next-action entropy (sessions)") {
      operators.Sessionize.nextActionEntropy(events(rows),
        "user_id", "ts", "event_type", "event_id", 3600).count()
    }
    time("burstiness (per user)") {
      operators.Resample.burstiness(events(rows),
        "user_id", "ts", "event_id").count()
    }
    time("streaks (per user)") {
      operators.Sessionize.streaks(events(rows),
        "user_id", "ts", "event_type", "event_id").count()
    }
    time("mcnemar (200 groups)") {
      operators.Hypothesis.mcnemar(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(2)).as("a"),
          pmod(col("event_id") + col("user_id"), lit(2)).as("b")),
        "g", "a", "b").count()
    }
    time("cochran q (200 groups)") {
      operators.Hypothesis.cochranQ(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(2)).as("t1"),
          pmod(col("event_id"), lit(3)).as("t2"),
          pmod(col("event_id") + col("user_id"), lit(2)).as("t3")),
        "g", Seq("t1", "t2", "t3")).count()
    }
    time("cochran-armitage (200 groups)") {
      operators.Hypothesis.cochranArmitage(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(10)).as("w"),
          pmod(col("event_id") + col("user_id"), lit(2)).as("s")),
        "g", "w", "s").count()
    }
    time("effect size (200 groups)") {
      operators.Hypothesis.effectSize(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(2)).as("arm"), col("value")),
        "g", "arm", "value").count()
    }
    time("risk card (200 groups)") {
      operators.Hypothesis.riskCard(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(2)).as("e"),
          pmod(col("event_id") + col("user_id"), lit(2)).as("o")),
        "g", "e", "o").count()
    }
    time("vocab richness (8 sources)") {
      operators.TfIdf.vocabRichness(
        docsPq.select(col("text"),
          pmod(col("doc_id"), lit(8)).cast("string").as("source")),
        "text", "source").count()
    }
    time("rmst (event durations)") {
      operators.Survival.rmst(
        events(rows).select(pmod(col("event_id"), lit(2000)).as("dur"),
          pmod(col("user_id"), lit(2)).as("e")),
        "dur", "e", tau = 1500L, bucketWidth = 256L).count()
    }
    time("friedman (200 groups)") {
      operators.Hypothesis.friedman(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          col("value").as("t1"),
          pmod(col("event_id"), lit(97)).cast("double").as("t2"),
          pmod(col("event_id") + col("user_id"), lit(89)).cast("double")
            .as("t3")),
        "g", Seq("t1", "t2", "t3")).count()
    }
    time("link prediction (capped candidate graph)") {
      operators.Triangles.linkPrediction(
        events(rows)
          .select(pmod(col("event_id"), lit(200000)).as("id_a"),
            (pmod(col("event_id"), lit(200000)) +
              pmod(col("user_id"), lit(50)) + 1L).as("id_b"))
          .distinct(),
        "id_a", "id_b", maxHubDegree = 128L,
        maxCandidates = 100000000L).count()
    }
    time("readability (8 sources)") {
      operators.TfIdf.readability(
        docsPq.select(col("text"),
          pmod(col("doc_id"), lit(8)).cast("string").as("source")),
        "text", "source").count()
    }
    time("theil (200 groups)") {
      operators.Pareto.theil(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          col("value")),
        "g", "value").count()
    }
    time("streaming burstiness (2 ticks)") {
      val st = smokeTmp("graft_smoke_sburst", "/state")
      val ev = events(rows)
      streaming.StreamingBurstiness.acceptBatch(
        ev.filter(col("ts") < lit("2024-01-15").cast("timestamp")),
        "user_id", "ts", "event_id", st)
      streaming.StreamingBurstiness.acceptBatch(
        ev.filter(col("ts") >= lit("2024-01-15").cast("timestamp")),
        "user_id", "ts", "event_id", st).count()
    }
    time("hellinger (200 groups)") {
      operators.Profile.hellinger(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(2)).as("arm"), col("value")),
        "g", "arm", "value").count()
    }
    time("v-measure (200 groups)") {
      operators.Metrics.vMeasure(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(16)).as("c"),
          pmod(col("event_id") + col("user_id"), lit(8)).as("l")),
        "g", "c", "l").count()
    }
    time("hill tail (top 500)") {
      operators.Pareto.hillTail(
        events(rows).select(col("value"), col("event_id")),
        "value", "event_id", k = 500).count()
    }
    time("sprt (200 groups)") {
      operators.Hypothesis.sprt(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(3)).as("y")),
        "g", "y", p0 = 0.25, p1 = 0.35).count()
    }
    time("cmh (200 groups x 8 strata)") {
      operators.Hypothesis.cmh(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(8)).as("st"),
          pmod(col("event_id"), lit(2)).as("e"),
          pmod(col("event_id") + col("user_id"), lit(2)).as("o")),
        "g", "st", "e", "o").count()
    }
    time("mann-kendall (200 daily series)") {
      operators.Hypothesis.mannKendall(
        events(rows)
          .groupBy(pmod(col("user_id"), lit(200)).as("g"),
            call_function("div", col("ts").cast("long"), lit(86400L))
              .as("day"))
          .agg(count(lit(1)).cast("long").as("cnt")),
        "g", "day", "cnt").count()
    }
    time("poisson rate test (200 groups)") {
      operators.Hypothesis.poissonRateTest(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(2)).as("arm")),
        "g", "arm", exposure0 = 1209600L, exposure1 = 1468800L).count()
    }
    time("neyman allocation (200 x 8)") {
      operators.Sampling.neymanAllocation(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(8)).as("st"), col("value")),
        "g", "st", "value", totalN = 1000L).count()
    }
    time("median survival (event durations)") {
      operators.Survival.medianSurvival(
        events(rows).select(pmod(col("event_id"), lit(2000)).as("dur"),
          pmod(col("user_id"), lit(2)).as("e")),
        "dur", "e", bucketWidth = 256L).count()
    }
    time("cramers v (200 groups)") {
      operators.Profile.cramersV(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(8)).as("a"),
          col("event_type").as("b")),
        "g", "a", "b").count()
    }
    time("effective sample size (200 groups)") {
      operators.Sampling.effectiveSampleSize(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(997)).as("w")),
        "g", "w").count()
    }
    time("streaming risk (2 ticks)") {
      val st = smokeTmp("graft_smoke_srisk", "/state")
      val ev = events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
        pmod(col("event_id"), lit(2)).as("e"),
        pmod(col("event_id") + col("user_id"), lit(2)).as("o"),
        col("event_id"))
      streaming.StreamingRisk.acceptBatch(
        ev.filter(pmod(col("event_id"), lit(2)) === 0), "g", "e", "o", st)
      streaming.StreamingRisk.acceptBatch(
        ev.filter(pmod(col("event_id"), lit(2)) === 1), "g", "e", "o", st)
        .count()
    }
    time("qq shift (200 groups)") {
      operators.Metrics.qqShift(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(2)).as("arm"), col("value")),
        "g", "arm", "value", qs = Seq(0.25, 0.5, 0.75)).count()
    }
    time("pearson matrix (200 groups)") {
      operators.Profile.pearsonMatrix(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          col("value").as("v1"),
          pmod(col("event_id"), lit(97)).cast("double").as("v2"),
          pmod(col("event_id") + col("user_id"), lit(89)).cast("double")
            .as("v3")),
        "g", Seq("v1", "v2", "v3")).count()
    }
    time("streaming ess (2 ticks)") {
      val st = smokeTmp("graft_smoke_sess", "/state")
      val ev = events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
        pmod(col("event_id"), lit(997)).as("w"), col("event_id"))
      streaming.StreamingEss.acceptBatch(
        ev.filter(pmod(col("event_id"), lit(2)) === 0), "g", "w", st)
      streaming.StreamingEss.acceptBatch(
        ev.filter(pmod(col("event_id"), lit(2)) === 1), "g", "w", st)
        .count()
    }
    time("partial correlation (200 groups)") {
      operators.Profile.partialCorrelation(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          col("value").as("x"),
          pmod(col("event_id"), lit(97)).cast("double").as("y"),
          pmod(col("event_id"), lit(89)).cast("double").as("z")),
        "g", "x", "y", "z").count()
    }
    time("burrows delta (8 sources)") {
      operators.TfIdf.burrowsDelta(
        docsPq.select(col("text"),
          pmod(col("doc_id"), lit(8)).cast("string").as("source")),
        "text", "source", topK = 50).count()
    }
    time("keyness (8 sources)") {
      operators.TfIdf.keyness(
        docsPq.select(col("text"),
          pmod(col("doc_id"), lit(8)).cast("string").as("source")),
        "text", "source", k = 10).count()
    }
    time("mh odds ratio (200 groups x 8 strata)") {
      operators.Hypothesis.mhOddsRatio(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(8)).as("st"),
          pmod(col("event_id"), lit(2)).as("e"),
          pmod(col("event_id") + col("user_id"), lit(2)).as("o")),
        "g", "st", "e", "o").count()
    }
    time("rbo (200 groups, top 50)") {
      operators.Metrics.rbo(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(2)).as("arm"),
          pmod(col("event_id"), lit(5000)).as("item"), col("value")),
        "g", "arm", "item", "value", k = 50).count()
    }
    time("lexical dispersion (8 sources)") {
      operators.TfIdf.lexicalDispersion(
        docsPq.select(col("text"),
          pmod(col("doc_id"), lit(8)).cast("string").as("source")),
        "text", "source", topK = 50).count()
    }
    time("hour entropy (per user)") {
      operators.Sessionize.hourEntropy(events(rows), "user_id", "ts")
        .count()
    }
    time("weekday seasonality (200 keys)") {
      operators.Resample.weekdaySeasonality(
        events(rows).select(pmod(col("user_id"), lit(200)).as("k"),
          col("ts")),
        "k", "ts").count()
    }
    time("seasonal naive (200 keys)") {
      operators.Resample.seasonalNaiveError(
        events(rows).select(pmod(col("user_id"), lit(200)).as("k"),
          col("ts")),
        "k", "ts").count()
    }
    time("topk drift (200 groups)") {
      operators.Profile.topKDrift(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(2)).as("arm"),
          pmod(col("event_id"), lit(5000)).as("key"),
          col("value").cast("double").as("v")),
        "g", "arm", "key", "v", k = 50).count()
    }
    time("ndcg@10 (200 queries)") {
      operators.Metrics.ndcgAtK(
        events(rows).select(pmod(col("user_id"), lit(200)).as("q"),
          col("value").cast("double").as("s"), col("event_id"),
          pmod(col("event_id"), lit(4)).as("rel")),
        "q", "s", "event_id", "rel", k = 10).count()
    }
    time("mrr (200 groups x 20 queries)") {
      operators.Metrics.meanReciprocalRank(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("user_id"), lit(4000)).as("qq"),
          col("value").cast("double").as("s"), col("event_id"),
          pmod(col("event_id"), lit(7)).as("rel")),
        "g", "qq", "s", "event_id", "rel").count()
    }
    time("fleiss kappa (200 groups, 3 raters)") {
      operators.Metrics.fleissKappa(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          col("event_id").as("i"),
          pmod(col("event_id"), lit(5)).cast("string").as("r1"),
          pmod(col("event_id") + 1, lit(5)).cast("string").as("r2"),
          pmod(col("event_id") + col("user_id"), lit(5)).cast("string")
            .as("r3")),
        "g", "i", Seq("r1", "r2", "r3")).count()
    }
    time("cohens kappa (200 groups)") {
      operators.Metrics.cohensKappa(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(5)).cast("string").as("a"),
          pmod(col("event_id") + col("user_id"), lit(5)).cast("string")
            .as("b")),
        "g", "a", "b").count()
    }
    time("wasserstein (200 groups)") {
      operators.Profile.wasserstein1d(
        events(rows).select(pmod(col("user_id"), lit(200)).as("g"),
          pmod(col("event_id"), lit(2)).as("arm"),
          pmod(col("event_id"), lit(1000)).cast("double").as("v")),
        "g", "arm", "v").count()
    }
    time("personalized pagerank (4 rounds)") {
      val prs = events(rows)
        .select(pmod(col("event_id"), lit(rows / 4)).as("id_a"),
          pmod(col("event_id") * 31 + col("user_id"), lit(rows / 4))
            .as("id_b"))
        .filter(col("id_a") =!= col("id_b")).limit(2000000)
      operators.PageRank.personalizedRanks(prs,
        events(rows).select(pmod(col("event_id"), lit(100)).as("node"))
          .limit(50),
        iterations = 4).count()
    }
    time("lloyd ivf (2 rounds, n/10 vectors)") {
      val vecs = events(rows).filter(pmod(col("event_id"), lit(10)) === 0)
        .select(col("event_id").as("vec_id"),
          array((0 until 16).map(i =>
            (pmod(hash(col("event_id") + i), lit(1000)).cast("float") /
              1000.0f) + 0.001f): _*).as("embedding"))
      operators.Similarity.sphericalLloydIvfTopK(
        vecs.filter(col("vec_id") < 100), vecs, "vec_id", "embedding",
        k = 3, nCells = 16, nprobe = 2, iters = 2).count()
    }
    time("logrank (3000 durations)") {
      operators.Survival.logRank(
        events(rows).select(pmod(col("event_id"), lit(3000)).as("dur"),
          when(pmod(col("event_id"), lit(3)) === 0, 1L).otherwise(0L)
            .as("ev"),
          pmod(col("user_id"), lit(2)).as("arm")),
        "dur", "ev", "arm", bucketWidth = 256L).count()
    }
    smokeTmpDirs.foreach { dir =>
      // NonFatal only (an InterruptedException must still cancel);
      // failures print so a dead cleanup cannot go unseen
      try graft.sources.PathIO.deleteDir(spark, dir)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[smoke] temp-dir cleanup failed for $dir: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
