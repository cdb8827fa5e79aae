package graft.api

import graft.operators._
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}

/** Fluent DataFrame syntax over the engine's operators — import
  * `graft.api.syntax._` and chain curation stages the way the
  * reference's users chain its pipeline calls:
  *
  * {{{
  *   import graft.api.syntax._
  *   val curated = docs
  *     .scoreQuality("text")
  *     .dropExactDups("text", "doc_id")
  *     .decontaminateAgainst(evalSet, "text", "doc_id", n = 13)
  *     .deterministicSample("doc_id", pct = 25)
  * }}}
  *
  * Every method delegates 1:1 to a verified operator (the
  * implementations, plans, and oracle contracts live with the
  * operators — this file adds NO logic), so facade chains inherit the
  * operators' scale shapes unchanged. Extension methods are value
  * classes: zero allocation per call at the use site.
  */
object syntax {

  implicit class GraftDocumentOps(private val df: DataFrame) extends AnyVal {

    // ---- dedup ----
    def dropExactDups(textCol: String, idCol: String): DataFrame =
      Dedup.dropExactDups(df, textCol, idCol)
    def minhashCandidates(textCol: String, idCol: String,
                          bands: Int = 3, rowsPerBand: Int = 2): DataFrame =
      Dedup.minhashCandidates(df, textCol, idCol, bands, rowsPerBand)
    def dedupParagraphs(textCol: String, idCol: String, sep: String): DataFrame =
      Dedup.dedupParagraphs(df, textCol, idCol, sep)
    def dupSpans(textCol: String, idCol: String, n: Int,
                 minDocs: Int = 2): DataFrame =
      Dedup.dupSpans(df, textCol, idCol, n, minDocs)

    // ---- curation / scoring ----
    def curate(textCol: String, idCol: String,
               cfg: CurationPipeline.Config = CurationPipeline.Config())
        : CurationPipeline.Result =
      CurationPipeline.run(df, textCol, idCol, cfg, withAudit = false)
    // withColumn, not a projection: the class-level example chains
    // further stages after scoring, so every input column must survive
    def scoreQuality(textCol: String): DataFrame =
      df.withColumn("quality",
        TextFns.qualityScore(org.apache.spark.sql.functions.col(textCol)))
    def lmScore(textCol: String, idCol: String): DataFrame =
      TfIdf.lmScore(df, textCol, idCol)

    // ---- decontamination ----
    def decontaminateAgainst(evalSet: DataFrame, textCol: String,
                             idCol: String, n: Int,
                             minShared: Int = 1): DataFrame =
      Decontamination.decontaminate(df, evalSet, textCol, idCol, n, minShared)

    // ---- sampling / mixing / ordering ----
    def deterministicSample(keyCol: String, pct: Int): DataFrame =
      Sampling.deterministicSample(df, keyCol, pct)
    def stratifiedSample(keyCol: String, strataCol: String,
                         pcts: Map[String, Int], defaultPct: Int): DataFrame =
      Sampling.stratifiedSample(df, keyCol, strataCol, pcts, defaultPct)
    def datasetSplit(keyCol: String): DataFrame =
      Sampling.datasetSplit(df, keyCol)
    def shuffleRank(keyCol: String, hexPrefix: Int = 3): DataFrame =
      Sampling.shuffleRank(df, keyCol, hexPrefix)
    def shardByRank(keyCol: String, shardSize: Long,
                    hexPrefix: Int = 3): DataFrame =
      Packing.shardByRank(df, keyCol, shardSize, hexPrefix)
    def mixturePlan(strataCol: String, tokensCol: Column,
                    targets: Map[String, Double]): DataFrame =
      Sampling.mixturePlan(df, strataCol, tokensCol, targets)

    // ---- shaping ----
    def chunkDocs(textCol: String, idCol: String, size: Int,
                  stride: Int): DataFrame =
      Packing.chunkDocs(df, textCol, idCol, size, stride)
    def packByConcat(tokensCol: Column, budget: Long, shardCol: String,
                     orderCol: String): DataFrame =
      Packing.packByConcat(df, tokensCol, budget, shardCol, orderCol)

    // ---- round-9 additions ----
    def prefixFilterPairs(textCol: String, idCol: String,
                          minJaccard: Double = 0.5,
                          shingleN: Int = 3,
                          maxCandidates: Long = 10000000L): DataFrame =
      Dedup.prefixFilterPairs(df, textCol, idCol, minJaccard, shingleN,
        maxCandidates)
    def winnowedPairs(textCol: String, idCol: String, k: Int = 8,
                      w: Int = 4, minShared: Int = 2,
                      maxDf: Int = 20): DataFrame =
      Dedup.winnowedPairs(df, textCol, idCol, k, w, minShared, maxDf)
    def fuzzyNearestMatch(nameCol: String, idCol: String,
                          maxDist: Int): DataFrame =
      FuzzyJoin.nearestMatch(df, nameCol, idCol, maxDist)
    def psiDrift(valCol: String, byCol: String): DataFrame =
      Profile.psi(df, valCol, byCol)
    def weightedMedian(valCol: String, weightCol: String, byCol: String,
                       idCol: String): DataFrame =
      Profile.weightedMedian(df, valCol, weightCol, byCol, idCol)
    def distinctNgramRatios(textCol: String, groupCol: String,
                            maxN: Int = 3): DataFrame =
      TfIdf.distinctNgramRatios(df, textCol, groupCol, maxN)
    def pmiPairs(textCol: String, idCol: String, minDf: Int,
                 k: Int): DataFrame =
      TfIdf.pmiPairs(df, textCol, idCol, minDf, k)
    def bigramLmScore(textCol: String, idCol: String): DataFrame =
      TfIdf.lmScore2(df, textCol, idCol)
    def learnBpeMerges(textCol: String, rounds: Int): DataFrame =
      Bpe.learnMerges(df, textCol, rounds)
    def cdcCompact(keyCol: String, orderCols: Seq[Column],
                   isDelete: Column): DataFrame =
      Relational.cdcCompact(df, keyCol, orderCols, isDelete)

    // ---- round-9 second-session additions ----
    def freqSpectrum(textCol: String, groupCol: String): DataFrame =
      TfIdf.freqSpectrum(df, textCol, groupCol)
    def keySkew(keyCol: String, byCol: String): DataFrame =
      Profile.keySkew(df, keyCol, byCol)
    def ksDrift(valCol: String, byCol: String): DataFrame =
      Profile.ksByGroup(df, valCol, byCol)
    def labelEntropy(labelCol: String, byCol: String): DataFrame =
      Profile.labelEntropy(df, labelCol, byCol)
    def kcore(aCol: String = "id_a", bCol: String = "id_b", k: Int = 2,
              rounds: Int = 4): DataFrame =
      KCore.kcore(df, aCol, bCol, k, rounds)
    def dominantDirection(vecCol: String, dims: Int,
                          iterations: Int = 5): DataFrame =
      Pca.dominantDirection(df, vecCol, dims, iterations)
    def epochShards(keyCol: String, epochs: Int, shards: Int): DataFrame =
      Sampling.epochShards(df, keyCol, epochs, shards)
  }

  implicit class GraftEventOps(private val df: DataFrame) extends AnyVal {
    def sessionize(keyCol: String, tsCol: String, gapSeconds: Long): DataFrame =
      Sessionize.sessions(df, keyCol, tsCol, gapSeconds)
    def asOfJoinBackward(right: DataFrame, keys: Seq[String], tsCol: String,
                         valCols: Map[String, String]): DataFrame =
      AsOfJoin.backward(df, right, keys, tsCol, valCols)
    def gapFill(keyCol: String, tsCol: String,
                valCols: Map[String, String], stepSeconds: Long): DataFrame =
      Resample.gapFill(df, keyCol, tsCol, valCols, stepSeconds)
    def latenessAudit(tsCol: String, arrivalCol: String,
                      boundsSeconds: Seq[Long] = Seq(60L, 900L)): DataFrame =
      Audit.latenessAudit(df, tsCol, arrivalCol, boundsSeconds)
    def robustOutliers(valCol: String, byCol: String,
                       z: Double = 3.0): DataFrame =
      Profile.robustOutliers(df, valCol, byCol, z)
    def transitionMatrix(keyCol: String, tsCol: String, actionCol: String,
                         tieCol: String, gapSeconds: Long): DataFrame =
      Sessionize.transitionMatrix(df, keyCol, tsCol, actionCol, tieCol,
        gapSeconds)
    def dailyOverlap(userCol: String, tsCol: String): DataFrame =
      Cohorts.dailyOverlap(df, userCol, tsCol)
    def ewma(groupCol: String, ordCol: String, valCol: String,
             alpha: Double = 0.5): DataFrame =
      Resample.ewma(df, groupCol, ordCol, valCol, alpha)
    def trendSlope(groupCol: String, xCol: String, yCol: String): DataFrame =
      Resample.trendSlope(df, groupCol, xCol, yCol)
    def cohenKappa(groupCol: String, aCol: String, bCol: String): DataFrame =
      Audit.cohenKappa(df, groupCol, aCol, bCol)
    def autocorr1(groupCol: String, xCol: String, yCol: String): DataFrame =
      Resample.autocorr1(df, groupCol, xCol, yCol)

    // ---- graphs & baskets (round-9 continuation) ----
    def basketPairAffinity(basketCol: String, itemCol: String,
                           minPairs: Long = 2L): DataFrame =
      Basket.pairAffinity(df, basketCol, itemCol, minPairs)
    def localClustering(aCol: String = "id_a", bCol: String = "id_b"): DataFrame =
      Triangles.localClusteringBp(df, aCol, bCol)
    def bipartiteHits(hubCol: String, authCol: String,
                      iterations: Int = 2): DataFrame =
      Hits.bipartiteHits(df, hubCol, authCol, iterations)
    def personalizedPageRank(seeds: DataFrame, aCol: String = "id_a",
                             bCol: String = "id_b",
                             iterations: Int = 4): DataFrame =
      PageRank.personalizedRanks(df, seeds, aCol, bCol, iterations)
    def weightedPageRank(aCol: String = "id_a", bCol: String = "id_b",
                         wCol: String = "w", iterations: Int = 3): DataFrame =
      PageRank.weightedRanks(df, aCol, bCol, wCol, iterations)
    def labelConsistency(vecCol: String, idCol: String, labelCol: String,
                         bands: Int = 4, planesPerBand: Int = 16,
                         dims: Int = 64, minNeighbors: Int = 3): DataFrame =
      Similarity.labelConsistency(df, vecCol, idCol, labelCol, bands,
        planesPerBand, dims, minNeighbors)
    def jsDivergence(textCol: String, byCol: String): DataFrame =
      Profile.jsDivergence(df, textCol, byCol)

    // ---- privacy release gates ----
    def kAnonymity(quasiCols: Seq[String], k: Long): DataFrame =
      Audit.kAnonymity(df, quasiCols, k)
    def lDiversity(quasiCols: Seq[String], sensitiveCol: String,
                   l: Long): DataFrame =
      Audit.lDiversity(df, quasiCols, sensitiveCol, l)
    def tCloseness(quasiCols: Seq[String], sensitiveCol: String,
                   maxTv: Double = 0.2): DataFrame =
      Audit.tCloseness(df, quasiCols, sensitiveCol, maxTv)

    // ---- round-10 additions ----
    def kaplanMeier(durationCol: String, eventCol: String,
                    bucketWidth: Long = 4096L): DataFrame =
      Survival.kaplanMeier(df, durationCol, eventCol, bucketWidth)
    def nelsonAalen(durationCol: String, eventCol: String,
                    bucketWidth: Long = 4096L): DataFrame =
      Survival.nelsonAalen(df, durationCol, eventCol, bucketWidth)
    def associationRules(basketCol: String, itemCol: String,
                         minPairs: Long = 2L): DataFrame =
      Basket.associationRules(df, basketCol, itemCol, minPairs)
    def phraseMatches(textCol: String, idCol: String,
                      phrase: String): DataFrame =
      TextIndex.phraseMatches(df, textCol, idCol, phrase)
    def cusumChangePoint(groupCol: String, dateCol: String): DataFrame =
      Profile.cusumChangePoint(df, groupCol, dateCol)
    def cohortLtv(userCol: String, dateCol: String,
                  amountCol: String): DataFrame =
      Cohorts.cohortLtv(df, userCol, dateCol, amountCol)
    def holt(groupCol: String, ordCol: String, valCol: String,
             alpha: Double = 0.5, beta: Double = 0.5): DataFrame =
      Resample.holt(df, groupCol, ordCol, valCol, alpha, beta)
    def abcClassification(keyCol: String, valueCol: String,
                          bucketWidth: Double = 65536.0): DataFrame =
      Pareto.abcClassification(df, keyCol, valueCol, bucketWidth)
    def ppsSample(keyCol: String, weightCol: String, n: Long,
                  hexPrefix: Int = 3): DataFrame =
      Sampling.ppsSample(df, keyCol, weightCol, n, hexPrefix)
    def bfsLayers(aCol: String, bCol: String, seeds: DataFrame,
                  seedCol: String, maxDepth: Int): DataFrame =
      Bfs.layers(df, aCol, bCol, seeds, seedCol, maxDepth)
    def greedyCoverage(textCol: String, idCol: String, k: Int,
                       shingleN: Int = 3): DataFrame =
      Selection.greedyCoverage(df, textCol, idCol, k, shingleN)
    def rankAuc(scoreCol: String, labelCol: String,
                bucketWidth: Double = 1.0): DataFrame =
      Metrics.rankAuc(df, scoreCol, labelCol, bucketWidth)
    def gainsTable(scoreCol: String, idCol: String, labelCol: String,
                   tiles: Int = 10, bucketWidth: Double = 1.0): DataFrame =
      Metrics.gainsTable(df, scoreCol, idCol, labelCol, tiles, bucketWidth)
    def calibrationBins(scoreCol: String, labelCol: String,
                        binWidth: Double): DataFrame =
      Metrics.calibrationBins(df, scoreCol, labelCol, binWidth)
    def exactQuantiles(valCol: String, qs: Seq[Double],
                       bucketWidth: Double,
                       leafCap: Int = 1 << 16): DataFrame =
      Metrics.exactQuantiles(df, valCol, qs, bucketWidth, leafCap)
    def quantilesFromCounts(valCol: String, cntCol: String,
                            qs: Seq[Double], bucketWidth: Double): DataFrame =
      Metrics.quantilesFromCounts(df, valCol, cntCol, qs, bucketWidth)
    def markovTransitions(groupCols: Seq[String], ordCols: Seq[String],
                          typeCol: String): DataFrame =
      Markov.transitions(df, groupCols, ordCols, typeCol)
    def chiSquare(aCol: String, bCol: String): DataFrame =
      Profile.chiSquare(df, aCol, bCol)
    def mutualInfo(aCol: String, bCol: String): DataFrame =
      Profile.mutualInfo(df, aCol, bCol)
    def fdStrength(detCols: Seq[String], depCol: String): DataFrame =
      Audit.fdStrength(df, detCols, depCol)
    def zipfFit(textCol: String, topK: Int = 100): DataFrame =
      TfIdf.zipfFit(df, textCol, topK)
    def dotTopK(corpus: DataFrame, idCol: String, vecCol: String,
                k: Int): DataFrame =
      Similarity.dotTopK(df, corpus, idCol, vecCol, k)
    def rrfFuse(other: DataFrame, k0: Int = 60, topN: Int = 5): DataFrame =
      Similarity.rrfFuse(df, other, k0, topN)
    def sphericalLloydIvfTopK(corpus: DataFrame, idCol: String,
                              vecCol: String, k: Int, nCells: Int = 16,
                              nprobe: Int = 2, iters: Int = 2): DataFrame =
      Similarity.sphericalLloydIvfTopK(df, corpus, idCol, vecCol, k,
        nCells, nprobe, iters)
    def mmr(query: DataFrame, idCol: String, vecCol: String, k: Int,
            lambda: Double = 0.7): DataFrame =
      Selection.mmr(df, query, idCol, vecCol, k, lambda)
    def weightedSample(keyCol: String, weightCol: String, n: Int): DataFrame =
      Sampling.weightedSample(df, keyCol, weightCol, n)
    def negativeSamples(userCol: String, itemCol: String, items: DataFrame,
                        itemKeyCol: String, k: Int): DataFrame =
      Sampling.negativeSamples(df, userCol, itemCol, items, itemKeyCol, k)
    def decayedScores(keyCol: String, tsCol: String, valCol: String,
                      halfLifeDays: Double): DataFrame =
      Resample.decayedScores(df, keyCol, tsCol, valCol, halfLifeDays)
    def theilSen(groupCol: String, xCol: String, yCol: String): DataFrame =
      Resample.theilSen(df, groupCol, xCol, yCol)
    def trailingDeviation(groupCol: String, ordCol: String, valCol: String,
                          window: Int = 7): DataFrame =
      Resample.trailingDeviation(df, groupCol, ordCol, valCol, window)
    def xyzClassification(keyCol: String, periodCol: String,
                          valueCol: String, xMax: Double = 0.5,
                          yMax: Double = 1.0): DataFrame =
      Pareto.xyzClassification(df, keyCol, periodCol, valueCol, xMax, yMax)
    def topShares(keyCol: String, valueCol: String, pctsBp: Seq[Long],
                  bucketWidth: Double = 65536.0): DataFrame =
      Pareto.topShares(df, keyCol, valueCol, pctsBp, bucketWidth)
    def hhi(marketCol: String, firmCol: String, valueCol: String): DataFrame =
      Profile.hhi(df, marketCol, firmCol, valueCol)
    def cosineTopK(basketCol: String, itemCol: String, k: Int = 5,
                   minPairs: Long = 2L): DataFrame =
      Basket.cosineTopK(df, basketCol, itemCol, k, minPairs)
    def wilsonLowerBound(keyCol: String, successCol: String,
                         z: Double = 1.959964, minN: Long = 1L): DataFrame =
      Metrics.wilsonLowerBound(df, keyCol, successCol, z, minN)
    def crossCorr(ys: DataFrame, ordCol: String, xCol: String,
                  yCol: String, maxLag: Int): DataFrame =
      Resample.crossCorr(df, ys, ordCol, xCol, yCol, maxLag)
    def woeIv(binCol: String, labelCol: String): DataFrame =
      Metrics.woeIv(df, binCol, labelCol)
    def cohensKappa(groupCol: String, aCol: String,
                    bCol: String): DataFrame =
      Metrics.cohensKappa(df, groupCol, aCol, bCol)
    def ndcgAtK(queryCol: String, scoreCol: String, idCol: String,
                relCol: String, k: Int = 10): DataFrame =
      Metrics.ndcgAtK(df, queryCol, scoreCol, idCol, relCol, k)
    def meanReciprocalRank(groupCol: String, queryCol: String,
                           scoreCol: String, idCol: String,
                           relCol: String): DataFrame =
      Metrics.meanReciprocalRank(df, groupCol, queryCol, scoreCol, idCol,
        relCol)
    def fleissKappa(groupCol: String, itemCol: String,
                    ratingCols: Seq[String]): DataFrame =
      Metrics.fleissKappa(df, groupCol, itemCol, ratingCols)
    def wasserstein1d(groupCol: String, armCol: String,
                      valCol: String): DataFrame =
      Profile.wasserstein1d(df, groupCol, armCol, valCol)
    def topKDrift(groupCol: String, armCol: String, keyCol: String,
                  valCol: String, k: Int = 50): DataFrame =
      Profile.topKDrift(df, groupCol, armCol, keyCol, valCol, k)
    def linkageQuality(truth: DataFrame, idACol: String = "id_a",
                       idBCol: String = "id_b"): DataFrame =
      Metrics.linkageQuality(df, truth, idACol, idBCol)
    def isotonicCalibration(groupCol: String, scoreCol: String,
                            labelCol: String, binWidth: Double,
                            maxBins: Int = 512): DataFrame =
      Metrics.isotonicCalibration(df, groupCol, scoreCol, labelCol,
        binWidth, maxBins)
    def calibrationCard(groupCol: String, scoreCol: String,
                        labelCol: String, binWidth: Double): DataFrame =
      Metrics.calibrationCard(df, groupCol, scoreCol, labelCol, binWidth)
    def prCurve(groupCol: String, scoreCol: String, labelCol: String,
                thresholds: Seq[Long]): DataFrame =
      Metrics.prCurve(df, groupCol, scoreCol, labelCol, thresholds)
    def exactDupPairs(textCol: String, idCol: String,
                      maxClusterSize: Long = 10000L): DataFrame =
      Dedup.exactDupPairs(df, textCol, idCol, maxClusterSize)
    def reshardChurn(keyCol: String, fromShards: Int,
                     toShards: Int): DataFrame =
      Packing.reshardChurn(df, keyCol, fromShards, toShards)
    def weekdaySeasonality(keyCol: String, tsCol: String): DataFrame =
      Resample.weekdaySeasonality(df, keyCol, tsCol)
    def seasonalNaiveError(keyCol: String, tsCol: String): DataFrame =
      Resample.seasonalNaiveError(df, keyCol, tsCol)
    def burstiness(keyCol: String, tsCol: String,
                   tieCol: String): DataFrame =
      Resample.burstiness(df, keyCol, tsCol, tieCol)
    def nextActionEntropy(keyCol: String, tsCol: String,
                          actionCol: String, tieCol: String,
                          gapSeconds: Long): DataFrame =
      Sessionize.nextActionEntropy(df, keyCol, tsCol, actionCol, tieCol,
        gapSeconds)
    def streaks(keyCol: String, tsCol: String, actionCol: String,
                tieCol: String): DataFrame =
      Sessionize.streaks(df, keyCol, tsCol, actionCol, tieCol)
    def pChart(periodCol: String, defectCol: String): DataFrame =
      Audit.pChart(df, periodCol, defectCol)
    def gini(groupCol: String, keyCol: String, valueCol: String,
             bucketWidthCents: Long = 1L << 20): DataFrame =
      Pareto.gini(df, groupCol, keyCol, valueCol, bucketWidthCents)
    def twoProportionZ(keyCol: String, armCol: String,
                       successCol: String): DataFrame =
      Metrics.twoProportionZ(df, keyCol, armCol, successCol)
    def dispersionIndex(keyCol: String, periodCol: String): DataFrame =
      Profile.dispersionIndex(df, keyCol, periodCol)
    def logLogSlope(groupCol: String, xCol: String,
                    yCol: String): DataFrame =
      Resample.logLogSlope(df, groupCol, xCol, yCol)
    def concurrency(startCol: String, endCol: String,
                    bucketWidth: Long = 256L): DataFrame =
      Resample.concurrency(df, startCol, endCol, bucketWidth)
    def segmentMigration(keyCol: String, ordCol: String,
                         wall: org.apache.spark.sql.Column,
                         thresholds: Seq[Long] = Seq(1L, 2L, 4L, 7L)): DataFrame =
      Cohorts.segmentMigration(df, keyCol, ordCol, wall, thresholds)
    def revenueBridge(keyCol: String, periodCol: String,
                      valueCol: String): DataFrame =
      Cohorts.revenueBridge(df, keyCol, periodCol, valueCol)
    def proximatePairs(matchCols: Seq[String], idCol: String,
                       dayCol: String, window: Long): DataFrame =
      FuzzyJoin.proximatePairs(df, matchCols, idCol, dayCol, window)
    def rollingActives(userCol: String, tsCol: String,
                       window: Int = 7): DataFrame =
      Cohorts.rollingActives(df, userCol, tsCol, window)
    def temporalLabels(userCol: String, tsCol: String, typeCol: String,
                       targetType: String, featureEnd: String,
                       labelEnd: String): DataFrame =
      Cohorts.temporalLabels(df, userCol, tsCol, typeCol, targetType,
        featureEnd, labelEnd)
    def mannWhitneyU(groupCol: String, armCol: String,
                     valCol: String): DataFrame =
      Hypothesis.mannWhitneyU(df, groupCol, armCol, valCol)
    def kendallTau(groupCol: String, xCol: String, yCol: String,
                   maxCells: Long = 20000L): DataFrame =
      Hypothesis.kendallTau(df, groupCol, xCol, yCol, maxCells)
    def cliffsDelta(groupCol: String, armCol: String,
                    valCol: String): DataFrame =
      Hypothesis.cliffsDelta(df, groupCol, armCol, valCol)
    def kruskalWallis(groupCol: String, armCol: String,
                      valCol: String): DataFrame =
      Hypothesis.kruskalWallis(df, groupCol, armCol, valCol)
    def mcnemar(groupCol: String, aCol: String, bCol: String): DataFrame =
      Hypothesis.mcnemar(df, groupCol, aCol, bCol)
    def cochranQ(groupCol: String, treatmentCols: Seq[String]): DataFrame =
      Hypothesis.cochranQ(df, groupCol, treatmentCols)
    def cochranArmitage(groupCol: String, bucketCol: String,
                        successCol: String): DataFrame =
      Hypothesis.cochranArmitage(df, groupCol, bucketCol, successCol)
    def effectSize(groupCol: String, armCol: String,
                   valueCol: String): DataFrame =
      Hypothesis.effectSize(df, groupCol, armCol, valueCol)
    def riskCard(groupCol: String, exposedCol: String,
                 outcomeCol: String): DataFrame =
      Hypothesis.riskCard(df, groupCol, exposedCol, outcomeCol)
    def vocabRichness(textCol: String, groupCol: String): DataFrame =
      TfIdf.vocabRichness(df, textCol, groupCol)
    def readability(textCol: String, groupCol: String): DataFrame =
      TfIdf.readability(df, textCol, groupCol)
    def theil(groupCol: String, valueCol: String): DataFrame =
      Pareto.theil(df, groupCol, valueCol)
    def hellinger(groupCol: String, armCol: String,
                  valCol: String): DataFrame =
      Profile.hellinger(df, groupCol, armCol, valCol)
    def cramersV(groupCol: String, aCol: String, bCol: String,
                 maxCells: Long = 20000L): DataFrame =
      Profile.cramersV(df, groupCol, aCol, bCol, maxCells)
    def effectiveSampleSize(groupCol: String,
                            weightCol: String): DataFrame =
      Sampling.effectiveSampleSize(df, groupCol, weightCol)
    def qqShift(groupCol: String, armCol: String, valCol: String,
                qs: Seq[Double]): DataFrame =
      Metrics.qqShift(df, groupCol, armCol, valCol, qs)
    def pearsonMatrix(groupCol: String, cols: Seq[String]): DataFrame =
      Profile.pearsonMatrix(df, groupCol, cols)
    def partialCorrelation(groupCol: String, xCol: String, yCol: String,
                           zCol: String): DataFrame =
      Profile.partialCorrelation(df, groupCol, xCol, yCol, zCol)
    def burrowsDelta(textCol: String, groupCol: String, topK: Int = 50,
                     maxGroups: Int = 64): DataFrame =
      TfIdf.burrowsDelta(df, textCol, groupCol, topK, maxGroups)
    def keyness(textCol: String, groupCol: String,
                k: Int = 10): DataFrame =
      TfIdf.keyness(df, textCol, groupCol, k)
    def lexicalDispersion(textCol: String, groupCol: String,
                          topK: Int = 50,
                          maxGroups: Int = 64): DataFrame =
      TfIdf.lexicalDispersion(df, textCol, groupCol, topK, maxGroups)
    def hourEntropy(keyCol: String, tsCol: String): DataFrame =
      Sessionize.hourEntropy(df, keyCol, tsCol)
    def vMeasure(groupCol: String, clusterCol: String,
                 labelCol: String): DataFrame =
      Metrics.vMeasure(df, groupCol, clusterCol, labelCol)
    def hillTail(valueCol: String, tieCol: String,
                 k: Int = 500): DataFrame =
      Pareto.hillTail(df, valueCol, tieCol, k)
    def logRank(durationCol: String, eventCol: String, armCol: String,
                bucketWidth: Long = 4096L): DataFrame =
      Survival.logRank(df, durationCol, eventCol, armCol, bucketWidth)
    def rmst(durationCol: String, eventCol: String, tau: Long,
             bucketWidth: Long = 4096L): DataFrame =
      Survival.rmst(df, durationCol, eventCol, tau, bucketWidth)
    def medianSurvival(durationCol: String, eventCol: String,
                       bucketWidth: Long = 4096L): DataFrame =
      Survival.medianSurvival(df, durationCol, eventCol, bucketWidth)
    def poissonRateTest(groupCol: String, armCol: String,
                        exposure0: Long, exposure1: Long): DataFrame =
      Hypothesis.poissonRateTest(df, groupCol, armCol, exposure0,
        exposure1)
    def neymanAllocation(groupCol: String, strataCol: String,
                         valueCol: String, totalN: Long): DataFrame =
      Sampling.neymanAllocation(df, groupCol, strataCol, valueCol, totalN)
    def friedman(groupCol: String, treatmentCols: Seq[String]): DataFrame =
      Hypothesis.friedman(df, groupCol, treatmentCols)
    def sprt(groupCol: String, successCol: String, p0: Double, p1: Double,
             alpha: Double = 0.05, beta: Double = 0.2): DataFrame =
      Hypothesis.sprt(df, groupCol, successCol, p0, p1, alpha, beta)
    def cmh(groupCol: String, strataCol: String, exposedCol: String,
            outcomeCol: String): DataFrame =
      Hypothesis.cmh(df, groupCol, strataCol, exposedCol, outcomeCol)
    def mhOddsRatio(groupCol: String, strataCol: String,
                    exposedCol: String, outcomeCol: String): DataFrame =
      Hypothesis.mhOddsRatio(df, groupCol, strataCol, exposedCol,
        outcomeCol)
    def rbo(groupCol: String, armCol: String, itemCol: String,
            scoreCol: String, k: Int = 50, p: Double = 0.9): DataFrame =
      Metrics.rbo(df, groupCol, armCol, itemCol, scoreCol, k, p)
    def mannKendall(groupCol: String, xCol: String, yCol: String,
                    maxCells: Long = 20000L): DataFrame =
      Hypothesis.mannKendall(df, groupCol, xCol, yCol, maxCells)
    def linkPrediction(aCol: String, bCol: String,
                       maxHubDegree: Long = 64L,
                       maxCandidates: Long = 10000000L): DataFrame =
      Triangles.linkPrediction(df, aCol, bCol, maxHubDegree, maxCandidates)

    // ---- round-12 additions ----
    def poissonBootstrapMean(groupCol: String, keyCol: String,
                             valCol: String, reps: Int = 32): DataFrame =
      Bootstrap.poissonBootstrapMean(df, groupCol, keyCol, valCol, reps)
    def jackknifeRatio(groupCol: String, blockCol: String,
                       numCol: String, denCol: String): DataFrame =
      Bootstrap.jackknifeRatio(df, groupCol, blockCol, numCol, denCol)
    def randomizationTest(groupCol: String, keyCol: String,
                          armCol: String, valCol: String,
                          reps: Int = 32): DataFrame =
      Bootstrap.randomizationTest(df, groupCol, keyCol, armCol, valCol,
        reps)
    def ljungBox(groupCol: String, ordCol: String, yCol: String,
                 maxLag: Int = 7): DataFrame =
      SeriesTests.ljungBox(df, groupCol, ordCol, yCol, maxLag)
    def acf(groupCol: String, ordCol: String, yCol: String,
            maxLag: Int): DataFrame =
      SeriesTests.acf(df, groupCol, ordCol, yCol, maxLag)
    def runsTest(groupCol: String, ordCol: String, yCol: String): DataFrame =
      SeriesTests.runsTest(df, groupCol, ordCol, yCol)
    def pettitt(groupCol: String, ordCol: String, yCol: String): DataFrame =
      SeriesTests.pettitt(df, groupCol, ordCol, yCol)
    def seasonalDecompose(groupCol: String, ordCol: String,
                          dowCol: String, yCol: String): DataFrame =
      SeriesTests.seasonalDecompose(df, groupCol, ordCol, dowCol, yCol)
    def hurstRS(groupCol: String, ordCol: String, yCol: String,
                blockSizes: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame =
      SeriesTests.hurstRS(df, groupCol, ordCol, yCol, blockSizes)
    def levene(groupCol: String, armCol: String,
               valCol: String): DataFrame =
      Hypothesis.levene(df, groupCol, armCol, valCol)
    def welchAnova(groupCol: String, armCol: String,
                   valCol: String): DataFrame =
      Hypothesis.welchAnova(df, groupCol, armCol, valCol)
    def jonckheere(groupCol: String, armCol: String, valCol: String,
                   maxArm: Int = 8): DataFrame =
      Hypothesis.jonckheere(df, groupCol, armCol, valCol, maxArm)
    def multipleTesting(familyCol: String, keyCol: String, pCol: String,
                        alphaMicro: Long = 50000L): DataFrame =
      Hypothesis.multipleTesting(df, familyCol, keyCol, pCol, alphaMicro)
    def bm25(textCol: String, idCol: String, queryTerms: Seq[String],
             k: Int = 10): DataFrame =
      TfIdf.bm25(df, textCol, idCol, queryTerms, k)
    def sortedNeighborhood(nameCol: String, idCol: String,
                           window: Int = 5, maxDist: Int = 3): DataFrame =
      FuzzyJoin.sortedNeighborhood(df, nameCol, idCol, window, maxDist)
    def captureRecapture(groupCol: String, keyCol: String,
                         inACol: String, inBCol: String): DataFrame =
      Profile.captureRecapture(df, groupCol, keyCol, inACol, inBCol)
    def cronbachAlpha(groupCol: String, personCol: String,
                      itemCol: String, valCol: String): DataFrame =
      Metrics.cronbachAlpha(df, groupCol, personCol, itemCol, valCol)
    def meanExcess(groupCol: String, valCol: String,
                   thresholds: Seq[Double]): DataFrame =
      Pareto.meanExcess(df, groupCol, valCol, thresholds)
    def simpsonDiversity(textCol: String, groupCol: String): DataFrame =
      TfIdf.simpsonDiversity(df, textCol, groupCol)
    def theilU(groupCol: String, xCol: String, yCol: String): DataFrame =
      Profile.theilU(df, groupCol, xCol, yCol)
    def weightedKappa(groupCol: String, aCol: String, bCol: String,
                      maxLevel: Int): DataFrame =
      Metrics.weightedKappa(df, groupCol, aCol, bCol, maxLevel)
    def kendallsW(groupCol: String, raterCol: String, itemCol: String,
                  scoreCol: String): DataFrame =
      Metrics.kendallsW(df, groupCol, raterCol, itemCol, scoreCol)
    def rakeKeywords(textCol: String, idCol: String, k: Int = 20,
                     minWords: Int = 2): DataFrame =
      TfIdf.rakeKeywords(df, textCol, idCol, k, minWords)
    def heapsLaw(textCol: String, idCol: String, groupCol: String,
                 points: Int = 8): DataFrame =
      TfIdf.heapsLaw(df, textCol, idCol, groupCol, points)
    def etaSquared(groupCol: String, catCol: String,
                   numCol: String): DataFrame =
      Profile.etaSquared(df, groupCol, catCol, numCol)
    def infoGain(featureCols: Seq[String], targetCol: String): DataFrame =
      Profile.infoGain(df, featureCols, targetCol)
    def priceIndices(groupCol: String, itemCol: String, eraCol: String,
                     priceCol: String, qtyCol: String): DataFrame =
      Pareto.priceIndices(df, groupCol, itemCol, eraCol, priceCol, qtyCol)
    def collocations(textCol: String, k: Int = 30,
                     minCount: Int = 5): DataFrame =
      TfIdf.collocations(df, textCol, k, minCount)
    def logOddsDirichlet(textCol: String, groupCol: String, k: Int = 10,
                         priorMass: Double = 500.0): DataFrame =
      TfIdf.logOddsDirichlet(df, textCol, groupCol, k, priorMass)
  }
}
