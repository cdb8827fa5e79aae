package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy coverage-maximizing document selection — the submodular
  * data-selection shape (facility-location / set-cover greedy): pick
  * k documents one at a time, each round the doc contributing the
  * most shingles NOT yet covered by the picks so far. The classic
  * 1−1/e-approximate diverse-subset selector ("which k docs summarize
  * the corpus' n-gram space") used to seed dedup review queues and
  * curriculum heads.
  *
  * Determinism: coverage counts are exact integers and ties break by
  * (new_grams desc, doc id asc) — a total order, so the pick sequence
  * is engine-exact and the oracle replays the rounds as unrolled
  * CTEs. Selection stops early when the best remaining gain is 0
  * (every shingle covered).
  *
  * Scale shape: each round is one scan (shingles computed in the
  * scan projection by the native expression — keys-only, recomputed
  * per round), one broadcast anti-join against the covered-shingle
  * set, one hash aggregate, and a TakeOrdered(1) — the BPE/k-means
  * driver-iteration shape, k rounds, one driver row per round plus
  * the winner's own shingles (doc-sized). Recompute is deliberate:
  * checkpointing the exploded (doc, shingle) table pins it in
  * UNEVICTABLE storage (localCheckpoint blocks are the only copy) and
  * measured as an executor aggregate OOM at 2.5M docs, while the
  * per-round rescan is the cheap keys-only pass (the q143 lesson).
  * The covered set is require-bounded like decontamination's eval
  * grams.
  */
object Selection {

  /** One row per selection round: `round` (1-based), `doc` (the
    * pick), `new_grams` (its marginal coverage), `covered_total`
    * (cumulative distinct shingles covered).
    */
  def greedyCoverage(docs: DataFrame, textCol: String, idCol: String,
                     k: Int, shingleN: Int = 3,
                     maxCoveredGrams: Long = 10000000L): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64]: $k (driver rounds)")
    require(shingleN >= 1, s"shingleN must be >= 1: $shingleN")
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc"),
        explode(graft.expressions.GraftFunctions
          .distinctWordShingles(col(textCol), shingleN)).as("g"))
    var covered = Set.empty[String]
    var selected = Vector.empty[(Int, Any, Long, Long)]
    var selectedDocs = Set.empty[Any]
    var round = 0
    var done = false
    while (round < k && !done) {
      round += 1
      val coveredDf = broadcast(covered.toSeq.toDF("g"))
      val remaining =
        if (selectedDocs.isEmpty) grams
        else grams.filter(!col("doc").isInCollection(selectedDocs.toSeq))
      val winner = remaining
        .join(coveredDf, Seq("g"), "left_anti")
        .groupBy(col("doc"))
        .agg(count(lit(1)).cast("long").as("__nc"))
        .orderBy(col("__nc").desc, col("doc"))
        .limit(1)
        .collect()
      if (winner.isEmpty || winner(0).getLong(1) == 0L) done = true
      else {
        val doc = winner(0).get(0)
        val gain = winner(0).getLong(1)
        val newGrams = grams.filter(col("doc") === lit(doc))
          .select(col("g")).collect().map(_.getString(0)).toSet -- covered
        covered ++= newGrams
        require(covered.size <= maxCoveredGrams,
          s"covered shingle set exceeds $maxCoveredGrams — lower k or " +
            "raise shingleN (sparser space)")
        selectedDocs += doc
        selected :+= ((round, doc, gain, covered.size.toLong))
      }
    }
    val schema = docs.select(col(idCol).as("doc")).schema("doc").dataType
    val rows = selected.map { case (r, doc, g, c) => (r.toLong, doc, g, c) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(t =>
        org.apache.spark.sql.Row(t._1, t._2, t._3, t._4)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("round",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("doc", schema),
        org.apache.spark.sql.types.StructField("new_grams",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("covered_total",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Maximal-marginal-relevance selection over an embedding corpus —
    * `greedyCoverage`'s dense-vector sibling (RAG context packing,
    * eval-set picking): k rounds of
    *   argmax  λ·cos(query, cand) − (1−λ)·max_{s∈picked} cos(s, cand)
    * — relevance traded against redundancy with what is already
    * picked. Ties break by (score desc, id asc); the score argmax runs
    * on UNROUNDED doubles whose every factor is the bit-exact cosine
    * (the q24 contract), so the pick sequence replays exactly in the
    * oracle's unrolled rounds.
    *
    * Scale shape: the query vector and the ≤k picked vectors ride
    * along as PLAN LITERALS, so every round is ONE corpus scan with
    * all cosines in the scan projection (no join, no explode, nothing
    * checkpointed — the q247 recompute-beats-materialize lesson) into
    * a TakeOrdered(1). k driver rows total.
    */
  def mmr(corpus: DataFrame, query: DataFrame, idCol: String,
          vecCol: String, k: Int, lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64]: $k (driver rounds)")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1]: $lambda")
    val spark = corpus.sparkSession
    // dtype-aware vector handling (float parquet embeddings or double
    // arrays built in a projection), forced to plain JVM arrays:
    // collected rows can surface catalyst-backed Seqs that Literal
    // creation rejects
    val isFloat = corpus.select(col(vecCol)).schema.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.FloatType
    def vecOf(row: org.apache.spark.sql.Row, i: Int): Seq[Double] =
      if (isFloat) row.getSeq[Float](i).toArray.map(_.toDouble).toSeq
      else row.getSeq[Double](i).toArray.toSeq
    def vlit(v: Seq[Double]) =
      if (isFloat) typedLit(v.map(_.toFloat)) else typedLit(v)
    val qRows = query.select(col(vecCol)).limit(1).collect()
    require(qRows.nonEmpty, "query frame is empty")
    val qVec = vecOf(qRows(0), 0)
    val cos = graft.expressions.GraftFunctions.cosineSim _
    var picked = Vector.empty[(Long, Seq[Double], Double, Double, Double)]
    var pickedIds = Set.empty[Long]
    var round = 0
    var exhausted = false
    while (round < k && !exhausted) {
      round += 1
      val base = corpus
        .filter(col(idCol).isNotNull &&
          (if (pickedIds.isEmpty) lit(true)
           else !col(idCol).isInCollection(pickedIds.toSeq)))
        .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__cv"),
          cos(vlit(qVec), col(vecCol)).as("__rel"))
      val ms =
        if (picked.isEmpty) lit(0.0)
        else {
          val sims = picked.map(p => cos(vlit(p._2), col("__cv")))
          if (sims.size == 1) sims.head else greatest(sims: _*)
        }
      val w = base.withColumn("__ms", ms)
        .withColumn("__score",
          lit(lambda) * col("__rel") - lit(1.0 - lambda) * col("__ms"))
        .orderBy(col("__score").desc, col("__id"))
        .limit(1)
        .collect()
      if (w.isEmpty) exhausted = true // corpus smaller than k: stop scanning
      else {
        val r = w(0)
        picked :+= ((r.getLong(0), vecOf(r, 1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        pickedIds += r.getLong(0)
      }
    }
    def p6(x: Double) = graft.functions.Rounding.p6d(x)
    val spark2 = spark
    import spark2.implicits._
    picked.zipWithIndex.map { case ((id, _, rel, m, s), i) =>
      ((i + 1).toLong, id, p6(rel), p6(m), p6(s))
    }.toDF("round", "vec_id", "relevance", "max_sim", "mmr_score")
  }
}
