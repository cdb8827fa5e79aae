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
}
