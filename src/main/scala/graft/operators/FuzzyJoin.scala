package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked edit-distance entity resolution — "which other record is
  * this record really?" over a noisy name/title column, the record-
  * linkage primitive behind catalog dedup, user merging, and citation
  * matching.
  *
  * The classic shape: a BLOCKING KEY turns the quadratic all-pairs
  * comparison into an equi-join (only records sharing a block are
  * compared), then the survivors are scored with exact Levenshtein
  * and each record keeps its single best match (min distance, ties to
  * the smallest candidate id — fully deterministic).
  *
  * Scale shape: the block join is a hash-shuffle equi-join, so AQE's
  * OptimizeSkewedJoin splits oversized blocks at runtime; the block
  * key is the caller's lever — a block of size B costs B^2
  * comparisons, so keys should aim for bounded block cardinality
  * (e.g. first-token + length band, phonetic code + prefix). The
  * per-record best is a Window PARTITIONED BY the record id — no
  * single-partition stage anywhere. Spark's three-arg
  * `levenshtein(l, r, threshold)` abandons the DP early (returns -1)
  * once the distance provably exceeds the bound, so the per-pair cost
  * is O(len * threshold), not O(len^2).
  */
object FuzzyJoin {

  /** First lowercase whitespace token — a reasonable default block for
    * word-structured names. Swap for a phonetic or n-gram key when the
    * first token is noisy.
    */
  def firstTokenBlock(name: Column): Column =
    split(lower(trim(name)), "\\s+").getItem(0)

  /** For each record, its nearest other record in the same block at
    * edit distance <= maxDist: (id, match_id, dist). Records with no
    * in-threshold candidate are absent (inner semantics). The best
    * match minimizes (dist, match_id) — fully deterministic.
    *
    * VALUE-COMPRESSED execution: real entity columns are heavily
    * duplicated (catalogs repeat names thousands of times), and a
    * record-level block join pays |block|^2 comparisons on every copy
    * — measured 50M Levenshtein calls on a 20k-row catalog with ~90
    * distinct names. Equal strings are at distance 0 and interchangeable
    * as match targets up to the id tie-break, so the expensive join
    * runs over DISTINCT NAMES only; records rejoin by name at the end:
    *   - per name keep the two smallest record ids (two hash
    *     aggregates, no collected arrays — skew-safe for hot names);
    *   - cross-name best = min (dist, min-id-of-that-name) over the
    *     blocked distinct-name join — equal to the record-level
    *     min (dist, match_id) because every record of a name shares
    *     its min id as best representative;
    *   - a duplicated name beats any cross-name match (dist 0 < 1 and
    *     distinct names can't be at distance 0): match = the name's
    *     min id, or its second-min for the min-id record itself.
    * Output is BIT-IDENTICAL to the record-level formulation; cost is
    * |distinct names in block|^2, invariant to duplication.
    */
  def nearestMatch(df: DataFrame, nameCol: String, idCol: String,
                   maxDist: Int,
                   blockFn: Column => Column = firstTokenBlock): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val recs = df.select(col(idCol).as("id"),
      lower(trim(col(nameCol))).as("nm"))
    val minIds = recs.groupBy(col("nm")).agg(min(col("id")).as("__id1"))
    val names = recs.join(minIds, "nm")
      .groupBy(col("nm"))
      .agg(max(col("__id1")).as("__id1"),
        min(when(col("id") =!= col("__id1"), col("id"))).as("__id2"),
        count(lit(1)).as("__cnt"))
    val a = names.select(col("nm"), blockFn(col("nm")).as("blk"))
    val b = names.select(col("nm").as("m_nm"), col("__id1").as("m_id1"),
      blockFn(col("m_nm")).as("blk"))
    val wN = Window.partitionBy(col("nm"))
      .orderBy(col("dist").asc, col("m_id1").asc)
    val bestCross = a.join(b, Seq("blk"))
      .filter(col("nm") =!= col("m_nm"))
      .withColumn("dist", levenshtein(col("nm"), col("m_nm"), maxDist))
      .filter(col("dist") >= 0)
      .withColumn("__rn", row_number().over(wN))
      .filter(col("__rn") === 1)
      .select(col("nm"), col("m_id1").as("__cross_id"),
        col("dist").as("__cross_dist"))
    recs.join(names, "nm")
      .join(bestCross, Seq("nm"), "left")
      .withColumn("__same_id",
        when(col("__cnt") > 1,
          when(col("id") === col("__id1"), col("__id2"))
            .otherwise(col("__id1"))))
      .select(col("id"),
        coalesce(col("__same_id"), col("__cross_id")).as("match_id"),
        when(col("__same_id").isNotNull, lit(0))
          .otherwise(col("__cross_dist")).as("dist"))
      .filter(col("match_id").isNotNull)
  }

  /** Temporal-proximity duplicate screen — the double-billing /
    * duplicate-invoice detector: pairs of records with the SAME exact
    * match keys (customer, amount) whose integer ordinates (days) lie
    * within `window` of each other. Emits each qualifying pair once as
    * (id_a < id_b) with both ordinates and the gap.
    *
    * The quadratic trap and its block: candidate generation joins on
    * (matchCols, day-bucket) with the LEFT side exploded to its 3
    * adjacent buckets of width window+1 — any within-window pair lands
    * in exactly one (leftBucket, rightBucket) combination, so no
    * dedup pass is needed, and the (a,b)/(b,a) double-find resolves by
    * keeping the id_a < id_b orientation only. Pair cost is bounded by
    * the per-(matchKeys, ±window) multiplicity — the screen's nature:
    * exact-amount collisions are rare, and a hot (key, amount) cell is
    * itself the finding.
    *
    * Scale shape: one explode(3×) projection, one equi-join, no
    * window; NULL keys/ordinates drop.
    */
  def proximatePairs(df: DataFrame, matchCols: Seq[String], idCol: String,
                     dayCol: String, window: Long): DataFrame = {
    require(matchCols.nonEmpty, "proximatePairs needs match columns")
    require(window >= 1L, s"window must be >= 1: $window")
    val bw = window + 1L
    val base = df
      .filter(col(idCol).isNotNull && col(dayCol).isNotNull &&
        matchCols.map(col(_).isNotNull).reduce(_ && _))
    val left = base.select(
      matchCols.map(col) :+ col(idCol).as("id_a") :+
        col(dayCol).cast("long").as("day_a") :+
        explode(array(lit(-1L), lit(0L), lit(1L))).as("__o"): _*)
      .withColumn("__bkt",
        call_function("div", col("day_a"), lit(bw)) + col("__o"))
      .drop("__o")
    val right = base.select(
      matchCols.map(col) :+ col(idCol).as("id_b") :+
        col(dayCol).cast("long").as("day_b"): _*)
      .withColumn("__bkt", call_function("div", col("day_b"), lit(bw)))
    left.join(right,
        matchCols.map(c => left(c) <=> right(c))
          .reduce(_ && _) && left("__bkt") === right("__bkt"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("day_a") - col("day_b")) <= window)
      .select(matchCols.map(left(_)) :+ col("id_a") :+ col("id_b") :+
        col("day_a") :+ col("day_b") :+
        abs(col("day_a") - col("day_b")).as("gap_days"): _*)
  }

  /** Blocked sorted-neighborhood entity-resolution candidates: sort
    * records by a normalized key, pair each record with its next
    * `window` neighbors in key order, and keep pairs within `maxDist`
    * edits. The classic alternative to LSH blocking when typos cluster
    * lexicographically (catalog names, addresses).
    *
    * Distributed contract: the sort runs WITHIN first-letter blocks
    * (the window is partitioned, never global), so pairs crossing a
    * first-letter boundary are out of scope BY DEFINITION — the
    * documented "blocked" variant. A global rank would serialize the
    * sort through one partition at any scale; typo pairs that disagree
    * on the first letter belong to [[nearestMatch]]'s edit-blocked
    * path instead.
    *
    * Value compression as [[nearestMatch]]: the neighborhood runs over
    * DISTINCT normalized keys (rank = dense key order, ids carried as
    * min-id representatives), so duplicated names cost one row.
    *
    * Output: id_a, id_b, key_a, key_b, rank_gap, dist — inner (only
    * in-threshold pairs). Each id is the MIN id among rows sharing
    * that normalized key, and the a/b orientation follows KEY RANK
    * (key_a sorts before key_b) — numerically id_a can exceed id_b,
    * so a caller deduplicating by id must normalize with
    * (least, greatest) itself rather than assume id_a < id_b.
    */
  def sortedNeighborhood(df: DataFrame, nameCol: String, idCol: String,
                         window: Int = 5, maxDist: Int = 3): DataFrame = {
    require(window >= 1 && window <= 32, s"window must be 1..32: $window")
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val keyed = df
      .filter(col(nameCol).isNotNull)
      .select(
        regexp_replace(lower(trim(col(nameCol))), "[^a-z0-9 ]", "")
          .as("__key"),
        col(idCol).cast("long").as("__id"))
      .filter(length(col("__key")) > 0)
      .groupBy(col("__key"))
      .agg(min(col("__id")).as("__mid"))
      .withColumn("__blk", substring(col("__key"), 1, 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__blk")).orderBy(col("__key"))
    // the neighborhood is `window` lead() columns exploded — exactly
    // O(keys · window) rows, never a per-block pair join (an equi-join
    // on the block key enumerates |block|² pairs before any range
    // filter can prune)
    val leadCols = Seq(col("__key"), col("__mid")) ++
      (1 to window).flatMap(i => Seq(
        lead(col("__key"), i).over(w).as(s"__kb$i"),
        lead(col("__mid"), i).over(w).as(s"__ib$i")))
    val neighbors = keyed
      .select(leadCols: _*) // windows first: a generator can't host them
      .select(col("__key").as("key_a"), col("__mid").as("id_a"),
        explode(array((1 to window).map(i => struct(
          col(s"__kb$i").as("key_b"), col(s"__ib$i").as("id_b"),
          lit(i.toLong).as("rank_gap"))): _*)).as("__n"))
      .where(col("__n.key_b").isNotNull)
    neighbors
      .withColumn("dist", levenshtein(col("key_a"), col("__n.key_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("__n.id_b").as("id_b"), col("key_a"),
        col("__n.key_b").as("key_b"), col("__n.rank_gap").as("rank_gap"),
        col("dist").cast("long").as("dist"))
  }
}
