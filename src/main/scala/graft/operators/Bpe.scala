package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The byte-pair-encoding merge statistic — the core computation of
  * tokenizer vocabulary induction (Sennrich et al. 2016): which
  * adjacent symbol pair occurs most often across the corpus, weighted
  * by word frequency. A full BPE trainer iterates merge → recount;
  * this operator is that loop's body expressed corpus-scale, and its
  * top-1 row IS the next merge.
  *
  * Shape — the reason BPE training is feasible at 100 TB at all: the
  * corpus is touched ONCE to build the word-frequency table (hash
  * aggregate, map-side combined, output bounded by the VOCABULARY, not
  * the corpus), and pair expansion + counting runs on that table —
  * each distinct word explodes into its adjacent char pairs weighted
  * by the word's count. A trillion-token corpus with a 10M-word
  * vocabulary does pair counting over 10M rows. The top-k is
  * `orderBy.limit` → TakeOrderedAndProject, never a global sort.
  */
object Bpe {

  /** Top-`k` adjacent character pairs by frequency-weighted count over
    * the corpus vocabulary. Output: (pair, n_words, total) — `n_words`
    * = distinct words containing the pair, `total` = corpus
    * occurrences (sum of word counts; a pair repeating inside one word
    * counts each position). The top-k cut orders by (total desc, pair
    * asc), so the returned SET is deterministic.
    */
  def pairStats(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val words = docs
      .select(explode(TextFns.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .filter(length(col("w")) >= 2)
    // vocabulary-bounded explode: one row per (word, position) pair
    val pairs = words.select(col("w"), col("cnt"),
      explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
    pairs
      .groupBy(col("pair"))
      .agg(countDistinct(col("w")).as("n_words"), sum(col("cnt")).as("total"))
      .orderBy(col("total").desc, col("pair").asc)
      .limit(k)
  }

  /** Iterative BPE vocabulary induction — `pairStats`' loop actually
    * run: `rounds` merges learned in sequence, each round counting
    * adjacent SYMBOL pairs over the word-frequency table, taking the
    * (total desc, s1 asc, s2 asc) best, and applying it greedily
    * left-to-right. Output: (round, s1, s2, total) — the merge table a
    * tokenizer ships.
    *
    * Symbol sequences are encoded as separator-joined strings
    * ('\\u0001' after every symbol), which makes the greedy
    * non-overlapping merge EXACTLY a literal string `replace` of
    * "s1␁s2␁" with "s1s2␁" — both engines' replace scans left to
    * right and resumes after each substitution, so "aaaa" under (a,a)
    * becomes (aa)(aa), the standard BPE behavior, with no list-fold
    * machinery. Words never contain the separator by construction
    * (tokens are whitespace-split text).
    *
    * Scale shape: the corpus is touched ONCE (word-frequency hash
    * aggregate); every round runs on the vocabulary-bounded frame —
    * pair explode, hash aggregate, TakeOrderedAndProject(1) — and
    * collects exactly ONE row to the driver (the merge to apply next,
    * the same inherently-sequential driver step as an MLlib k-means
    * iteration). `localCheckpoint` keeps the per-round lineage flat.
    */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val sep = "\u0001"
    var vocab = docs
      .select(explode(TextFns.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("cnt"))
      .filter(length(col("w")) >= 2)
      .select(regexp_replace(col("w"), "(.)", "$1" + sep).as("enc"), col("cnt"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = vocab
        .select(col("cnt"),
          filter(split(col("enc"), sep), s => length(s) > 0).as("ss"))
        .filter(size(col("ss")) >= 2)
        .withColumn("s1s", slice(col("ss"), lit(1), size(col("ss")) - 1))
        .withColumn("s2s", slice(col("ss"), lit(2), size(col("ss")) - 1))
        .select(col("cnt"), explode(arrays_zip(col("s1s"), col("s2s"))).as("p"))
        .groupBy(col("p.s1s").as("s1"), col("p.s2s").as("s2"))
        .agg(sum(col("cnt")).cast("long").as("total"))
        .orderBy(col("total").desc, col("s1").asc, col("s2").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val b = best.head
        val (s1, s2, tot) = (b.getString(0), b.getString(1), b.getLong(2))
        merges += ((r.toLong, s1, s2, tot))
        vocab = vocab.select(
          replace(col("enc"), lit(s1 + sep + s2 + sep), lit(s1 + s2 + sep))
            .as("enc"), col("cnt"))
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.result().toDF("round", "s1", "s2", "total")
  }
}
