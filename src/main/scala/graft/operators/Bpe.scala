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
}
