package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional phrase search — the search-workload shape: find every
  * document containing an exact k-word phrase, with its occurrence
  * count. The implementation is the INVERTED-INDEX join, not a
  * per-document substring scan: tokenize to (doc, position, term)
  * postings, keep ONLY the phrase's terms' postings (the filter
  * reaches the scan-side explode, so a rare phrase touches a tiny
  * fraction of the posting space), and equi-join consecutive words on
  * (doc, position − offset) — an occurrence survives all k−1 joins
  * exactly when the words are adjacent in order.
  *
  * Scale shape: k−1 hash equi-joins on (doc, pos) between
  * term-filtered posting streams whose sizes are the phrase terms'
  * document frequencies — never the corpus; the final count is one
  * hash aggregate. Each word's posting stream re-derives from the
  * scan here (k scans of the text column); at the 100-TB design point
  * the postings are WRITTEN ONCE, bucketed by term (`plans/
  * BucketingSpec`'s zero-exchange join applies verbatim), and
  * per-query cost is reading k posting ranges — this operator is that
  * query plan with the index build inlined.
  *
  * Matching is over `TextFns.tokens` (lowercased whitespace tokens) —
  * identical to the oracle's token list, so occurrence counts are
  * exact integers.
  */
object TextIndex {

  /** Documents containing `phrase` (>= 2 words) with exact occurrence
    * counts: (doc_id, n_matches).
    */
  def phraseMatches(docs: DataFrame, textCol: String, idCol: String,
                    phrase: String): DataFrame = {
    val words = phrase.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    require(words.length >= 2,
      s"phrase must have >= 2 words, got '$phrase'")
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "term")))
    def postings(w: String, offset: Int) =
      toks.filter(col("term") === w)
        .select(col("doc_id"), (col("pos") - offset).as("pos"))
    words.zipWithIndex.tail
      .foldLeft(postings(words.head, 0)) { case (acc, (w, i)) =>
        acc.join(postings(w, i), Seq("doc_id", "pos"))
      }
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_matches"))
  }
}
