package graft.operators

import graft.SparkSpec

class TextIndexSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("counts exact adjacent-in-order occurrences, case-insensitive") {
    val d = docs(
      1L -> "the quick fox and the quick fox again",    // 2 matches
      2L -> "quick the fox",                            // words present, wrong order
      3L -> "the QUICK fox",                            // case-insensitive match
      4L -> "the slow fox",                             // missing middle word
      5L -> "nothing relevant here")
    val out = TextIndex.phraseMatches(d, "text", "doc_id", "the quick fox")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 2L, 3L -> 1L)
  }

  test("overlapping occurrences each count; two-word phrases work") {
    // "a a a" contains "a a" twice (positions 1-2 and 2-3)
    val d = docs(1L -> "a a a", 2L -> "a b a")
    val out = TextIndex.phraseMatches(d, "text", "doc_id", "a a")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 2L)
    an[IllegalArgumentException] should be thrownBy
      TextIndex.phraseMatches(d, "text", "doc_id", "single")
  }

  test("repeated phrase words join on distinct positions, not a cross blowup") {
    // phrase "x x x" in "x x x x": occurrences at 1,2 -> 2 matches
    val d = docs(1L -> "x x x x")
    val out = TextIndex.phraseMatches(d, "text", "doc_id", "x x x")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 2L)
  }
}
