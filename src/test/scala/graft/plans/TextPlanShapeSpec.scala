package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Plan-shape regression guards for the text-analysis queries: the
  * whole point of the native expressions and regex-counting rewrites is
  * that the document scans stay inside whole-stage codegen — no
  * interpreted higher-order array functions (CodegenFallback) and no
  * match-array materialization in the hot projections. These tests pin
  * the executed plan so a refactor that quietly reintroduces
  * `filter(tokens(...))` / `size(regexp_extract_all(...))` /
  * `transform(charShingles(...))` fails here, not in the next
  * benchmark round.
  */
class TextPlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
  }

  test("LID + quality + token-count queries count natively (no HOFs, no match arrays)") {
    for (q <- Seq("q30_lang_id", "q31_quality_score", "q32_token_count", "q57_lang_id_ngram")) {
      val p = plan(q)
      withClue(s"$q plan:\n$p\n") {
        p should include("regexp_tally")
        p should not include "regexp_extract_all"
        // tokens()/charShingles() leak back in as these interpreted HOFs
        p should not include "filter(split("
        p should not include "aggregate("
      }
    }
  }

  test("fingerprint query uses the native gram expressions") {
    val p = plan("q33_fingerprint")
    withClue(s"q33 plan:\n$p\n") {
      p should include("md5_min_gram")
      p should include("distinct_gram_count")
      p should not include "transform("
      p should not include "array_min("
    }
  }

  test("PII counts query counts natively") {
    val p = plan("q58_pii_counts")
    withClue(s"q58 plan:\n$p\n") {
      p should include("regexp_tally")
      p should not include "regexp_extract_all"
    }
  }

  test("text queries are single-stage scans (no exchange)") {
    // per-row scoring must not shuffle: one scan, one projection
    for (q <- Seq("q30_lang_id", "q31_quality_score", "q32_token_count",
        "q33_fingerprint", "q57_lang_id_ngram", "q58_pii_counts")) {
      val p = plan(q)
      withClue(s"$q plan:\n$p\n") {
        p should not include "Exchange"
      }
    }
  }
}
