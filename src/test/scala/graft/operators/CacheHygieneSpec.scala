package graft.operators

import graft.{SparkEntry, SparkSpec}

/** The q46 contract entry runs a pipeline that persists internally; the
  * entry must release that cache before returning, or every invocation
  * strands one cached corpus in the block manager AND CacheManager's
  * canonicalized-plan matching silently serves the stale cache to the
  * next invocation (what contaminated the round-3 benchmark).
  */
class CacheHygieneSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q46 entry leaves no live cache behind and returns a usable frame") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    spark.catalog.clearCache()
    val out = SparkEntry.queries("q46_curation_pipeline")(spark, sfDir)
    // nothing persisted survives the call...
    spark.sharedState.cacheManager.isEmpty shouldBe true
    // ...and the returned frame is already materialized and re-readable
    val n = out.count()
    n should be > 0L
    out.count() shouldBe n
  }
}
