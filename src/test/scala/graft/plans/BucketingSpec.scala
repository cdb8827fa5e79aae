package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing — the 100-TB co-located-join lever this library's design
  * notes keep pointing at, demonstrated end-to-end: two fact tables
  * written `bucketBy` the join key join WITHOUT any shuffle exchange,
  * while the same data as plain parquet pays two. On a 1000-executor
  * cluster this is the difference between a full-network re-partition
  * of both sides on every join and a purely node-local merge.
  */
class BucketingSpec extends SparkSpec {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // force AQE to finalize the executed plan
    // AQE hides exchanges inside leaf QueryStageExec wrappers, which
    // collect() cannot traverse — count them in the printed plan
    // (covers both the Final and Initial sections; zero means zero)
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
  }

  test("co-bucketed tables join with zero shuffle exchanges") {
    import spark.implicits._
    val n = 1000L
    val a = (1L to n).map(i => (i, i * 2)).toDF("k", "va")
    val b = (1L to n).map(i => (i, i * 3)).toDF("k", "vb")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    a.write.bucketBy(4, "k").sortBy("k").saveAsTable("graft_bkt_a")
    b.write.bucketBy(4, "k").sortBy("k").saveAsTable("graft_bkt_b")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = spark.table("graft_bkt_a")
        .join(spark.table("graft_bkt_b"), "k")
      shuffleCount(bucketed) shouldBe 0
      bucketed.count() shouldBe n

      // control: identical data, plain (unbucketed) relations -> both
      // sides must re-partition on k
      val plain = a.join(b, "k")
      shuffleCount(plain) should be >= 2
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
