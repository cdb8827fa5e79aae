package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing must actually remove the shuffle: a join of two tables
  * bucketed on the join key with equal bucket counts plans with NO
  * Exchange on either side.
  */
class BucketedJoinSpec extends SparkSpec {

  test("co-bucketed join plans without a shuffle") {
    // drop leftovers (table AND its managed location) from prior runs
    Seq("bucket_a", "bucket_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    val a = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("a"))
    val b = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("b"))
    Layers.writeBucketed(a, "bucket_a", Seq("k"), 4)
    Layers.writeBucketed(b, "bucket_b", Seq("k"), 4)

    // force SMJ path so the test asserts bucketing (not broadcast)
    val joined = spark.table("bucket_a").hint("merge")
      .join(spark.table("bucket_b"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString

    plan should not include "Exchange"
    joined.count() shouldBe 1000

    val unbucketed = a.hint("merge").join(b, Seq("k"))
    unbucketed.queryExecution.executedPlan.toString should include("Exchange")
  }
}
