package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weighted greedy bin-packing — the reference's ingest load-balancer
  * (reference: src/other/create_category_group_messages.py:61-84,
  * `split_categories_into_groups`): items are assigned, in input order,
  * to the first of `numGroups` groups whose running weight stays <= cap
  * after the add; an over-cap item takes the first empty group; otherwise
  * the least-loaded group wins, with ties going to the LAST group at the
  * minimum (the reference scans with `<=`).
  *
  * Inherently sequential and order-sensitive, so it runs on the driver
  * over a collected (id, weight) list — in the reference this list is the
  * category dim (≈5-10k rows), trivially collectable at any scale. The
  * fan-out it produces maps to Spark task parallelism: the group id is a
  * partitioning key for downstream per-group work.
  */
object BinPacking {

  final case class Assignment(id: String, weight: Long, group: Int)

  def pack(items: Seq[(String, Long)], numGroups: Int = 25, cap: Long = 7000L): Seq[Assignment] = {
    val totals = new Array[Long](numGroups)
    items.map { case (id, w) =>
      var minSum = Long.MaxValue
      var minIdx = -1
      var chosen = -1
      var i = 0
      while (i < numGroups && chosen < 0) {
        val s = totals(i)
        if (s + w <= cap) chosen = i
        else if (s == 0L) chosen = i
        else if (s <= minSum) { minSum = s; minIdx = i }
        i += 1
      }
      val g = if (chosen >= 0) chosen else minIdx
      totals(g) += w
      Assignment(id, w, g)
    }
  }

  /** DataFrame wrapper: weights frame (idCol, weightCol) is consumed in
    * descending weight order (the reference feeds the packer its
    * popularity-sorted frame, O1/O3) and returns (id, weight, group_id).
    */
  def packDF(spark: SparkSession, weights: DataFrame,
             idCol: String, weightCol: String,
             numGroups: Int = 25, cap: Long = 7000L): DataFrame = {
    import spark.implicits._
    val items = weights
      .select(col(idCol).cast("string").as("id"), col(weightCol).cast("long").as("w"))
      .orderBy(col("w").desc, col("id").asc)
      .as[(String, Long)].collect().toSeq
    pack(items, numGroups, cap)
      .toDF("id", "weight", "group_id")
      .withColumnRenamed("id", idCol)
  }
}
