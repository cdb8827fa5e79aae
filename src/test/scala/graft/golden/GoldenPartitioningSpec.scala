package graft.golden

import graft.plans.BinPacking
import graft.sources.Layers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Replay of the ingest load-balancing path (reference §3.1:
  * create_category_group_messages) over the REAL feedback artifacts:
  * current categories left-joined to the popularity file (J1), missing
  * popularity defaulting to weight 1 (F5), consumed popularity-sorted
  * (O1/O3) by the 25-way / 7000-cap greedy packer (§2.10).
  */
class GoldenPartitioningSpec extends GoldenSpec {

  test("reference popularity data packs into <= 25 bounded groups") {
    val pop = Layers.readCsv(spark,
      s"$refData/twitch_project_miscellaneous/category_popularity_data/category_popularity_data.csv",
      StructType(Seq(StructField("category_id", StringType),
        StructField("num_of_streamers", LongType))))
    val cats = Layers.readCsv(spark,
      s"$refData/twitch_project_miscellaneous/current_data/current_categories.csv",
      StructType(Seq(StructField("category_id", StringType),
        StructField("category_name", StringType), StructField("igdb_id", StringType))))

    pop.count() shouldBe 4596
    cats.count() shouldBe 6643

    val weighted = cats.join(pop, Seq("category_id"), "left")
      .select(col("category_id"),
        coalesce(col("num_of_streamers"), lit(1L)).as("num_of_streamers"))

    val plan = BinPacking.packDF(spark, weighted,
      "category_id", "num_of_streamers", numGroups = 25, cap = 7000L)
      .collect()

    // every category assigned exactly once
    plan.length shouldBe 6643
    plan.map(_.getAs[String]("category_id")).distinct.length shouldBe 6643
    val groups = plan.groupBy(_.getAs[Int]("group_id"))
    groups.size should be <= 25
    // weight conservation vs the joined input (some popularity rows
    // reference categories absent from current_categories, so the input
    // sum — not the raw file sum — is the invariant)
    val total = plan.map(_.getAs[Long]("weight")).sum
    total shouldBe weighted.agg(sum("num_of_streamers")).head().getLong(0)
    // no group may exceed cap unless forced by a single oversized item
    groups.values.foreach { g =>
      val w = g.map(_.getAs[Long]("weight")).sum
      if (w > 7000L) {
        // over-cap groups must contain an item that alone exceeds the
        // cap OR have been the least-loaded fallback — in either case
        // removing its largest item must bring it under cap + largest
        val max = g.map(_.getAs[Long]("weight")).max
        assert(w - max <= 7000L || max > 7000L,
          s"group over cap without an oversized/fallback justification: $w")
      }
    }
  }
}
