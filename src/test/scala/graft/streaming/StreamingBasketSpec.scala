package graft.streaming

import graft.SparkSpec
import graft.operators.Basket
import org.apache.spark.sql.functions.col

class StreamingBasketSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def items = Seq(
    (1L, 10L), (1L, 11L), (1L, 12L),
    (2L, 10L), (2L, 11L),
    (3L, 10L), (3L, 12L),
    (4L, 11L), (4L, 12L)).toDF("basket", "item")

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("two basket-whole batches merge to the one-shot pair table") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sbasket").toString + "/state"
    StreamingBasket.acceptBatch(
      items.filter(col("basket") % 2 === 0), "basket", "item", st)
    val merged = StreamingBasket.acceptBatch(
      items.filter(col("basket") % 2 === 1), "basket", "item", st)
    val oneShot = items
      .groupBy(col("basket"))
      .agg(org.apache.spark.sql.functions.array_sort(
        org.apache.spark.sql.functions.collect_set(col("item"))).as("ids"))
      .select(org.apache.spark.sql.functions.explode(
        graft.expressions.GraftFunctions.pairCombos(col("ids"))).as("p"))
      .groupBy(col("p.id_a"), col("p.id_b"))
      .count()
    pairsOf(merged) shouldBe pairsOf(
      oneShot.select(col("id_a"), col("id_b"), col("count")))
  }

  test("failed-sink replay is idempotent; null-keyed rows are dropped") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sbasket2").toString + "/state"
    StreamingBasket.acceptBatch(
      items.filter(col("basket") === 1L), "basket", "item", st)
    // simulate a failed sink: mergeBatch ran but commit never did —
    // the state still holds only basket 1, so the RETRY (the full
    // acceptBatch) merges basket 2 against the pre-failure state and
    // counts each pair exactly once
    val b2 = items.filter(col("basket") === 2L)
    StreamingBasket.mergeBatch(b2, "basket", "item", st).count()
    val merged = StreamingBasket.acceptBatch(b2, "basket", "item", st)
    pairsOf(merged) shouldBe Map(
      (10L, 11L) -> 2L, (10L, 12L) -> 1L, (11L, 12L) -> 1L)
    // NOTE: replaying a batch after a SUCCESSFUL commit would
    // double-count — exactly-once across commits is the caller's
    // checkpointing contract, not this operator's
    val nulls = Seq((Option.empty[Long], Option(10L)),
      (Option(9L), Option.empty[Long])).toDF("basket", "item")
    val after = StreamingBasket.acceptBatch(nulls, "basket", "item", st)
    pairsOf(after) shouldBe pairsOf(merged)
  }

  test("state top pairs agree with Basket.pairAffinity supports") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sbasket3").toString + "/state"
    val merged = StreamingBasket.acceptBatch(items, "basket", "item", st)
    val batch = Basket.pairAffinity(items, "basket", "item", minPairs = 1L)
      .select(col("item_a"), col("item_b"), col("n_ab"))
    pairsOf(merged) shouldBe pairsOf(batch)
  }
}
