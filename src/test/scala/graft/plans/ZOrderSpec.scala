package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  private def key(a: Long, b: Long): Long = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(ZOrder.morton2(col("a"), col("b"))).head().getLong(0)
  }

  test("morton2 interleaves bits: a to even positions, b to odd") {
    key(0L, 0L) shouldBe 0L
    key(1L, 0L) shouldBe 1L   // a bit 0 -> key bit 0
    key(0L, 1L) shouldBe 2L   // b bit 0 -> key bit 1
    key(3L, 3L) shouldBe 15L  // 0b11,0b11 -> 0b1111
    key(5L, 0L) shouldBe 17L  // 0b101 -> bits 0 and 4
    key(0L, 5L) shouldBe 34L  // same, odd lane
  }

  test("morton2/demorton2 round-trip on random coordinates") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((rnd.nextInt(Int.MaxValue).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
    val df = rows.toDF("a", "b")
      .withColumn("zkey", ZOrder.morton2(col("a"), col("b")))
    val (ra, rb) = ZOrder.demorton2(col("zkey"))
    df.select(col("a"), col("b"), ra.as("ra"), rb.as("rb"))
      .filter(col("a") =!= col("ra") || col("b") =!= col("rb"))
      .count() shouldBe 0L
  }

  test("z-order sort tightens both columns' ranges per chunk") {
    import spark.implicits._
    // 32x32 grid; in z-order, any aligned run of 64 keys spans an
    // 8x8 tile, so per-chunk min/max of BOTH coords is 8 wide — a
    // single-column sort would leave the other column's range at 32
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val sorted = grid.toDF("x", "y")
      .withColumn("zkey", ZOrder.morton2(col("x"), col("y")))
      .orderBy("zkey").collect().map(r => (r.getLong(0), r.getLong(1)))
    val chunks = sorted.grouped(64).toSeq
    chunks should have size 16
    for (c <- chunks) {
      (c.map(_._1).max - c.map(_._1).min) should be <= 7L
      (c.map(_._2).max - c.map(_._2).min) should be <= 7L
    }
  }
}
