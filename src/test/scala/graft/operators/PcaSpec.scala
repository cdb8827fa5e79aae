package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class PcaSpec extends SparkSpec {

  private def emb(rows: Seq[Seq[Double]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_))),
      StructType(Seq(StructField("embedding", ArrayType(DoubleType)))))

  test("power iteration locks onto a planted dominant axis") {
    // energy 10x along dim 3; the iterate's max-abs component must be
    // dim 3 at exactly vecScale (max-abs normalization pins it there)
    val rows = Seq.fill(20)(Seq(0.1, -0.1, 10.0, 0.1)) ++
      Seq.fill(5)(Seq(1.0, 0.5, 0.0, -0.5))
    val out = Pca.dominantDirection(emb(rows), "embedding", dims = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out(3L)._1 shouldBe 4096L
    // off-axis loadings are an order of magnitude smaller
    Seq(1L, 2L, 4L).foreach(d => math.abs(out(d)._1) should be < 410L)
    // diagonal energy: sum of quantized squares, dim 3 dominates
    out(3L)._2 should be > out(1L)._2 * 50
  }

  test("deterministic: identical reruns, exact integer output") {
    val rows = (1 to 30).map(i =>
      Seq(math.sin(i * 0.7), math.cos(i * 1.3), math.sin(i * 2.1) * 2))
    val a = Pca.dominantDirection(emb(rows), "embedding", dims = 3)
      .collect().map(_.toSeq).toSeq
    val b = Pca.dominantDirection(emb(rows), "embedding", dims = 3)
      .collect().map(_.toSeq).toSeq
    a shouldBe b
  }

  test("all-zero corpus degenerates to the zero vector, not a crash") {
    val out = Pca.dominantDirection(
        emb(Seq.fill(4)(Seq(0.0, 0.0))), "embedding", dims = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 0L, 2L -> 0L)
  }
}
