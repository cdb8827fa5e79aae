package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.Files

class StreamingEmbedDedupSpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Double])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(DoubleType)))))

  // parallel vectors share EVERY band key (all plane signs equal);
  // a sign-flipped vector shares none
  private val base = Seq.tabulate(64)(i => math.sin(i * 0.7) + 0.1)
  private val other = base.map(-_)

  test("cross-batch: a vector colliding with an accepted one is dropped") {
    val state = Files.createTempDirectory("embdd").toString + "/bands"
    val a1 = StreamingEmbedDedup.acceptBatch(
        emb(1L -> base, 2L -> other), "embedding", "vec_id", state)
      .collect().map(_.getLong(0)).sorted
    a1 shouldBe Array(1L, 2L)
    // batch 2: 3 parallels accepted 1 (scaled copy -> same band keys),
    // 4 is new
    val a2 = StreamingEmbedDedup.acceptBatch(
        emb(3L -> base.map(_ * 0.5), 4L -> Seq.tabulate(64)(i => math.cos(i * 1.3))),
        "embedding", "vec_id", state)
      .collect().map(_.getLong(0)).sorted
    a2 shouldBe Array(4L)
  }

  test("intra-batch: transitive min-id keep policy, like the text screen") {
    val state = Files.createTempDirectory("embdd2").toString + "/bands"
    // 5 and 7 are both parallel to base -> one component, min id 5 wins
    val acc = StreamingEmbedDedup.acceptBatch(
        emb(5L -> base, 7L -> base.map(_ * 2.0), 9L -> other),
        "embedding", "vec_id", state)
      .collect().map(_.getLong(0)).sorted
    acc shouldBe Array(5L, 9L)
  }

  test("retry safety: state commits only keys of accepted vectors") {
    val state = Files.createTempDirectory("embdd3").toString + "/bands"
    StreamingEmbedDedup.acceptBatch(
      emb(1L -> base, 2L -> base.map(_ * 3.0)), "embedding", "vec_id", state)
    // only doc 1's keys persisted: 4 bands x 1 accepted vector
    val keys = spark.read.parquet(state)
    keys.select("doc").distinct().collect().map(_.getLong(0)) shouldBe Array(1L)
    keys.count() shouldBe 4L
  }
}
