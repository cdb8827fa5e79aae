package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

case class Doc(doc_id: Long, text: String)

class StreamingDedupSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog again and again today ok"
  private val other = "completely different content about distributed query engines and storage"

  test("acceptBatch rejects intra-batch and cross-batch near-duplicates") {
    import spark.implicits._
    val table = Files.createTempDirectory("bands").toString + "/bands"

    val b1 = Seq(Doc(1, base), Doc(2, base + " extra"), Doc(3, other)).toDF()
    val a1 = StreamingDedup.acceptBatch(b1, "text", "doc_id", table)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    a1 shouldBe Array(1L, 3L) // 2 near-dups 1 within the batch

    val b2 = Seq(Doc(4, base + " ok more"), Doc(5, "entirely novel text unseen before by anything")).toDF()
    val a2 = StreamingDedup.acceptBatch(b2, "text", "doc_id", table)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    a2 shouldBe Array(5L) // 4 near-dups doc 1 from batch 1
  }

  test("dedupSink filters a stream across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val table = Files.createTempDirectory("bands2").toString + "/bands"
    val ckpt = Files.createTempDirectory("ck").toString
    @volatile var accepted = Vector.empty[Long]

    val in = MemoryStream[Doc]
    val w = StreamingDedup.dedupSink(in.toDF(), "text", "doc_id", table,
      b => accepted = accepted ++ b.select("doc_id").collect().map(_.getLong(0)))
    val q = w.option("checkpointLocation", ckpt).start()
    in.addData(Doc(10, base), Doc(11, other))
    q.processAllAvailable()
    in.addData(Doc(12, base + " tail"), Doc(13, "brand new words never observed anywhere else"))
    q.processAllAvailable()
    q.stop()
    accepted.sorted shouldBe Vector(10L, 11L, 13L)
  }
}
