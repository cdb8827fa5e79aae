package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Restart-from-checkpoint recovery for the curation sink: the stream
  * stops (crash stand-in) after processing some input, a NEW query
  * starts from the same checkpoint over the same source, and the
  * union of sink outputs must be exactly the batch answer — no lost
  * batches, no doubled docs. This is the property the retry-safe
  * state-commit ordering (sink first, state append after) exists
  * for; a file source + checkpointLocation is the restartable shape
  * (MemoryStream cannot recover across query instances).
  */
class StreamingRestartSpec extends SparkSpec {

  private val good = "the stream of data is clean and ready for the training corpus today"
  private val goodB = "a different document about the engine and its many moving parts in code"
  private val goodC = "an entirely new and different story with the usual amount of words in it"

  test("curation sink resumes from checkpoint without loss or duplication") {
    val dir = Files.createTempDirectory("restart_src").toString
    val ckpt = Files.createTempDirectory("restart_ck").toString
    val state = Files.createTempDirectory("restart_state").toString + "/state"
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    @volatile var accepted = Vector.empty[Long]

    def writeFile(name: String, rows: Seq[(Long, String)]): Unit = {
      val implicits = spark.implicits; import implicits._
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(s"$dir/staged_$name")
      // move complete parquet dirs into the watched dir atomically
      val src = new java.io.File(s"$dir/staged_$name")
      src.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(s"$dir/${name}_$i.parquet"))
        }
    }

    def run(): Unit = {
      val in = spark.readStream.schema(schema).parquet(s"$dir/*.parquet")
      val q = StreamingCuration.curationSink(in, "text", "doc_id", state,
          b => accepted = accepted ++ b.select("doc_id").collect().map(_.getLong(0)))
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }

    // phase 1: doc 1 accepted, doc 2 an exact dup of it
    writeFile("a", Seq(1L -> good, 2L -> good))
    run()
    accepted.sorted shouldBe Vector(1L)

    // phase 2 (after "crash"): doc 3 dups the ACCEPTED doc 1 from
    // phase-1 state, doc 4 and 5 are new; a fresh query instance must
    // pick up both checkpoint offsets and curation state
    writeFile("b", Seq(3L -> good, 4L -> goodB, 5L -> goodC))
    run()
    accepted.sorted shouldBe Vector(1L, 4L, 5L)

    // phase 3: nothing new -> restart must not reprocess anything
    run()
    accepted.sorted shouldBe Vector(1L, 4L, 5L)
  }
}
