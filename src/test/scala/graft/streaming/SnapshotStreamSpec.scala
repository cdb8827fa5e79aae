package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.nio.file.Files

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class SnapshotStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, u: Long, typ: String = "stream") =
    Ev(id, ts(t), u, typ, 4.0, """{"k": 1}""")

  test("stateful dedup drops cross-batch duplicates within watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val deduped = SnapshotStream.dedupedEvents(
      in.toDF(), Seq("event_id"), watermark = "1 hour")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    in.addData(ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:01:00", 2))
    q.processAllAvailable()
    in.addData(ev(1, "2024-01-01 10:00:00", 1), ev(3, "2024-01-01 10:02:00", 3))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted
    q.stop()
    ids shouldBe Array(1L, 2L, 3L)
  }

  test("streaming curated chain equals the batch transform result") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      ev(1, "2026-01-11 17:07:40", 10), ev(2, "2026-01-11 17:08:40", 10), // same slot+user -> dedup
      ev(3, "2026-01-11 17:40:00", 11))
    val in = MemoryStream[Ev]
    val q = SnapshotStream.curatedStream(in.toDF())
      .writeStream.format("memory").queryName("curated_out")
      .outputMode("append").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val pk = Seq("user_id", "day_date_id", "time_of_day_id")
    val streamed = spark.table("curated_out")
    val batch = graft.operators.SnapshotPipeline.curateEvents(
      graft.operators.SnapshotPipeline.processEvents(rows.toDF()))
    // batch and streaming agree on the PK set (the surviving row within
    // a snapshot may differ: min-id window vs first-arrival state)
    streamed.select(pk.map(col): _*).exceptAll(batch.select(pk.map(col): _*))
      .count() shouldBe 0
    batch.select(pk.map(col): _*).exceptAll(streamed.select(pk.map(col): _*))
      .count() shouldBe 0
    streamed.count() shouldBe 2
  }

  test("windowed popularity emits per-window counts after watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = SnapshotStream.windowedPopularity(in.toDF(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("pop_out")
      .outputMode("append").start()
    in.addData(
      ev(1, "2024-01-01 10:00:10", 1, "a"), ev(2, "2024-01-01 10:05:00", 2, "a"),
      ev(3, "2024-01-01 10:20:00", 3, "b"))
    q.processAllAvailable()
    // advance watermark far past the windows so they close
    in.addData(ev(99, "2024-01-01 12:00:00", 9, "z"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("pop_out")
      .select("event_type", "num_of_streamers")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out("a") shouldBe 2L
    out("b") shouldBe 1L
  }

  test("runningCounts accumulates keyed state across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = SnapshotStream.runningCounts(in.toDF(), "event_type")
      .writeStream.format("memory").queryName("rc_out")
      .outputMode("update").start()
    in.addData(ev(1, "2024-01-01 10:00:00", 1, "a"), ev(2, "2024-01-01 10:00:01", 2, "a"))
    q.processAllAvailable()
    in.addData(ev(3, "2024-01-01 10:01:00", 3, "a"), ev(4, "2024-01-01 10:01:01", 4, "b"))
    q.processAllAvailable()
    q.stop()
    // last update per key wins
    val out = spark.table("rc_out").groupBy("event_type")
      .agg(max("running_count").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("a" -> 3L, "b" -> 1L)
  }

  test("session_window groups events by gap, closing after the watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = SnapshotStream.sessionCounts(in.toDF(), "user_id", gap = "10 minutes",
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    in.addData(
      ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:05:00", 1), // one session
      ev(3, "2024-01-01 11:00:00", 1)) // new session after >10min gap
    q.processAllAvailable()
    in.addData(ev(9, "2024-01-01 13:00:00", 9)) // advance watermark
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_out").filter("user_id = 1")
      .orderBy("session_start").collect()
    out.map(_.getAs[Long]("n_events")).toSeq shouldBe Seq(2L, 1L)
  }

  test("dimension upsert sink emits only never-seen keys per batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dimDir = Files.createTempDirectory("dim").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    @volatile var deltas = Vector.empty[Set[Long]]

    def loadDim(s: org.apache.spark.sql.SparkSession) =
      try s.read.parquet(s"$dimDir/current") catch {
        case _: Throwable => s.range(0).select(col("id").as("user_id"))
      }
    def saveDelta(d: org.apache.spark.sql.DataFrame): Unit = {
      deltas = deltas :+ d.select("user_id").collect().map(_.getLong(0)).toSet
      val cur = loadDim(d.sparkSession).unionByName(d.select("user_id"))
      cur.write.mode("overwrite").parquet(s"$dimDir/current_next")
      // two-phase to avoid reading the dir being overwritten
      d.sparkSession.read.parquet(s"$dimDir/current_next")
        .write.mode("overwrite").parquet(s"$dimDir/current")
    }

    val in = MemoryStream[Ev]
    val w = SnapshotStream.dimUpsertSink(
      in.toDF().select("user_id"), Seq("user_id"), loadDim, saveDelta)
    val q = w.option("checkpointLocation", ckpt).start()
    in.addData(ev(1, "2024-01-01 10:00:00", 10), ev(2, "2024-01-01 10:00:01", 11))
    q.processAllAvailable()
    in.addData(ev(3, "2024-01-01 10:01:00", 10), ev(4, "2024-01-01 10:01:01", 12))
    q.processAllAvailable()
    q.stop()
    deltas shouldBe Vector(Set(10L, 11L), Set(12L))
  }
}
