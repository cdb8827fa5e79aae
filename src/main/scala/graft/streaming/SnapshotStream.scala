package graft.streaming

import graft.functions.TimeFns
import graft.operators.{Relational, SnapshotPipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming restatement of the reference's event-driven
  * 15-minute pipeline (reference §2.11: S3-event/SNS/SQS choreography at
  * micro-batch cadence). Batch and streaming share the SAME transforms —
  * `SnapshotPipeline.processEvents/curateEvents` are stateless-narrow,
  * so they apply unchanged to a streaming DataFrame; only the stateful
  * pieces (dedup, windowed aggregation, dimension upsert) differ and
  * live here.
  *
  * Scale notes: state stores are keyed by the dedup/window keys and
  * bounded by the watermark — at 96 snapshots/day and a 30-minute
  * watermark, state holds ~2 snapshots of keys regardless of history
  * length. The dimension upsert holds NO stream state at all: it
  * anti-joins each micro-batch against the persisted dim (foreachBatch),
  * which keeps state inspectable and identical to the batch semantics
  * (reference D3/J4).
  */
object SnapshotStream {

  /** File-source stream over a raw layer directory (reference S8: each
    * new object in layer N triggers layer N+1; the file source's listing
    * + checkpoint replaces the SNS choreography with effectively-once
    * semantics).
    */
  def readJsonLayer(spark: SparkSession, path: String, schema: StructType,
                    maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(schema)
      .option("multiLine", true)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** Snapshot-key assignment on a stream — same arithmetic expression as
    * batch (nearest 15-min slot; no time-dim join, no state).
    */
  def withSnapshotKeys(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events
      .withColumn("day_date_id", TimeFns.snapshotDayId(col(tsCol)))
      .withColumn("time_of_day_id", TimeFns.snapshotTimeId(col(tsCol)))

  /** Stateful cross-shard dedup (reference D2 streaming: 25 concurrent
    * ingest workers emit overlapping shards; duplicates must be dropped
    * within a snapshot). Watermark bounds the dedup state to the late-
    * arrival window.
    */
  def dedupedEvents(events: DataFrame, keys: Seq[String],
                    tsCol: String = "ts", watermark: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicates(keys :+ tsCol)

  /** Tumbling-window popularity aggregate (reference A1 as a stream):
    * per-window per-key counts, emitted once the watermark passes —
    * the streaming form of the popularity feedback loop.
    */
  def windowedPopularity(events: DataFrame, key: String = "event_type",
                         tsCol: String = "ts", watermark: String = "30 minutes",
                         window: String = "15 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col(key))
      .agg(count(lit(1)).as("num_of_streamers"))
      .select(col("window.start").as("win_start"), col(key),
        col("num_of_streamers"))

  /** Incremental dimension upsert with delta emission (reference
    * D3+J4 streaming: fold observed keys into the persisted "current"
    * dim, emit only never-seen keys). foreachBatch + anti-join keeps
    * semantics identical to batch and the state in a queryable table.
    *
    * @param loadDim   reads the current dim (empty DataFrame when none)
    * @param saveDelta persists the delta (append) — the curated output
    */
  def dimUpsertSink(stream: DataFrame, keys: Seq[String],
                    loadDim: SparkSession => DataFrame,
                    saveDelta: DataFrame => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val current = loadDim(spark)
        val delta = Relational.upsertDelta(
          batch.dropDuplicates(keys), current, keys)
        // reference F6: skip the write entirely on an empty delta
        if (!delta.isEmpty) saveDelta(delta)
      }

  /** The full streaming snapshot chain: process (shared stateless
    * transform) -> watermarked PK dedup -> curate projection.
    *
    * The batch chain dedups with a min-event-id window (deterministic
    * keep-first); streaming can't run arbitrary windows, so the PK dedup
    * is the watermarked `dropDuplicates` state store instead (reference
    * D2 streaming semantics: within one snapshot, duplicate PK rows are
    * equivalent shard overlaps, so which one survives is immaterial).
    */
  def curatedStream(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    SnapshotPipeline.curateProjection(
      SnapshotPipeline.processEvents(events)
        .withWatermark("ts", watermark)
        .dropDuplicates(Seq("user_id", "day_date_id", "time_of_day_id")))

  /** Streaming gap-based sessions via Spark's native session_window —
    * the streaming counterpart of operators.Sessionize (same gap
    * semantics; state closes once the watermark passes the gap).
    */
  def sessionCounts(events: DataFrame, keyCol: String, gap: String,
                    tsCol: String = "ts", watermark: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Running per-key counts with explicit keyed state (reference §2.11
    * feedback loop: the popularity of snapshot N drives the partitioning
    * of snapshot N+1 — this is its always-current streaming form).
    * `mapGroupsWithState` keeps one Long per key; emitted rows carry the
    * updated running count each micro-batch (output mode "update").
    */
  def runningCounts(events: DataFrame, keyCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    events.select(col(keyCol).cast("string")).as[String]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[String], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (key, n)
      }
      .toDF(keyCol, "running_count")
  }

  /** Convenience: run a streaming query to completion over a bounded
    * source (tests / reprocessing).
    */
  def runOnce(w: DataStreamWriter[org.apache.spark.sql.Row], checkpoint: String): Unit = {
    val q = w.option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
