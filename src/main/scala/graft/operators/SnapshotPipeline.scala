package graft.operators

import graft.functions.TimeFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's medallion snapshot chain (process -> curate ->
  * popularity; reference §3.1 trace: src/process_raw_data/
  * process_raw_streams_data.py:124-179 -> src/curate_data/
  * curate_streams_data.py:33-81 -> src/other/get_category_popularity
  * .py:30-52) re-expressed over the `events` stream table as pure
  * DataFrame -> DataFrame transforms.
  *
  * Batch and streaming share these functions: `events` can be a static
  * frame or a `readStream` source — every transform here is
  * stateless-narrow except the final dedup/aggregate, which in streaming
  * mode runs under a watermark (see graft.streaming).
  */
object SnapshotPipeline {

  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** "Process" stage: snapshot-key assignment (nearest 15-min slot, the
    * reference's argmin-over-time-dim collapsed to arithmetic), validity
    * filter (reference F1 dropped non-numeric test ids), sentinel fill
    * (reference F4), and JSON props parsing (reference X6).
    */
  def processEvents(events: DataFrame): DataFrame =
    events
      .filter(col("event_id").isNotNull && col("user_id").isNotNull && col("user_id") >= 0)
      .withColumn("day_date_id", TimeFns.snapshotDayId(col("ts")))
      .withColumn("time_of_day_id", TimeFns.snapshotTimeId(col("ts")))
      .withColumn("event_type",
        Relational.sentinelFill(col("event_type"), "notavailable"))
      .withColumn("prop_k", from_json(col("props"), propsSchema).getField("k"))

  /** "Curate" stage: narrow projection to the serving schema, derived
    * hours_watched (reference P5: viewer_count * 0.25 — one 15-min
    * snapshot = quarter hour), and PK dedup keeping the minimum event id
    * per (user, snapshot) — deterministic replacement for pandas
    * keep="first" (reference D2).
    */
  /** Narrow serving-schema projection of the processed stream — shared
    * verbatim by batch and streaming (it is stateless).
    */
  def curateProjection(processed: DataFrame): DataFrame =
    processed.select(
      col("event_id"), col("day_date_id"), col("time_of_day_id"),
      col("user_id"), col("event_type"), col("value"),
      (col("value") * 0.25).as("hours_watched"), col("prop_k"))

  def curateEvents(processed: DataFrame): DataFrame =
    Dedup.keepFirst(curateProjection(processed),
      keys = Seq("user_id", "day_date_id", "time_of_day_id"),
      order = Seq(col("event_id").asc))

  /** "Popularity" feedback aggregate (reference A1+O1): per-key count
    * over the curated fact, sorted descending — the weights that drive
    * the next cycle's bin-packing partitioner.
    */
  def popularity(curated: DataFrame, key: String = "event_type"): DataFrame =
    curated.groupBy(col(key))
      .agg(count(col("event_id")).as("num_of_streamers"))
      .orderBy(col("num_of_streamers").desc, col(key).asc)
}
