package graft.plans

import graft.operators.{Relational, SnapshotPipeline, StreamsEtl}
import graft.sources.Layers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch orchestration of one snapshot cycle — the driver-sequenced
  * restatement of the reference's Lambda/SNS/SQS choreography (reference
  * §3.1: every stage is a separate process chained by S3 events; here
  * the stages are DataFrame transforms chained by layer writes, and the
  * feedback loop — popularity weights driving the next cycle's ingest
  * partitioning — is the returned pack plan).
  *
  * Materialization points mirror the reference's layers: each stage
  * writes snapshot-partitioned parquet before the next reads it, so any
  * stage is independently replayable from the previous layer (the
  * reference's "raw layer is the replayable log" property, README.md:20).
  */
object Orchestrator {

  final case class SnapshotResult(
      curated: DataFrame,
      popularity: DataFrame,
      packPlan: DataFrame)

  /** Run the fact chain for one snapshot of `events`-shaped data:
    * process -> curate -> popularity -> bin-pack (the next cycle's
    * partition assignment). When `layerRoot` is given, processed and
    * curated layers are persisted as snapshot-partitioned parquet.
    */
  def runSnapshot(spark: SparkSession, raw: DataFrame,
                  layerRoot: Option[String] = None,
                  numGroups: Int = 25, cap: Long = 7000L): SnapshotResult = {
    val processed = SnapshotPipeline.processEvents(raw)
    val curatedAll = SnapshotPipeline.curateEvents(processed)

    val curated = layerRoot match {
      case Some(root) =>
        Layers.writePartitioned(curatedAll, s"$root/curated_events")
        Layers.readPartitioned(spark, s"$root/curated_events")
      case None => curatedAll
    }

    val popularity = SnapshotPipeline.popularity(curated)
    val packPlan = BinPacking.packDF(spark, popularity,
      "event_type", "num_of_streamers", numGroups, cap)
    SnapshotResult(curated, popularity, packPlan)
  }

  /** Dimension upsert step for one snapshot (users-style chain):
    * incoming keys folded into the persisted dim, delta returned
    * (reference §3.2; empty delta short-circuits the write — F6).
    */
  def upsertDim(spark: SparkSession, incoming: DataFrame, dimPath: String,
                keys: Seq[String]): DataFrame = {
    // absent dim = first snapshot; any OTHER read failure must propagate
    // (treating it as "empty" would overwrite the accumulated dim with
    // one batch's rows — silent state loss)
    val current = graft.sources.PathIO.readSwapState(
      spark, dimPath, incoming.limit(0))
    // localCheckpoint cuts the lineage back to materialized partitions:
    // the delta must stay readable AFTER the dim swap below replaces the
    // files its plan would otherwise re-scan
    val delta = Relational.upsertDelta(incoming, current, keys)
      .localCheckpoint(true)
    if (!delta.isEmpty) {
      // shared durable state replacement: move-aside + checked renames
      // (PathIO.writeSwap), same discipline as StreamingBudget.commit
      graft.sources.PathIO.writeSwap(current.unionByName(delta), dimPath)
    }
    delta
  }
}
