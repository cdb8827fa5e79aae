package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSource V2 deterministic event replayer — the in-engine stand-in
  * for the reference's REST/SQS ingestion fan-out (reference S5-S7: 25
  * concurrent workers each fetching a category group; SURVEY §7.7 calls
  * for a deterministic generator/replayer in their place).
  *
  * `spark.read.format("graft-replay")   // or the full class name
  *   .option("rows", 100000).option("partitions", 32)
  *   .option("seed", 42).load()`
  *
  * produces the `events` schema (the short name resolves through the
  * DataSourceRegister service file). Each input partition derives its rows
  * purely from (seed, partitionId, rowInPartition), so any subset of
  * partitions can be regenerated independently and identically — task
  * retries, speculative execution, and partial replays all see the same
  * bytes, which is exactly the property the reference gets from its
  * immutable raw layer ("the replayable log").
  */
class ReplaySource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-replay"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplaySource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ReplayTable(properties.asScala.toMap)
}

object ReplaySource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  val eventTypes: Array[String] = Array("click", "purchase", "error", "signup", "view")

  /** Park–Miller modulus / multiplier for the per-row hash chain. */
  val Mod: Long = 2147483647L // 2^31 - 1
  val Mul: Long = 48271L

  /** Deterministic row (epoch-micros ts over one synthetic day).
    *
    * Fields derive from a chained Park–Miller LCG over the GLOBAL row id,
    * not `java.util.Random`: every step is `h * 48271 % (2^31-1)` whose
    * product stays below 2^47, so the identical arithmetic runs overflow-
    * free as plain BIGINT SQL — the DuckDB oracle for q35 regenerates
    * these exact rows with `range()` + the same five chained steps,
    * giving the replay source a hash-verified correctness contract
    * instead of a rows-only one. Depending only on (seed, id) also keeps
    * the replay property: any partitioning yields byte-identical rows.
    */
  def row(seed: Long, part: Int, i: Long, rowsPerPart: Long): InternalRow = {
    val id = part * rowsPerPart + i
    val h0 = java.lang.Math.floorMod(seed * 1000003L + id, Mod)
    val h1 = h0 * Mul % Mod
    val h2 = h1 * Mul % Mod
    val h3 = h2 * Mul % Mod
    val h4 = h3 * Mul % Mod
    val h5 = h4 * Mul % Mod
    val tsMicros = 1704067200000000L + (id * 900L) + h1 % 1000000L
    InternalRow(
      id,
      tsMicros,
      h2 % 1000L,
      UTF8String.fromString(eventTypes((h3 % 5).toInt)),
      (h4 % 20001L) / 100.0,
      UTF8String.fromString(s"""{"k": ${h5 % 100}}"""))
  }
}

private class ReplayTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "graft_replay"
  override def schema(): StructType = ReplaySource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val all = props ++ options.asScala
    new ReplayScanBuilder(
      all.getOrElse("rows", "1000").toLong,
      all.getOrElse("partitions", "4").toInt,
      all.getOrElse("seed", "42").toLong)
  }
}

// Mutable builder holding the pruned schema; the built Scan is a case
// class so equality captures (rows, partitions, seed, columns) — two
// scans of the same options AND the same pruned columns must be EQUAL,
// or BatchScanExec canonicalization treats them as different relations
// and exchange/stage reuse never fires above this source — a self-join
// over a replay frame then recomputes the whole subtree per branch
// (file-based sources get this equality from their paths).
private class ReplayScanBuilder(rows: Long, partitions: Int, seed: Long)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ReplaySource.schema
  // the generator derives every field from the same per-row hash chain,
  // so pruning costs nothing to honor: emit only the requested columns
  // (a 2-of-6 projection then moves a third of the bytes)
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    ReplayScan(rows, partitions, seed,
      required.fieldNames.map(ReplaySource.schema.fieldIndex).toSeq)
}

private case class ReplayScan(rows: Long, partitions: Int, seed: Long,
                              colIdx: Seq[Int]) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType =
    StructType(colIdx.map(ReplaySource.schema.fields))
  override def toBatch: Batch = this

  // per-column serialized widths (strings estimated at their generated
  // lengths); accurate statistics let the planner auto-broadcast a
  // small replay frame exactly like a parquet side with footer stats
  private val colBytes = Array(8L, 8L, 8L, 8L, 8L, 12L)
  override def estimateStatistics(): Statistics = new Statistics {
    private val rowBytes = colIdx.map(colBytes).sum.max(1L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * rowBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val perPart = (rows + partitions - 1) / partitions
    (0 until partitions).map { p =>
      val n = math.max(0L, math.min(perPart, rows - p * perPart))
      ReplayPartition(p, n, perPart, seed, colIdx): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val rp = partition.asInstanceOf[ReplayPartition]
        val idx = rp.colIdx.toArray
        new PartitionReader[InternalRow] {
          private var i = -1L
          override def next(): Boolean = { i += 1; i < rp.n }
          override def get(): InternalRow = {
            val full = ReplaySource.row(rp.seed, rp.part, i, rp.perPart)
            if (idx.length == ReplaySource.schema.length) full
            else InternalRow.fromSeq(idx.toSeq.map(j =>
              full.get(j, ReplaySource.schema.fields(j).dataType)))
          }
          override def close(): Unit = ()
        }
      }
    }
}

private case class ReplayPartition(part: Int, n: Long, perPart: Long,
                                   seed: Long, colIdx: Seq[Int])
  extends InputPartition
