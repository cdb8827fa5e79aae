package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks re-expressing the reference's hand-rolled
  * pandas idioms as declarative, order-independent Spark plans.
  */
object Relational {

  /** Incremental dimension upsert, existing row wins (reference D3:
    * `concat([current, new]).drop_duplicates(subset=key, keep="first")`,
    * scripts/curate_data/curate_users_data.py:80). Order-free
    * formulation: current ∪ (incoming ⟕anti current). At scale: `current`
    * is the accumulated dim (large), `incoming` one snapshot (small) —
    * the anti-join broadcasts `incoming`'s keys.
    */
  def upsertKeepFirst(current: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    current.unionByName(incoming.join(current, keys, "left_anti"))

  /** Delta rows emitted by an upsert (reference J4: symmetric-difference
    * trick `concat([updated, old]).drop_duplicates(keep=False)`,
    * scripts/curate_data/curate_users_data.py:84). Since old ⊆ updated by
    * construction, the symmetric difference is exactly a left anti-join.
    */
  def upsertDelta(incoming: DataFrame, current: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(current, keys, "left_anti")

  /** CDC changelog compaction — the lakehouse MERGE primitive: given a
    * changelog of per-key operations in event order, materialize the
    * final table state. The LAST operation per key wins (last-writer-
    * wins under the caller's TOTAL ordering columns — pass enough
    * columns to break ties, e.g. (ts, event_id)); a key whose last
    * operation satisfies `isDelete` is absent from the result
    * (tombstone).
    *
    * Scale shape: one key-partitioned row_number window — the same
    * single Exchange + partition sort every CDC compactor pays; no
    * joins, no driver state. Works identically as a foreachBatch body
    * (merge batch-last rows into swap state via `upsertKeepFirst`).
    */
  /** Last row per key under the caller's total order — `cdcCompact`
    * WITH tombstones retained (what a CDC state table persists so a
    * late-arriving older upsert cannot resurrect a deleted key).
    */
  def keepLast(log: DataFrame, keyCol: String,
               orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "keepLast needs at least one ordering column")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(_.desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  def cdcCompact(log: DataFrame, keyCol: String, orderCols: Seq[Column],
                 isDelete: Column): DataFrame =
    keepLast(log, keyCol, orderCols).filter(!isDelete)

  /** Positional (rank-aligned) zip of two frames (reference J5: pandas
    * `concat(axis=1)`, src/other/create_category_group_messages.py:155).
    * No positional join exists in Spark; both sides get a row_number over
    * an explicit deterministic ordering and are equi-joined on it. Inner
    * join == pandas rows-in-common; callers wanting pandas' NaN-padding
    * use "full_outer".
    *
    * The unpartitioned row_number collapses each side to ONE partition,
    * so this operator is for SMALL frames only (the reference use is
    * <=100 rows). `maxRows` enforces that contract: each side is counted
    * (with an early-stop limit, so the check never scans past the bound)
    * and the call fails fast instead of silently single-threading a big
    * frame.
    */
  def positionalZip(a: DataFrame, orderA: Seq[Column],
                    b: DataFrame, orderB: Seq[Column],
                    joinType: String = "inner",
                    maxRows: Int = 10000): DataFrame = {
    def guard(df: DataFrame, side: String): Unit =
      require(df.limit(maxRows + 1).count() <= maxRows,
        s"positionalZip $side side exceeds maxRows=$maxRows; it is a " +
          "single-partition operator — pre-aggregate or raise maxRows only " +
          "if the frame is genuinely small")
    guard(a, "left"); guard(b, "right")
    val ra = a.withColumn("rn", row_number().over(Window.orderBy(orderA: _*)))
    val rb = b.withColumn("rn", row_number().over(Window.orderBy(orderB: _*)))
    ra.join(rb, Seq("rn"), joinType)
  }

  /** Empty-string -> sentinel fill (reference F4, e.g.
    * scripts/process_raw_data/process_raw_users_data.py:66-67).
    */
  def sentinelFill(c: Column, sentinel: String): Column =
    when(c.isNull || c === "", lit(sentinel)).otherwise(c)
}
