package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small filesystem helpers for state tables. A bare
  * `try read catch { _ => empty }` is a data-loss hazard: a TRANSIENT
  * read failure would masquerade as "no state yet" and let the caller
  * overwrite accumulated state with one batch. These helpers distinguish
  * "path absent" (legitimate empty state) from real errors (rethrown).
  */
object PathIO {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Read a parquet state table, or return `empty` ONLY when the path
    * does not exist. Any other failure propagates.
    */
  def readParquetOrEmpty(spark: SparkSession, path: String, empty: => DataFrame): DataFrame =
    if (exists(spark, path)) spark.read.parquet(path) else empty

  /** Delete a directory tree if present (state-partition retirement). */
  def deleteDir(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (f.exists(p)) f.delete(p, true)
  }

  /** Atomic-ish directory swap: rename `next` over `target` (delete the
    * old target first). One write instead of write + copy, and no stale
    * `.next` directory left behind.
    */
  def swapInto(spark: SparkSession, next: String, target: String): Unit = {
    val f = fs(spark, target)
    val t = new Path(target)
    if (f.exists(t)) f.delete(t, true)
    f.rename(new Path(next), t)
  }

  /** Durable state replacement: write `df` to `target.next`, move the
    * old target ASIDE (rename, not delete), rename `.next` in, then
    * drop the aside copy. At every instant either the old or the new
    * state exists under a recoverable name — a crash can strand an
    * `.old`/`.next` directory but never leaves the target's history
    * unrecoverable, which matters because a MISSING state path reads
    * as legitimate "no state yet" (`readParquetOrEmpty`) and would
    * silently reset whatever the state accumulates. Rename results are
    * CHECKED: Hadoop `FileSystem.rename` reports failure by boolean,
    * not exception.
    *
    * The shared discipline for every whole-table state writer
    * (`StreamingBudget.commit`, `Orchestrator` dims); bucket-wise
    * writers (`StreamingComponents`) use dynamic partition overwrite
    * instead, whose per-partition commit has its own replay story.
    *
    * CONCURRENCY CONTRACT: writeSwap and readSwapState on the same
    * target must be strictly serialized (single writer, readers only
    * between swaps). During a healthy swap the target is transiently
    * missing while `.old` exists — a CONCURRENT readSwapState would
    * "heal" by renaming `.old` back into place, making this writer's
    * checked rename fail and stranding the new state in `.next`. The
    * engine's callers satisfy the contract by construction: every
    * state table is owned by one foreachBatch/orchestrator loop, and
    * Structured Streaming serializes a query's batches. Crash recovery
    * (the reason the healing path exists) is inherently post-mortem,
    * so it never overlaps a live writer.
    */
  def writeSwap(df: DataFrame, target: String): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, target)
    val t = new Path(target)
    val next = new Path(target + ".next")
    val old = new Path(target + ".old")
    df.write.mode("overwrite").parquet(next.toString)
    if (f.exists(old)) f.delete(old, true)
    val hadTarget = f.exists(t)
    if (hadTarget)
      require(f.rename(t, old), s"failed to move $t aside to $old")
    require(f.rename(next, t),
      s"failed to move $next into place at $t" +
        (if (hadTarget) s" — previous state preserved at $old" else ""))
    if (hadTarget) f.delete(old, true)
  }

  /** Read a `writeSwap`-managed state table, healing an interrupted
    * swap: if the target is missing but `.old` exists (a crash fell
    * between the two renames), the aside copy IS the current state —
    * restore it before reading. Without this, the crash window would
    * read as "no state yet" and silently reset the table.
    *
    * Subject to the writeSwap CONCURRENCY CONTRACT above: never call
    * while a writeSwap on the same target may be in flight — healing
    * would race the swap's transient target-missing window.
    */
  def readSwapState(spark: SparkSession, target: String,
                    empty: => DataFrame): DataFrame = {
    healSwap(spark, target)
    readParquetOrEmpty(spark, target, empty)
  }

  /** The healing half of `readSwapState`, callable on its own (e.g.
    * before fingerprinting the committed state).
    */
  def healSwap(spark: SparkSession, target: String): Unit = {
    val f = fs(spark, target)
    val t = new Path(target)
    val old = new Path(target + ".old")
    if (!f.exists(t) && f.exists(old))
      require(f.rename(old, t), s"failed to restore interrupted swap $old -> $t")
  }

  /** Identity of a state directory's committed contents: every file's
    * (name, length, mtime), sorted. Two equal fingerprints mean the
    * state is byte-identical for caching purposes — writeSwap replaces
    * the whole directory, so any swap changes the listing. "" when the
    * path is absent.
    */
  def dirFingerprint(spark: SparkSession, path: String): String = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) "" else {
      val it = f.listFiles(p, true)
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val s = it.next()
        entries += s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}"
      }
      entries.sorted.mkString(";")
    }
  }
}
