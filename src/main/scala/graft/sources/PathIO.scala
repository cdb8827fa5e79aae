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
}
