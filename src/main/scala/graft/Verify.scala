package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // queries are independent writes to distinct dirs — run a few
    // concurrently so driver-side planning/small stages overlap
    // (Spark's scheduler interleaves the jobs across the same executors)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    // SPARK_GRAFT_QUERIES (comma-separated) restricts the dump while
    // iterating on one query; the driver never sets it, so its runs
    // always dump the full surface
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // a typo'd name must fail loudly (same contract as Bench) — an
    // all-miss filter would write an empty dump that reads as success
    val unknown = only -- SparkEntry.queries.keySet
    if (unknown.nonEmpty)
      sys.error(s"[verify] unknown queries in SPARK_GRAFT_QUERIES: ${unknown.mkString(",")}")
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    val tasks = selected.toSeq.map { case (name, fn) =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // all dumps are finished: delete the per-invocation streaming
    // state dirs before exit (same hygiene hook as Bench)
    SparkEntry.drainInvocationStateDirs().foreach { dir =>
      // NonFatal only (an InterruptedException must still cancel),
      // and failures print — a silently dead cleanup would let the
      // /tmp pile-up this hook exists to prevent come back unseen
      try graft.sources.PathIO.deleteDir(spark, dir)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] state-dir cleanup failed for $dir: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
