package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every contract query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query runs three times and reports the
  * MEDIAN run: the first execution pays one-off codegen compilation and
  * parquet footer reads (which at a real deployment amortize across the
  * job's lifetime), and the median — unlike min — is robust to a single
  * lucky run while still discarding one noisy outlier on a shared box.
  *
  * SPARK_GRAFT_QUERIES (comma-separated names) restricts the run to a
  * subset — handy for timing one query while iterating.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (executor threads, codegen, parquet footers) so
    // the first timed query isn't charged for JVM init
    spark.range(1000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // a failed query reports -1 (and is excluded from the total) instead
    // of masquerading as a fast run with its crash-time
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] query failed: ${e.getMessage}"); -1.0
      }
    }
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    val results = selected.map { case (name, fn) =>
      val runs = Seq.fill(3)(timeOnce(fn))
      name -> (if (runs.exists(_ < 0)) -1.0 else runs.sorted.apply(1))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
