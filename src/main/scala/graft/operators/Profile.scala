package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-scan data profiling — the `ANALYZE TABLE` surface: per-column
  * presence, distinct count, and min/max over one pass of the input.
  *
  * All columns' statistics are computed in ONE aggregate (Spark plans
  * the multi-column distinct set via `Expand` — one scan, expansion
  * factor = number of profiled columns, combined map-side), then the
  * single wide row unpivots via `stack` into one row per column. At
  * 100 TB this is a scan plus a constant number of tiny shuffles; the
  * alternative — one aggregate per column — scans the corpus once per
  * column.
  *
  * min/max are cast to string so heterogeneous column types share one
  * output schema; cast numerics you care about to DECIMAL first if you
  * need cross-engine-stable rendering of doubles.
  */
object Profile {

  /** Profile `cols` of `df`. Output: `column_name`, `n_null`,
    * `n_present`, `n_distinct`, `min_value`, `max_value`.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__dst_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __cnt_$c, __dst_$c, __min_$c, __max_$c").mkString(", ")
    one.select(col("__total"), expr(
        s"stack(${cols.length}, $stackArgs) AS " +
          "(column_name, n_present, n_distinct, min_value, max_value)"))
      .select(col("column_name"),
        (col("__total") - col("n_present")).as("n_null"),
        col("n_present"), col("n_distinct"),
        col("min_value"), col("max_value"))
  }
}
