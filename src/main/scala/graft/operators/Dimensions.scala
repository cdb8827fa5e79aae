package graft.operators

import graft.functions.TimeFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generators for the static dimensions, reproducing the reference's
  * checked-in CSVs exactly (golden-tested against
  * data/twitch_project_raw_layer/raw_day_dates_data/raw_day_dates_data.csv
  * and raw_time_of_day_data.csv).
  */
object Dimensions {

  /** Date dimension, one row per day of [startYear, endYear] (reference:
    * scripts/get_raw_data/get_raw_day_dates_data.py:13-50 — 8
    * denormalized formats per date). Declarative: a date sequence
    * exploded, every column a date_format over it.
    */
  def dayDates(spark: SparkSession, startYear: Int = 2025, endYear: Int = 2027): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        to_date(lit(s"$startYear-01-01")),
        to_date(lit(s"$endYear-12-31")))).as("the_date"))
      .select(
        date_format(col("the_date"), "yyyyMMdd").as("day_date_id"),
        col("the_date"),
        date_format(col("the_date"), "MM/dd/yyyy").as("date_MMDDYYYY"),
        date_format(col("the_date"), "EEEE").as("day_of_week"),
        date_format(col("the_date"), "MM").as("month"),
        date_format(col("the_date"), "dd").as("day"),
        date_format(col("the_date"), "yyyy").as("year"),
        date_format(col("the_date"), "MMMM").as("month_name"),
        upper(date_format(col("the_date"), "MMM")).as("month_abbrev"),
        date_format(col("the_date"), "yy").as("year_YY"))

  /** Time-of-day dimension: 96 rows at 15-minute grain (reference:
    * scripts/get_raw_data/get_raw_time_of_day_data.py — id "HHmm",
    * 24h/12h renderings, AM_PM, part_of_day buckets).
    */
  def timeOfDay(spark: SparkSession): DataFrame = {
    val hour = (col("id") / 4).cast("int")
    val minute = ((col("id") % 4) * 15).cast("int")
    val hour12 = ((hour + 11) % 12 + 1)
    spark.range(96)
      .select(
        concat(lpad(hour, 2, "0"), lpad(minute, 2, "0")).as("time_of_day_id"),
        concat_ws(":", lpad(hour, 2, "0"), lpad(minute, 2, "0")).as("time_24h"),
        concat(lpad(hour12, 2, "0"), lit(":"), lpad(minute, 2, "0"),
          when(hour < 12, lit(" AM")).otherwise(lit(" PM"))).as("time_12h"),
        hour.as("hour"),
        minute.as("minute"),
        when(hour < 12, "AM").otherwise("PM").as("AM_PM"),
        TimeFns.partOfDay(hour).as("part_of_day"))
  }

  /** genres/game_modes dim curation: rename + the appended
    * ("NA", "Not Available") row (reference P7:
    * scripts/curate_data/curate_genres_data.py:21).
    */
  def withNaRow(dim: DataFrame, idCol: String, nameCol: String): DataFrame = {
    val s = dim.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val na = s.createDataFrame(
      s.sparkContext.parallelize(Seq(Row(graft.Schemas.Sentinels.NA,
        graft.Schemas.Sentinels.NaRowName))),
      StructType(Seq(StructField(idCol, StringType), StructField(nameCol, StringType))))
    dim.select(col(idCol), col(nameCol)).unionByName(na)
  }

  /** SCD Type-2 merge — history-keeping dimension maintenance, the
    * classic warehouse upgrade over the reference's insert-only upsert
    * (D3): when an incoming row's tracked attribute differs from the
    * key's OPEN version, the open version CLOSES at the incoming
    * effective time and a new open version starts there; unchanged and
    * absent keys pass through, closed history is never touched, and
    * brand-new keys open their first version.
    *
    * Frames: `current` holds (key, attr, valid_from, valid_to) with
    * `valid_to` null marking the open version; `incoming` holds
    * (key, attr, effective_ts) — at most ONE row per key (pre-resolve
    * with `Dedup.keepFirst`; enforcing it here would hide a caller
    * bug). One equi-join on the key drives everything; history rows
    * move through untouched, so at 100 TB the join cost is
    * open-versions × incoming, never the full history.
    */
  /** Point-in-time range join — the reason SCD2 history exists: each
    * fact row picks up the dimension version in effect AT ITS event
    * time, via the half-open validity interval
    * `[valid_from, valid_to)` (open versions have null `valid_to`).
    * Left join: facts with no matching version (a time before the
    * key's first version, or an unknown key) keep null attributes
    * rather than vanishing — attribution reports need the
    * unattributed bucket.
    *
    * Plan shape: an EQUI join on the key with the range as a residual
    * predicate — hash/sort-merge on the key, never a cartesian or a
    * pure interval join; versions-per-key is small by construction
    * (one row per attribute change), so the residual filter touches
    * a handful of candidates per fact row at any scale.
    */
  def pointInTime(facts: DataFrame, versions: DataFrame, keyCol: String,
                  factTsCol: String, versionCols: Seq[String]): DataFrame = {
    val v = versions.select(
      (col(keyCol).as("__vk") +: col("valid_from") +: col("valid_to") +:
        versionCols.map(col)): _*)
    facts.join(v,
      facts(keyCol) === col("__vk") &&
        facts(factTsCol) >= col("valid_from") &&
        (col("valid_to").isNull || facts(factTsCol) < col("valid_to")),
      "left")
      .drop("__vk", "valid_from", "valid_to")
  }

  def scd2Merge(current: DataFrame, incoming: DataFrame, keyCol: String,
                attrCol: String, tsCol: String): DataFrame = {
    val closed = current.filter(col("valid_to").isNotNull)
    val open = current.filter(col("valid_to").isNull)
    val inc = incoming.select(col(keyCol).as("__k"),
      col(attrCol).as("__a"), col(tsCol).as("__ts"))
    val joined = open.join(inc, col(keyCol) === col("__k"), "full_outer")
    // open versions: unchanged keep their row; changed close at __ts
    val fromOpen = joined.filter(col(keyCol).isNotNull)
      .select(col(keyCol), col(attrCol),
        col("valid_from"),
        when(col("__k").isNotNull && !(col("__a") <=> col(attrCol)), col("__ts"))
          .otherwise(col("valid_to")).as("valid_to"))
    // new open versions: changed attrs and brand-new keys; the change
    // test is null-safe (<=>) so NULL→value and value→NULL transitions
    // close the open version and open a new one like any other change
    val newOpen = joined
      .filter(col("__k").isNotNull &&
        (col(keyCol).isNull || !(col("__a") <=> col(attrCol))))
      .select(col("__k").as(keyCol), col("__a").as(attrCol),
        col("__ts").as("valid_from"),
        lit(null).cast(fromOpen.schema("valid_to").dataType).as("valid_to"))
    closed.unionByName(fromOpen).unionByName(newOpen)
  }
}
