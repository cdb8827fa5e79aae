package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed domain model for the curated/serving layer — `Dataset[T]`
  * views over the same DataFrames the engine produces, for callers who
  * want compile-time field checking on the narrow, stable schemas
  * (the curated layer is where typing pays: schemas are contracts;
  * the wide raw layer stays DataFrame-typed on purpose — SURVEY §1.5).
  */
object Typed {

  /** Serving streams fact row (twitch_stream_db_schema.sql:62-72). */
  final case class CuratedStream(
      stream_id: String, day_date_id: String, time_of_day_id: String,
      user_id: String, category_id: String, language_id: String,
      viewer_count: Long, hours_watched: Double)

  /** users dim row (schema.sql:24-29). */
  final case class User(
      user_id: String, user_name: String, login_name: String,
      broadcaster_type: String)

  /** Popularity feedback row (reference A1 output). */
  final case class CategoryPopularity(category_id: String, num_of_streamers: Long)

  def curatedStreams(df: DataFrame): Dataset[CuratedStream] = {
    val spark = df.sparkSession; import spark.implicits._
    df.as[CuratedStream]
  }

  def users(df: DataFrame): Dataset[User] = {
    val spark = df.sparkSession; import spark.implicits._
    df.as[User]
  }

  /** Typed popularity aggregate: compile-checked key access, same plan
    * as the untyped groupBy/count (typed groupByKey over a simple key
    * column resolves to a hash aggregate, not an object-hash aggregate).
    */
  def popularity(ds: Dataset[CuratedStream]): Dataset[CategoryPopularity] = {
    val spark = ds.sparkSession; import spark.implicits._
    ds.groupByKey(_.category_id)
      .count()
      .map { case (cat, n) => CategoryPopularity(cat, n) }
  }

  /** Typed hours-watched per user — Dataset transform chain example. */
  def hoursByUser(ds: Dataset[CuratedStream]): Dataset[(String, Double)] = {
    val spark = ds.sparkSession; import spark.implicits._
    ds.groupByKey(_.user_id)
      .mapValues(_.hours_watched)
      .reduceGroups(_ + _)
  }
}
