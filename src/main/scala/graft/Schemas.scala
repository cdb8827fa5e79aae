package graft

import org.apache.spark.sql.types._

/** Explicit StructTypes for every table of the reference star schema and
  * its medallion layers (reference: scripts/sql_code/
  * twitch_stream_db_schema.sql:1-72; raw shapes from the checked-in data
  * under data/twitch_project_raw_layer).
  *
  * The reference infers pandas dtypes per read with ad-hoc overrides to
  * stop id columns collapsing to ints (e.g. scripts/get_raw_data/
  * get_raw_users_data.py:69,80) — a recurring bug source. Explicit
  * schemas kill that class of bug: every id stays a string (leading
  * zeros survive), and CSV/JSON reads never re-infer.
  */
object Schemas {

  /** Sentinel values used instead of NULL at the curated boundary
    * (reference: scripts/process_raw_data/process_raw_categories_data
    * .py:65-66, process_raw_users_data.py:66-67,
    * process_raw_streams_data.py:57-61).
    */
  object Sentinels {
    val NA = "NA"
    val Normal = "normal"
    val NotAvailable = "notavailable"
    val NaRowName = "Not Available"
  }

  /** One stream object inside a raw envelope (Twitch Helix /streams
    * shape; data/twitch_project_raw_layer/raw_streams_data).
    */
  val rawStream: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("user_id", StringType),
    StructField("user_login", StringType),
    StructField("user_name", StringType),
    StructField("game_id", StringType),
    StructField("game_name", StringType),
    StructField("type", StringType),
    StructField("title", StringType),
    StructField("viewer_count", LongType),
    StructField("started_at", StringType),
    StructField("language", StringType),
    StructField("thumbnail_url", StringType),
    StructField("tag_ids", ArrayType(StringType)),
    StructField("tags", ArrayType(StringType)),
    StructField("is_mature", BooleanType)))

  /** Raw snapshot envelope `{day_date_id, time_of_day_id, data:[…]}`
    * (reference: src/get_raw_data/get_raw_streams_data.py:110-120).
    */
  def envelope(dataSchema: StructType): StructType = StructType(Seq(
    StructField("day_date_id", StringType),
    StructField("time_of_day_id", StringType),
    StructField("data", ArrayType(dataSchema))))

  /** Raw category object (Helix /games/top). */
  val rawCategory: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("box_art_url", StringType),
    StructField("igdb_id", StringType)))

  /** Raw user object (Helix /users). */
  val rawUser: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("login", StringType),
    StructField("display_name", StringType),
    StructField("type", StringType),
    StructField("broadcaster_type", StringType),
    StructField("description", StringType),
    StructField("profile_image_url", StringType),
    StructField("offline_image_url", StringType),
    StructField("view_count", LongType),
    StructField("created_at", StringType)))

  /** Raw IGDB game object: id + name + genre/game-mode id arrays
    * (reference: scripts/get_raw_data/get_raw_genre_bridge_data.py:59-91).
    */
  val rawIgdbGame: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("genres", ArrayType(LongType)),
    StructField("game_modes", ArrayType(LongType))))

  /** Processed streams layer (wide CSV; header of
    * processed_streams_data_*.csv).
    */
  val processedStreams: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("user_id", StringType),
    StructField("user_login", StringType),
    StructField("user_name", StringType),
    StructField("game_id", StringType),
    StructField("game_name", StringType),
    StructField("title", StringType),
    StructField("viewer_count", LongType),
    StructField("started_at", StringType),
    StructField("language", StringType),
    StructField("thumbnail_url", StringType),
    StructField("is_mature", StringType))) // pandas writes True/False strings

  /** Curated streams = serving `streams` fact
    * (twitch_stream_db_schema.sql:62-72).
    */
  val curatedStreams: StructType = StructType(Seq(
    StructField("stream_id", StringType),
    StructField("day_date_id", StringType),
    StructField("time_of_day_id", StringType),
    StructField("user_id", StringType),
    StructField("category_id", StringType),
    StructField("language_id", StringType),
    StructField("viewer_count", LongType),
    StructField("hours_watched", DoubleType)))

  /** users dim (schema.sql:24-29). */
  val users: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("user_name", StringType),
    StructField("login_name", StringType),
    StructField("broadcaster_type", StringType)))

  /** categories dim (schema.sql:31-35). */
  val categories: StructType = StructType(Seq(
    StructField("category_id", StringType),
    StructField("igdb_id", StringType),
    StructField("category_name", StringType)))

  /** genres / game_modes dims (schema.sql:37-40,47-50). */
  val genres: StructType = StructType(Seq(
    StructField("genre_id", StringType),
    StructField("genre_name", StringType)))
  val gameModes: StructType = StructType(Seq(
    StructField("game_mode_id", StringType),
    StructField("game_mode_name", StringType)))

  /** bridges (schema.sql:42-45,52-55). */
  val genreBridge: StructType = StructType(Seq(
    StructField("category_id", StringType),
    StructField("genre_id", StringType)))
  val gameModeBridge: StructType = StructType(Seq(
    StructField("category_id", StringType),
    StructField("game_mode_id", StringType)))

  /** languages dim (schema.sql:57-60; static 186-row CSV). */
  val languages: StructType = StructType(Seq(
    StructField("language_id", StringType),
    StructField("language", StringType)))

  /** day_dates dim (schema.sql:1-12; raw_day_dates_data.csv header). */
  val dayDates: StructType = StructType(Seq(
    StructField("day_date_id", StringType),
    StructField("the_date", DateType),
    StructField("date_MMDDYYYY", StringType),
    StructField("day_of_week", StringType),
    StructField("month", StringType),
    StructField("day", StringType),
    StructField("year", StringType),
    StructField("month_name", StringType),
    StructField("month_abbrev", StringType),
    StructField("year_YY", StringType)))

  /** time_of_day dim (schema.sql:14-22; raw_time_of_day_data.csv header). */
  val timeOfDay: StructType = StructType(Seq(
    StructField("time_of_day_id", StringType),
    StructField("time_24h", StringType),
    StructField("time_12h", StringType),
    StructField("hour", IntegerType),
    StructField("minute", IntegerType),
    StructField("AM_PM", StringType),
    StructField("part_of_day", StringType)))
}
