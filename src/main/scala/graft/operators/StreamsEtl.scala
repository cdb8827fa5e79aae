package graft.operators

import graft.Schemas.Sentinels
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's streams/users/categories/bridge ETL chains over the
  * REAL reference schemas (raw Twitch/IGDB shapes -> processed ->
  * curated), as pure DataFrame -> DataFrame transforms. Golden-tested
  * against the reference's checked-in snapshot chains
  * (data/twitch_project_*_layer, snapshot 20260111_1715).
  *
  * Each transform is narrow except the explicit dedups/joins; nothing
  * here shuffles more than once. All dedups use deterministic
  * formulations (min-priority windows or anti-joins), never
  * order-dependent dropDuplicates.
  */
object StreamsEtl {

  /** Integer-string validity predicate (reference F1 `is_integer`,
    * scripts/process_raw_data/process_raw_streams_data.py:48-53 — drops
    * test streams with non-numeric ids).
    */
  private def isIntegerString(c: org.apache.spark.sql.Column) = c.rlike("^-?[0-9]+$")

  /** Process raw stream objects (reference: src/process_raw_data/
    * process_raw_streams_data.py:124-179): flatten/projection (P6, drops
    * type/tags/tag_ids), validity filter (F1), language sentinel (F4),
    * cross-shard dedup on id (D2; deterministic min-user tiebreak
    * replaces pandas keep-first).
    *
    * Input: flattened envelope rows (Layers.readEnvelopes). Output:
    * processed_streams schema.
    */
  def processStreams(raw: DataFrame): DataFrame = {
    val projected = raw.select(
      col("id"), col("user_id"), col("user_login"), col("user_name"),
      col("game_id"), col("game_name"), col("title"),
      col("viewer_count"), col("started_at"),
      when(col("language").isNull || col("language") === "",
        Sentinels.NotAvailable).otherwise(col("language")).as("language"),
      col("thumbnail_url"),
      // pandas bool -> CSV "True"/"False"
      when(col("is_mature"), "True").otherwise("False").as("is_mature"))
    val valid = projected.filter(
      isIntegerString(col("id")) && isIntegerString(col("user_id")))
    Dedup.keepFirst(valid, Seq("id"), Seq(col("user_id").asc, col("started_at").asc))
  }

  /** Curate processed streams into the serving fact (reference:
    * src/curate_data/curate_streams_data.py:33-81): project (P1), rename
    * (P2), constant snapshot keys (P4), hours_watched = viewer_count/4
    * (P5), PK dedup (D2).
    */
  def curateStreams(processed: DataFrame, dayDateId: String, timeOfDayId: String): DataFrame = {
    val renamed = processed.select(
      col("id").as("stream_id"),
      lit(dayDateId).as("day_date_id"),
      lit(timeOfDayId).as("time_of_day_id"),
      col("user_id"),
      col("game_id").as("category_id"),
      col("language").as("language_id"),
      col("viewer_count"),
      (col("viewer_count") * 0.25).as("hours_watched"))
    Dedup.keepFirst(renamed,
      Seq("stream_id", "day_date_id", "time_of_day_id"),
      Seq(col("user_id").asc))
  }

  /** Process raw user objects (reference: src/process_raw_data/
    * process_raw_users_data.py:14-57): distinct (D1), drop deprecated
    * view_count (P3), empty-string -> "normal" sentinels (F4).
    */
  def processUsers(raw: DataFrame): DataFrame =
    raw.select(
        col("id"), col("login"), col("display_name"),
        Relational.sentinelFill(col("type"), Sentinels.Normal).as("type"),
        Relational.sentinelFill(col("broadcaster_type"), Sentinels.Normal)
          .as("broadcaster_type"),
        col("description"), col("profile_image_url"),
        col("offline_image_url"), col("created_at"))
      .distinct()

  /** Curate users (reference: src/curate_data/curate_users_data
    * .py:65-113): rename to DB names (P2), upsert into the current dim
    * keep-first (D3) and emit only the delta (J4).
    *
    * @return (updated current dim, delta rows to load)
    */
  def curateUsers(processed: DataFrame, current: DataFrame): (DataFrame, DataFrame) = {
    val renamed = processed.select(
      col("id").as("user_id"),
      col("display_name").as("user_name"),
      col("login").as("login_name"),
      col("broadcaster_type"))
    val delta = Relational.upsertDelta(
      Dedup.keepFirst(renamed, Seq("user_id"), Seq(col("login_name").asc)),
      current, Seq("user_id"))
    (current.unionByName(delta), delta)
  }

  /** Process raw category objects (reference: src/process_raw_data/
    * process_raw_category_data.py:32-41): distinct, rename, empty ->
    * "NA" sentinels for igdb_id/box_art_url.
    */
  def processCategories(raw: DataFrame): DataFrame =
    raw.select(
        col("id").as("category_id"),
        col("name").as("category_name"),
        Relational.sentinelFill(col("box_art_url"), Sentinels.NA).as("box_art_url"),
        Relational.sentinelFill(col("igdb_id"), Sentinels.NA).as("igdb_id"))
      .distinct()

  /** Narrow processed categories to the curated/serving projection
    * (reference: scripts/curate_data/curate_categories_data.py:50,72).
    */
  def curatedCategoryProjection(processed: DataFrame): DataFrame =
    processed.select("category_id", "category_name", "igdb_id")

  /** Curate categories: same upsert-delta shape as users (reference:
    * scripts/curate_data/curate_categories_data.py:56-100, incl. the F6
    * empty-delta short-circuit, which callers express as
    * `delta.isEmpty`).
    */
  def curateCategories(processed: DataFrame, current: DataFrame): (DataFrame, DataFrame) = {
    val delta = Relational.upsertDelta(
      Dedup.keepFirst(processed, Seq("category_id"), Seq(col("category_name").asc)),
      current, Seq("category_id"))
    (current.unionByName(delta), delta)
  }

  /** Process a raw IGDB enum dim (genres / game modes): rename id/name
    * to the dim's column names, keep the remaining IGDB metadata,
    * distinct (reference: scripts/process_raw_data/
    * process_raw_genres_data.py:52-58; the game-modes transform is the
    * same shape — its script in the reference is a mislabeled copy of
    * the bridge processor, see SURVEY §3.3).
    */
  def processIgdbDim(raw: DataFrame, idCol: String, nameCol: String): DataFrame =
    raw.select(
        col("id").cast("string").as(idCol),
        col("created_at"), col("name").as(nameCol), col("slug"),
        col("updated_at"), col("url"), col("checksum"))
      .distinct()

  /** Curate an IGDB enum dim: narrow to (id, name) + the NA row
    * (reference P7: scripts/curate_data/curate_genres_data.py:20-21).
    */
  def curateIgdbDim(processed: DataFrame, idCol: String, nameCol: String): DataFrame =
    Dimensions.withNaRow(processed.select(col(idCol), col(nameCol)), idCol, nameCol)

  /** Bridge path (reference E1-E3 + J2: scripts/process_raw_data/
    * process_raw_genre_bridge_data.py:54-100): explode the IGDB array
    * field and resolve igdb_id -> category_id with a broadcast lookup
    * join over the deduplicated category dim — the set-based replacement
    * for the reference's per-row `.iloc[0]` probe loop.
    *
    * @param games    raw IGDB rows (id, <arrayField>)
    * @param catDim   categories dim (category_id, igdb_id)
    * @param arrayField "genres" or "game_modes"
    * @param outIdCol   "genre_id" or "game_mode_id"
    */
  def bridge(games: DataFrame, catDim: DataFrame,
             arrayField: String, outIdCol: String): DataFrame = {
    val lookup = Dedup.keepFirst(
      catDim.filter(col("igdb_id") =!= Sentinels.NA)
        .select(col("igdb_id"), col("category_id")),
      Seq("igdb_id"), Seq(col("category_id").asc))
    games
      .select(col("id").cast("string").as("igdb_id"),
        explode(col(arrayField)).as(outIdCol)) // explode drops null arrays (E3)
      .join(broadcast(lookup), Seq("igdb_id"))
      .select(col("category_id"), col(outIdCol).cast("string").as(outIdCol))
      .distinct()
  }
}
