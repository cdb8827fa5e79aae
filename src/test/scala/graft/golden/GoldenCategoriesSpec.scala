package graft.golden

import graft.Schemas
import graft.operators.StreamsEtl
import graft.sources.Layers
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Golden replay of the categories chain (snapshot 20260111_1645) and
  * the genres/game-modes enum dims.
  */
class GoldenCategoriesSpec extends GoldenSpec {

  private val processedCatSchema = StructType(
    Seq("category_id", "category_name", "box_art_url", "igdb_id")
      .map(StructField(_, StringType)))

  private lazy val rawCats = Layers.readEnvelopes(spark,
    s"$refData/twitch_project_raw_layer/raw_categories_data/20260111/raw_categories_data_20260111_1645.json",
    Schemas.rawCategory)

  private lazy val processedCats = StreamsEtl.processCategories(rawCats)

  test("processCategories reproduces processed_categories_data_20260111_1645.csv") {
    val golden = Layers.readCsv(spark,
      s"$refData/twitch_project_processed_layer/processed_categories_data/20260111/processed_categories_data_20260111_1645.csv",
      processedCatSchema)
    golden.count() shouldBe 4503
    assertSameRows(processedCats, golden)
  }

  test("curated categories delta from empty state reproduces the curated CSV") {
    val golden = Layers.readCsv(spark,
      s"$refData/twitch_project_curated_layer/curated_categories_data/20260111/curated_categories_data_20260111_1645.csv",
      StructType(Seq("category_id", "category_name", "igdb_id").map(StructField(_, StringType))))
    val narrowed = StreamsEtl.curatedCategoryProjection(processedCats)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], narrowed.schema)
    val (_, delta) = StreamsEtl.curateCategories(narrowed, empty)
    assertSameRows(delta, golden)
  }

  private def igdbDimSchema(idCol: String, nameCol: String) = StructType(Seq(
    StructField(idCol, StringType), StructField("created_at", LongType),
    StructField(nameCol, StringType), StructField("slug", StringType),
    StructField("updated_at", LongType), StructField("url", StringType),
    StructField("checksum", StringType)))

  private def rawIgdbSchema = StructType(Seq(
    StructField("day_date_id", StringType),
    StructField("data", ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("created_at", LongType),
      StructField("name", StringType), StructField("slug", StringType),
      StructField("updated_at", LongType), StructField("url", StringType),
      StructField("checksum", StringType)))))))

  private def loadIgdbRaw(file: String) = {
    import org.apache.spark.sql.functions._
    spark.read.schema(rawIgdbSchema).option("multiLine", true)
      .json(s"$refData/twitch_project_raw_layer/$file")
      .select(explode(col("data")).as("d")).select(col("d.*"))
  }

  test("genres dim chain reproduces processed + curated CSVs") {
    val processed = StreamsEtl.processIgdbDim(
      loadIgdbRaw("raw_genres_data/raw_genres_data.json"), "genre_id", "genre_name")
    val goldenProcessed = Layers.readCsv(spark,
      s"$refData/twitch_project_processed_layer/processed_genres_data/processed_genres_data.csv",
      igdbDimSchema("genre_id", "genre_name"))
    assertSameRows(processed, goldenProcessed)

    val curated = StreamsEtl.curateIgdbDim(processed, "genre_id", "genre_name")
    val goldenCurated = Layers.readCsv(spark,
      s"$refData/twitch_project_curated_layer/curated_genres_data/curated_genres_data.csv",
      StructType(Seq(StructField("genre_id", StringType), StructField("genre_name", StringType))))
    goldenCurated.count() shouldBe 24 // 23 genres + NA
    assertSameRows(curated, goldenCurated)
  }

  test("game modes dim chain reproduces processed + curated CSVs") {
    val processed = StreamsEtl.processIgdbDim(
      loadIgdbRaw("raw_game_modes_data/raw_game_modes_data.json"),
      "game_mode_id", "game_mode_name")
    val goldenProcessed = Layers.readCsv(spark,
      s"$refData/twitch_project_processed_layer/processed_game_modes_data/processed_game_modes_data.csv",
      igdbDimSchema("game_mode_id", "game_mode_name"))
    assertSameRows(processed, goldenProcessed)

    val curated = StreamsEtl.curateIgdbDim(processed, "game_mode_id", "game_mode_name")
    val goldenCurated = Layers.readCsv(spark,
      s"$refData/twitch_project_curated_layer/curated_game_modes_data/curated_game_modes_data.csv",
      StructType(Seq(StructField("game_mode_id", StringType), StructField("game_mode_name", StringType))))
    // the checked-in curated file predates the NA-row append in
    // curate_game_modes_data.py:12 (the genres equivalent HAS it) — the
    // script is the semantic truth, so compare the 6 real modes against
    // the file and assert the NA row separately
    goldenCurated.count() shouldBe 6
    assertSameRows(curated.filter(col("game_mode_id") =!= "NA"), goldenCurated)
    curated.filter(col("game_mode_id") === "NA").count() shouldBe 1
  }
}
