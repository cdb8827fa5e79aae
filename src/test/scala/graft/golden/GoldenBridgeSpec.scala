package graft.golden

import graft.Schemas
import graft.operators.StreamsEtl
import graft.sources.Layers
import org.apache.spark.sql.types._

/** Golden replay of the category-enrichment (bridge) path for snapshot
  * 20260111_1645: IGDB array explode + broadcast igdb->category lookup
  * join must reproduce the reference's curated bridge pair sets
  * (10,884 genre pairs / 7,631 game-mode pairs).
  */
class GoldenBridgeSpec extends GoldenSpec {

  private lazy val categories = Layers.readCsv(spark,
    s"$refData/twitch_project_processed_layer/processed_categories_data/20260111/processed_categories_data_20260111_1645.csv",
    StructType(Seq(StructField("category_id", StringType), StructField("category_name", StringType),
      StructField("box_art_url", StringType), StructField("igdb_id", StringType))))

  private def pairSchema(idCol: String) = StructType(Seq(
    StructField("category_id", StringType), StructField(idCol, StringType)))

  test("genre bridge reproduces curated_genre_bridge_data_20260111_1645.csv") {
    val games = Layers.readEnvelopes(spark,
      s"$refData/twitch_project_raw_layer/raw_genre_bridge_data/20260111/raw_genre_bridge_data_20260111_1645.json",
      Schemas.rawIgdbGame)
    val golden = Layers.readCsv(spark,
      s"$refData/twitch_project_curated_layer/curated_genre_bridge_data/20260111/curated_genre_bridge_data_20260111_1645.csv",
      pairSchema("genre_id"))
    golden.count() shouldBe 10884
    assertSameRows(StreamsEtl.bridge(games, categories, "genres", "genre_id"), golden)
  }

  test("game-mode bridge reproduces curated_game_mode_bridge_data_20260111_1645.csv") {
    val games = Layers.readEnvelopes(spark,
      s"$refData/twitch_project_raw_layer/raw_game_mode_bridge_data/20260111/raw_game_mode_bridge_data_20260111_1645.json",
      Schemas.rawIgdbGame)
    val golden = Layers.readCsv(spark,
      s"$refData/twitch_project_curated_layer/curated_game_mode_bridge_data/20260111/curated_game_mode_bridge_data_20260111_1645.csv",
      pairSchema("game_mode_id"))
    golden.count() shouldBe 7631
    assertSameRows(StreamsEtl.bridge(games, categories, "game_modes", "game_mode_id"), golden)
  }

  test("genres dim gains the NA row at curation") {
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("5", "Shooter"), org.apache.spark.sql.Row("12", "RPG"))),
      StructType(Seq(StructField("genre_id", StringType), StructField("genre_name", StringType))))
    val out = graft.operators.Dimensions.withNaRow(raw, "genre_id", "genre_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    out("NA") shouldBe "Not Available"
    out should have size 3
  }
}
