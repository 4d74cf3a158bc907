package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion of battlelog-shaped nested JSON — the reference's raw API
  * record (api_extract.py:178-241): a match with `team`/`opponent`
  * one-element arrays of player structs, nested tower-HP arrays and a
  * per-player deck array. Normalization is pure `from_json` + column
  * expressions + one `explode` for decks: no UDFs, fully codegen'd,
  * and the flatten work distributes with the rows.
  */
object JsonIngest {

  val playerSchema: StructType = StructType(Seq(
    StructField("tag", StringType),
    StructField("crowns", IntegerType),
    StructField("globalRank", IntegerType),
    StructField("startingTrophies", IntegerType),
    StructField("trophyChange", IntegerType),
    StructField("kingTowerHitPoints", IntegerType),
    StructField("princessTowersHitPoints", ArrayType(IntegerType)),
    StructField("elixirLeaked", DoubleType),
    StructField("cards", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType)))))))

  val battlelogSchema: StructType = StructType(Seq(
    StructField("battleTime", StringType),
    StructField("type", StringType),
    StructField("leagueNumber", IntegerType),
    StructField("team", ArrayType(playerSchema)),
    StructField("opponent", ArrayType(playerSchema))))

  private def guardedTower(towers: Column, i: Int): Column =
    when(size(towers) >= i, element_at(towers, i)).otherwise(lit(0))

  /** Raw JSON strings → one normalized match row each (reference
    * get_matches_info: guarded array indexing, derived is_win, concat
    * match_key, timestamp parse with coercion, game-mode filter).
    */
  def normalizeMatches(raw: DataFrame, jsonCol: String): DataFrame = {
    val fmt = "yyyyMMdd'T'HHmmss.SSS'Z'"
    val m = raw.select(from_json(col(jsonCol), battlelogSchema).as("m"))
      .select(col("m.*"))
      .withColumn("team0", element_at(col("team"), 1))
      .withColumn("opp0", element_at(col("opponent"), 1))
    m.filter(col("type") === "pathOfLegend")
      .select(
        concat(col("battleTime"), lit("_"), col("team0.tag")).as("match_key"),
        try_to_timestamp(col("battleTime"), lit(fmt)).as("battle_time"),
        (col("team0.crowns") > col("opp0.crowns")).as("is_win"),
        col("leagueNumber").as("league"),
        col("team0.tag").as("player_id"),
        col("opp0.tag").as("opponent_id"),
        col("team0.globalRank").as("current_global_rank"),
        col("team0.startingTrophies").as("starting_rating"),
        col("team0.trophyChange").as("rating_change"),
        col("team0.crowns").as("crowns"),
        col("opp0.crowns").as("opp_crowns"),
        col("team0.kingTowerHitPoints").as("king_tower_hp"),
        guardedTower(col("team0.princessTowersHitPoints"), 1)
          .as("princess_tower1_hp"),
        guardedTower(col("team0.princessTowersHitPoints"), 2)
          .as("princess_tower2_hp"),
        col("team0.elixirLeaked").as("elixir_leaked"))
  }

  /** Raw JSON strings → one row per (match, card): the deck explode
    * (reference get_match_card_info).
    */
  def normalizeMatchCards(raw: DataFrame, jsonCol: String): DataFrame = {
    val m = raw.select(from_json(col(jsonCol), battlelogSchema).as("m"))
      .select(col("m.*"))
      .filter(col("type") === "pathOfLegend")
      .withColumn("team0", element_at(col("team"), 1))
    m.select(
        concat(col("battleTime"), lit("_"), col("team0.tag")).as("match_key"),
        col("team0.tag").as("player_id"),
        explode(col("team0.cards")).as("card"))
      .select(col("match_key"), col("player_id"),
        col("card.id").cast("string").as("card_id"))
  }

  /** 37. End-to-end ingest check over real data: build battlelog-shaped
    * JSON deterministically from `events` rows, then run it through the
    * full normalize path (from_json → struct access → guarded arrays →
    * derived columns → filter). The oracle computes the expected output
    * directly from the events columns, so the whole JSON round-trip is
    * what's under test.
    */
  def q37JsonIngest(s: SparkSession, d: String): DataFrame = {
    val fmt = "yyyyMMdd'T'HHmmss.SSS'Z'"
    val e = Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
    val raw = e.select(to_json(struct(
      date_format(col("ts"), fmt).as("battleTime"),
      when(col("event_type") === "error", lit("other"))
        .otherwise(lit("pathOfLegend")).as("type"),
      (col("user_id") % 7 + 1).cast("int").as("leagueNumber"),
      array(struct(
        concat(lit("#P"), col("user_id")).as("tag"),
        (col("event_id") % 4).cast("int").as("crowns"),
        (col("event_id") % 100).cast("int").as("globalRank"),
        (lit(1000) + col("event_id") % 500).cast("int")
          .as("startingTrophies"),
        (col("event_id") % 60 - 30).cast("int").as("trophyChange"),
        (lit(5000) + col("event_id") % 1000).cast("int")
          .as("kingTowerHitPoints"),
        when(col("event_id") % 3 === 0,
          array((col("k") * 10).cast("int")))
          .otherwise(array((col("k") * 10).cast("int"),
            (col("k") * 5).cast("int"))).as("princessTowersHitPoints"),
        col("value").as("elixirLeaked"),
        array(struct(col("k").cast("long").as("id"),
          lit("card").as("name"))).as("cards"))).as("team"),
      array(struct(
        concat(lit("#O"), col("user_id")).as("tag"),
        ((col("event_id") + 1) % 4).cast("int").as("crowns")))
        .as("opponent"))).as("raw"))
    normalizeMatches(raw, "raw")
  }
}
