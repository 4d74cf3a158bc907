package graft

import graft.sources.JsonIngest
import org.scalatest.funsuite.AnyFunSuite

class JsonIngestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val battle =
    """{"battleTime":"20240115T093045.123Z","type":"pathOfLegend",
      |"leagueNumber":6,
      |"team":[{"tag":"#AAA","crowns":3,"globalRank":17,
      |  "startingTrophies":1800,"trophyChange":30,
      |  "kingTowerHitPoints":4824,"princessTowersHitPoints":[1512],
      |  "elixirLeaked":2.5,
      |  "cards":[{"id":26000000,"name":"Knight"},
      |           {"id":26000001,"name":"Archers"}]}],
      |"opponent":[{"tag":"#BBB","crowns":1}]}""".stripMargin.replace("\n", "")

  private val ladderBattle =
    """{"battleTime":"20240115T100000.000Z","type":"ladder",
      |"team":[{"tag":"#CCC","crowns":0,"cards":[]}],
      |"opponent":[{"tag":"#DDD","crowns":2}]}""".stripMargin.replace("\n", "")

  test("normalizeMatches: flatten, guards, derived cols, mode filter") {
    val raw = Seq(battle, ladderBattle).toDF("raw")
    val rows = JsonIngest.normalizeMatches(raw, "raw").collect()
    assert(rows.length == 1) // ladder filtered out
    val r = rows.head
    assert(r.getAs[String]("match_key") == "20240115T093045.123Z_#AAA")
    assert(r.getAs[Boolean]("is_win"))
    assert(r.getAs[Int]("princess_tower1_hp") == 1512)
    assert(r.getAs[Int]("princess_tower2_hp") == 0) // guarded missing tower
    assert(r.getAs[java.sql.Timestamp]("battle_time") ==
      java.sql.Timestamp.valueOf("2024-01-15 09:30:45.123"))
    assert(r.getAs[String]("opponent_id") == "#BBB")
  }

  test("normalizeMatchCards: one row per card in the deck") {
    val raw = Seq(battle, ladderBattle).toDF("raw")
    val rows = JsonIngest.normalizeMatchCards(raw, "raw").collect()
    assert(rows.map(_.getAs[String]("card_id")).sorted.toSeq ==
      Seq("26000000", "26000001"))
    assert(rows.forall(_.getAs[String]("player_id") == "#AAA"))
  }

  test("malformed JSON coerces to null-free empty output, not a crash") {
    val raw = Seq("{not json", """{"battleTime":null}""").toDF("raw")
    assert(JsonIngest.normalizeMatches(raw, "raw").count() == 0)
  }
}
