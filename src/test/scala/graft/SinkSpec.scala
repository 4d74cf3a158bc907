package graft

import graft.sources.ParquetUpsertSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_sink").toString

  test("upsert: updates win over existing, later version wins in-batch") {
    val dir = tmpTable()
    val v1 = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("id", "val", "ver")
    val s1 = ParquetUpsertSink.upsert(spark, dir, v1, Seq("id"), "ver")
    assert(s1 == ParquetUpsertSink.SinkStats(2, 0, 0))
    val v2 = Seq((2L, "b2", 11L), (3L, "c", 11L), (3L, "c_newer", 12L))
      .toDF("id", "val", "ver")
    val s2 = ParquetUpsertSink.upsert(spark, dir, v2, Seq("id"), "ver")
    // key 3 is new (inserted once, despite two in-batch versions);
    // key 2 existed (updated); key 1 untouched
    assert(s2 == ParquetUpsertSink.SinkStats(1, 1, 0))

    val got = ParquetUpsertSink.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b2", 3L -> "c_newer"))
  }

  test("upsert at equal version: the update beats the existing row") {
    val dir = tmpTable()
    ParquetUpsertSink.upsert(spark, dir,
      Seq((1L, "old", 10L)).toDF("id", "val", "ver"), Seq("id"), "ver")
    ParquetUpsertSink.upsert(spark, dir,
      Seq((1L, "new", 10L)).toDF("id", "val", "ver"), Seq("id"), "ver")
    assert(ParquetUpsertSink.read(spark, dir).first().getString(1) == "new")
  }

  test("purge removes all rows for the purged keys") {
    val dir = tmpTable()
    ParquetUpsertSink.upsert(spark, dir,
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
        .toDF("id", "val", "ver"), Seq("id"), "ver")
    val st = ParquetUpsertSink.purge(spark, dir, Seq(1L, 3L).toDF("id"), "id")
    assert(st == ParquetUpsertSink.SinkStats(0, 0, 2))
    assert(ParquetUpsertSink.read(spark, dir).select("id")
      .collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("insertNewOnly appends only unseen keys") {
    val dir = tmpTable()
    val s1 = ParquetUpsertSink.insertNewOnly(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "val"), Seq("id"))
    assert(s1 == ParquetUpsertSink.SinkStats(2, 0, 0))
    val s2 = ParquetUpsertSink.insertNewOnly(spark, dir,
      Seq((2L, "b_SHOULD_NOT_APPEAR"), (3L, "c")).toDF("id", "val"),
      Seq("id"))
    assert(s2 == ParquetUpsertSink.SinkStats(1, 0, 0))
    val got = ParquetUpsertSink.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("streaming incremental load: foreachBatch upsert converges to batch") {
    val dir = tmpTable()
    val stream = graft.streaming.EventStreams.readEventStream(spark, Sf)
    val q = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) => {
        ParquetUpsertSink.upsert(spark, dir,
          batch.select("user_id", "ts", "event_type"), Seq("user_id"), "ts")
        ()
      }
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = ParquetUpsertSink.read(spark, dir)
    val expected = graft.operators.RelationalOps
      .q12UpsertLastWins(spark, Sf)
      .select(col("user_id"), col("last_ts").as("ts"))
    assert(got.count() == expected.count())
    assert(got.select("user_id", "ts")
      .join(expected, Seq("user_id", "ts"), "left_anti").count() == 0)
  }
}
