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

  test("upsert: an incoming row that LOSES the version ordering is not " +
      "counted as an update") {
    val dir = tmpTable()
    ParquetUpsertSink.upsert(spark, dir,
      Seq((1L, "current", 20L), (2L, "current", 20L))
        .toDF("id", "val", "ver"), Seq("id"), "ver")
    // key 1: stale update (ver 10 < 20) — existing row survives, NOT an
    // update; key 2: genuine update; key 3: insert
    val st = ParquetUpsertSink.upsert(spark, dir,
      Seq((1L, "stale", 10L), (2L, "newer", 30L), (3L, "new", 30L))
        .toDF("id", "val", "ver"), Seq("id"), "ver")
    assert(st == ParquetUpsertSink.SinkStats(1, 1, 0))
    val got = ParquetUpsertSink.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "current", 2L -> "newer", 3L -> "new"))
  }

  test("blocklist feedback: failed keys purge from the table and append " +
      "to the blocklist; re-runs append nothing new") {
    val table = tmpTable()
    val blocklist = tmpTable()
    ParquetUpsertSink.upsert(spark, table,
      Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
        .toDF("id", "val", "ver"), Seq("id"), "ver")
    val (p1, a1) = ParquetUpsertSink.blocklistFeedback(spark, table,
      blocklist, Seq(2L, 2L).toDF("id"), "id")
    assert(p1.deleted == 1L && a1.inserted == 1L)
    // next run fails on key 2 (already listed) and key 3 (new)
    val (p2, a2) = ParquetUpsertSink.blocklistFeedback(spark, table,
      blocklist, Seq(2L, 3L).toDF("id"), "id")
    assert(p2.deleted == 1L) // only key 3 still present in the table
    assert(a2.inserted == 1L) // key 2 was already on the blocklist
    assert(ParquetUpsertSink.read(spark, blocklist)
      .collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    assert(ParquetUpsertSink.read(spark, table)
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("run log: upsert+purge sequence emits one parseable run record") {
    val table = tmpTable()
    val logDir = tmpTable()
    val run = new graft.sources.RunLog("r42")
    run.step("load_matches") {
      ParquetUpsertSink.upsert(spark, table,
        Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "val", "ver"),
        Seq("id"), "ver")
    }
    run.step("purge_dropped") {
      ParquetUpsertSink.purge(spark, table, Seq(2L).toDF("id"), "id")
    }
    val path = run.write(spark, logDir)
    // the record must be machine-parseable: read it back with the JSON
    // source and check the audit fields survived
    val rec = spark.read.json(path)
    assert(rec.count() == 1)
    val row = rec.first()
    assert(row.getAs[String]("run_id") == "r42")
    assert(row.getAs[Boolean]("ok"))
    assert(row.getAs[Long]("n_steps") == 2L)
    val steps = row.getAs[scala.collection.Seq[
      org.apache.spark.sql.Row]]("steps")
    assert(steps.map(_.getAs[String]("step")) ==
      Seq("load_matches", "purge_dropped"))
    assert(steps.head.getAs[Long]("inserted") == 2L)
    assert(steps(1).getAs[Long]("deleted") == 1L)
    assert(steps.forall(_.getAs[Long]("millis") >= 0L))
  }

  test("run log: a failing step is recorded with its error and rethrown") {
    val run = new graft.sources.RunLog("r-fail")
    run.step("ok_step") { ParquetUpsertSink.SinkStats(1, 0, 0) }
    intercept[IllegalStateException] {
      run.step("boom") { throw new IllegalStateException("db unreachable") }
    }
    val json = run.toJson
    assert(json.contains(""""ok":false"""))
    assert(json.contains("db unreachable"))
    assert(json.contains(""""step":"boom""""))
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

  test("dashboard export: parquet round-trips each view exactly, CSV " +
      "carries header + all rows, manifest written with true counts") {
    val dir = tmpTable()
    val views = graft.sources.DashboardExport.defaultViews(spark, Sf)
    val counts = graft.sources.DashboardExport.export(spark, dir, views)
    assert(counts.keySet ==
      Set("recent_rankings", "customer_geo", "win_rates", "usage_rates"))
    views.foreach { case (name, df) =>
      val back = spark.read.parquet(s"$dir/$name.parquet")
      assert(back.schema.fieldNames.toSeq == df.columns.toSeq)
      assert(back.count() == counts(name))
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
        s"$name parquet round-trip")
      val csvLines = scala.io.Source.fromFile(s"$dir/$name.csv")
        .getLines().toSeq
      assert(csvLines.head == df.columns.mkString(","))
      assert(csvLines.size.toLong == counts(name) + 1, s"$name csv rows")
    }
    val manifest = scala.io.Source.fromFile(s"$dir/_manifest.json")
      .getLines().mkString("\n")
    counts.foreach { case (name, n) =>
      assert(manifest.contains(s""""$name": {"rows": $n"""))
    }
  }
}
