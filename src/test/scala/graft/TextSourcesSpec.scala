package graft

import graft.sources.{ParquetUpsertSink, TextSources}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TextSourcesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("csv round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val src = Tables.events(spark, Sf)
      .select("event_id", "user_id", "event_type", "value")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val back = TextSources.readCsv(spark, dir, schema)
    assert(back.count() == src.count())
    assert(back.join(src, Seq("event_id", "user_id", "event_type", "value"),
      "left_anti").count() == 0)
  }

  test("jsonl round-trip and corrupt-record capture") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
    val f = dir.resolve("data.jsonl")
    java.nio.file.Files.writeString(f,
      """{"id": 1, "name": "ok"}
        |this is not json
        |{"id": 2, "name": "also ok"}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    // Spark requires materializing before querying only the corrupt col
    val rows = TextSources.readJsonlWithCorrupt(spark, f.toString, schema)
      .cache()
    rows.count()
    assert(rows.filter(col("_corrupt").isNotNull).count() == 1)
    assert(rows.filter(col("_corrupt").isNull).count() == 2)
    rows.unpersist()
  }

  test("upsert schema evolution: new column backfills history with null") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString
    ParquetUpsertSink.upsert(spark, dir,
      Seq((1L, "a", 1L)).toDF("id", "val", "ver"), Seq("id"), "ver")
    ParquetUpsertSink.upsert(spark, dir,
      Seq((2L, "b", 2L, "extra")).toDF("id", "val", "ver", "note"),
      Seq("id"), "ver")
    val got = ParquetUpsertSink.read(spark, dir).orderBy("id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("note") == null)
    assert(got(1).getAs[String]("note") == "extra")
  }

  test("compaction reduces file count, preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    // simulate a table fragmented by many incremental loads (AQE would
    // coalesce a single upsert's output, so write the state directly)
    (1L to 100L).map(i => (i, i * 2)).toDF("id", "v").repartition(8)
      .write.parquet(s"$dir/data")
    val before = ParquetUpsertSink.read(spark, dir)
      .inputFiles.length
    ParquetUpsertSink.compact(spark, dir, 1)
    val table = ParquetUpsertSink.read(spark, dir)
    assert(table.inputFiles.length == 1 && before > 1)
    assert(table.count() == 100)
  }
}
