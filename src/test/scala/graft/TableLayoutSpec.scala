package graft

import graft.sources.TableLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableLayoutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("month-partitioned write + filter → partition pruning in the plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    TableLayout.writeMonthPartitioned(Tables.events(spark, Sf), "ts", dir)

    val q = TableLayout.readPartitioned(spark, dir)
      .filter(col("part_month") === "2024-01")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part_month"),
      plan.take(1500))
    // pruned scan still returns the right rows
    assert(q.count() == Tables.events(spark, Sf)
      .filter(date_format(col("ts"), "yyyy-MM") === "2024-01").count())
  }

  test("day-partitioned write: partition value round-trips as STRING " +
      "(no DATE re-inference), filter prunes, rows match the flat scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_day").toString
    TableLayout.writeDayPartitioned(Tables.events(spark, Sf), "ts", dir)
    val stored = TableLayout.readPartitioned(spark, dir)
    assert(stored.schema("part_day").dataType ==
      org.apache.spark.sql.types.StringType)
    val day = stored.select(col("part_day")).distinct()
      .collect().map(_.getString(0)).sorted.head
    val q = stored.filter(col("part_day") === day)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part_day"),
      plan.take(1500))
    assert(q.count() == Tables.events(spark, Sf)
      .filter(date_format(col("ts"), "'d'yyyyMMdd") === day).count())
    assert(q.count() > 0)
  }

  test("bitmap index artifact: write → read → range-derive equals the " +
      "fact-table countDistinct exactly; re-aggregation order never " +
      "matters; day-range reads prune partitions") {
    import graft.sources.BitmapIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_bmidx").toString
    val facts = Tables.events(spark, Sf)
    BitmapIndex.write(
      BitmapIndex.build(facts, "event_type", "ts", "user_id"), dir)
    val idx = BitmapIndex.read(spark, dir)
    // pick an interior date range covering some but not all days
    val days = facts.select(to_date(col("ts")).as("d")).distinct()
      .orderBy("d").collect().map(_.getDate(0).toString)
    val (from, to) = (days(days.length / 4), days(days.length / 2))
    val got = BitmapIndex.distinctBetween(idx, from, to).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = facts
      .filter(col("user_id").isNotNull &&
        to_date(col("ts")).between(from, to))
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exact && got.nonEmpty)
    // day-range scan prunes partitions at planning time
    val plan = idx.filter(col("day") === lit(from).cast("date"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(1500))
    // re-aggregation order invariance: shuffle the artifact first
    val scrambled = BitmapIndex.distinctBetween(
        idx.repartition(13, col("chunk")), from, to).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(scrambled == got)
  }

  test("bucketed tables join without any shuffle") {
    TableLayout.writeBucketed(
      Tables.orders(spark, Sf).select("o_orderkey", "o_custkey"),
      "o_orderkey", 8, "orders_bkt")
    TableLayout.writeBucketed(
      Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity"),
      "l_orderkey", 8, "lineitem_bkt")

    // force the sort-merge path (at test scale Spark would rather
    // broadcast) so the assertion targets the bucketed-join machinery
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("lineitem_bkt").join(spark.table("orders_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(plan.contains("Bucketed: true"), plan.take(2000))
      assert(j.count() == Tables.lineitem(spark, Sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("z-order layout: every file's bounding box is tight in BOTH " +
      "dims — a single-column sort leaves the other dim unclustered") {
    import graft.sources.ZOrderLayout
    val orders = Tables.orders(spark, Sf).select(col("o_orderkey"),
      col("o_custkey"), unix_date(to_date(col("o_orderdate"))).as("o_day"))

    // per-file normalized min/max span of each dim for a given layout
    def avgSpans(dir: String): (Double, Double) = {
      val df = spark.read.parquet(dir)
        .withColumn("_f", input_file_name())
      val g = df.groupBy("_f").agg(
        (max("o_custkey") - min("o_custkey")).cast("long").as("ca"),
        (max("o_day") - min("o_day")).cast("long").as("da")).collect()
      val Array(cg, dg) = df.agg(
        max("o_custkey") - min("o_custkey"),
        max("o_day") - min("o_day")).collect()(0)
        .toSeq.map(_.toString.toDouble).toArray
      (g.map(_.getAs[Long]("ca").toDouble / cg).sum / g.length,
        g.map(_.getAs[Long]("da").toDouble / dg).sum / g.length)
    }

    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    ZOrderLayout.zorderWrite(orders, "o_custkey", "o_day", 16, zDir)
    val (zc, zd) = avgSpans(zDir)

    val sDir = java.nio.file.Files.createTempDirectory("graft_s").toString
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(sDir)
    val (sc, sd) = avgSpans(sDir)

    // 16 files on the curve ≈ a 4×4 grid: both dims well under half the
    // global span; the custkey sort clusters custkey tighter but leaves
    // the date dimension spanning ~everything
    assert(zc < 0.5 && zd < 0.5, s"z-order spans: custkey=$zc day=$zd")
    assert(sc < zc && sd > 0.9,
      s"custkey-sort spans: custkey=$sc day=$sd vs z ($zc, $zd)")
    // layout rewrites preserve the data
    assert(spark.read.parquet(zDir).count() == orders.count())
  }

  test("z-order curve locality: interleave is exact (known bit pattern) " +
      "and adjacent cells differ in low bits") {
    import graft.sources.ZOrderLayout
    val df = Seq((3L, 5L)).toDF("a", "b")
      .withColumn("z", ZOrderLayout.zValue16(col("a"), col("b")))
    // a=0b011 on even bits -> 0b000101; b=0b101 on odd -> 0b100010
    assert(df.collect()(0).getLong(2) == 0x27L) // 0b100111
  }

  test("bloom skip index: a point lookup reads only the candidate " +
      "partitions and equals the full-scan filter; the built artifact " +
      "is byte-deterministic") {
    import graft.sources.BloomSkipIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_bsi").toString
    val table = (0L until 5000L).map(k => (k % 10L, k, s"row$k"))
      .toDF("p", "k", "payload")
    table.write.partitionBy("p").parquet(s"$dir/t")
    val stored = spark.read.parquet(s"$dir/t")
    val idx = BloomSkipIndex.build(stored, "p", "k",
      expectedPerPartition = 1000L)
    assert(idx.count() == 10L)
    // lookup an existing key: identical rows to the full-scan filter
    val hit = BloomSkipIndex.lookup(spark, s"$dir/t", idx, "p", "k", 4242L)
    val full = stored.filter(col("k") === 4242L)
    assert(hit.collect().map(_.getAs[String]("payload")).toSeq ==
      full.collect().map(_.getAs[String]("payload")).toSeq)
    // the plan carries a partition filter (directory pruning), and the
    // bloom admitted far fewer than all 10 partitions
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(1500))
    val nCand = idx.collect().count { r =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        .mightContainLong(4242L)
    }
    assert(nCand >= 1 && nCand <= 3, s"$nCand candidate partitions")
    // absent key: empty result regardless of false positives
    assert(BloomSkipIndex.lookup(spark, s"$dir/t", idx, "p", "k",
      999999L).count() == 0L)
    // determinism: rebuild → identical bloom bytes per partition
    val again = BloomSkipIndex.build(stored, "p", "k",
      expectedPerPartition = 1000L)
    val b1 = idx.collect().map(r =>
      r.getString(0) -> r.getAs[Array[Byte]]("bloom").toSeq).toMap
    val b2 = again.collect().map(r =>
      r.getString(0) -> r.getAs[Array[Byte]]("bloom").toSeq).toMap
    assert(b1 == b2)
  }
}
