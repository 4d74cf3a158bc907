package graft

import graft.sources.TableLayout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableLayoutSpec extends AnyFunSuite with SparkTestBase {

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
}
