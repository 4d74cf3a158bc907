package graft

import graft.plans.TopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("matches the window-function formulation exactly") {
    val df = Tables.orders(spark, Sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val got = TopK.perKey(df, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("ties within k and duplicate sort values are handled") {
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 5.0),
      (2L, 20L, 1.0)).toDF("k", "id", "v")
    val got = TopK.perKey(df, Seq("k"), Seq(("v", true), ("id", false)), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // equal v → lowest ids win via the tie-break column
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 20L)))
  }

  test("optimizer rule rewrites window-rank-filter into TopKPerKey") {
    val exp = spark.experimental
    val (savedS, savedO) = (exp.extraStrategies, exp.extraOptimizations)
    try {
      graft.plans.TopKRewrite.install(spark)
      val df = Tables.orders(spark, Sf)
        .select("o_custkey", "o_orderkey", "o_totalprice")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val q = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan.take(1500))
      // no window exec, no sort-based WindowGroupLimit, no Sort at all
      assert(!plan.contains("WindowGroupLimit"), plan.take(1500))
      assert(!plan.contains("Sort "), plan.take(1500))
      // and the rewritten plan returns the exact same rows
      val expected = graft.plans.TopK.perKey(df, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      exp.extraStrategies = savedS
      exp.extraOptimizations = savedO
    }
  }

  test("rewrite does NOT fire when the rank column is kept") {
    val exp = spark.experimental
    val (savedS, savedO) = (exp.extraStrategies, exp.extraOptimizations)
    try {
      graft.plans.TopKRewrite.install(spark)
      val df = Tables.orders(spark, Sf)
        .select("o_custkey", "o_orderkey", "o_totalprice")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val q = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)   // rn survives in the output
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("Window"), plan.take(1500))
    } finally {
      exp.extraStrategies = savedS
      exp.extraOptimizations = savedO
    }
  }

  test("k larger than group size returns the whole group") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, 2.0)).toDF("k", "id", "v")
    assert(TopK.perKey(df, Seq("k"), Seq(("v", true)), 5).count() == 2)
  }

  test("withTies matches the rank() window formulation exactly") {
    // coarse ordering value (many ties) so rank <= 3 keeps tied groups
    val df = Tables.orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"),
        (col("o_totalprice").cast("long") / 50000L).as("band"))
    val got = TopK.perKey(df, Seq("o_custkey"), Seq(("band", true)), 3,
        withTies = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("band").desc)
    val expected = df.withColumn("rk", rank().over(w))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // sanity: ties actually exceed k somewhere, or the test proves nothing
    assert(expected.size > df.select("o_custkey").distinct().count() * 3 / 2)
  }

  test("optimizer rule rewrites rank()-filter into ties-mode TopKPerKey") {
    val exp = spark.experimental
    val (savedS, savedO) = (exp.extraStrategies, exp.extraOptimizations)
    try {
      graft.plans.TopKRewrite.install(spark)
      val df = Tables.orders(spark, Sf)
        .select(col("o_custkey"), col("o_orderkey"),
          (col("o_totalprice").cast("long") / 50000L).as("band"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("band").desc)
      def query() = df.withColumn("rk", rank().over(w))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "band")
      val q = query()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan.take(1500))
      assert(!plan.contains("WindowGroupLimit"), plan.take(1500))
      assert(!plan.contains("Sort "), plan.take(1500))
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // same rows as the un-rewritten window formulation: restore the
      // optimizer FIRST, then build a FRESH Dataset (q's QueryExecution
      // is already planned, so re-collecting q would compare the
      // rewritten output with itself)
      exp.extraStrategies = savedS
      exp.extraOptimizations = savedO
      val q2 = query()
      assert(!q2.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val expected = q2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      exp.extraStrategies = savedS
      exp.extraOptimizations = savedO
    }
  }

  test("perKeyDistinct matches the dense_rank() window formulation") {
    val df = Tables.orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"),
        (col("o_totalprice").cast("long") / 50000L).as("band"))
    val got = TopK.perKeyDistinct(df, Seq("o_custkey"),
        Seq(("band", true)), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("band").desc)
    val expected = df.withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("optimizer rule rewrites dense_rank()-filter into distinct-mode " +
      "TopKPerKey") {
    val exp = spark.experimental
    val (savedS, savedO) = (exp.extraStrategies, exp.extraOptimizations)
    try {
      graft.plans.TopKRewrite.install(spark)
      val df = Tables.orders(spark, Sf)
        .select(col("o_custkey"), col("o_orderkey"),
          (col("o_totalprice").cast("long") / 50000L).as("band"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("band").desc)
      def query() = df.withColumn("rk", dense_rank().over(w))
        .filter(col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "band")
      val q = query()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan.take(1500))
      assert(!plan.contains("WindowGroupLimit"), plan.take(1500))
      assert(!plan.contains("Sort "), plan.take(1500))
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // restore the optimizer, then build a FRESH Dataset (see the
      // rank() test: re-collecting q compares the rewrite with itself)
      exp.extraStrategies = savedS
      exp.extraOptimizations = savedO
      val q2 = query()
      assert(!q2.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val expected = q2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      exp.extraStrategies = savedS
      exp.extraOptimizations = savedO
    }
  }

  test("perKeyDistinct map-side state bound: exact under key overflow") {
    val key = "spark.graft.topk.maxMapKeys"
    spark.conf.set(key, "2")
    try {
      val rnd = new scala.util.Random(13)
      val rows = (0 until 2000).map(i =>
        (rnd.nextInt(100).toLong, i.toLong, rnd.nextInt(8).toDouble))
      val df = rows.toDF("k", "id", "v").repartition(8)
      val got = TopK.perKeyDistinct(df, Seq("k"), Seq(("v", true)), 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("v").desc)
      val expected = df.withColumn("rk", dense_rank().over(w))
        .filter(col("rk") <= 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally spark.conf.unset(key)
  }

  test("withTies map-side state bound: exact under key overflow") {
    val key = "spark.graft.topk.maxMapKeys"
    spark.conf.set(key, "2")
    try {
      val rnd = new scala.util.Random(11)
      val rows = (0 until 2000).map(i =>
        (rnd.nextInt(100).toLong, i.toLong, rnd.nextInt(8).toDouble))
      val df = rows.toDF("k", "id", "v").repartition(8)
      val got = TopK.perKey(df, Seq("k"), Seq(("v", true)), 2,
          withTies = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("v").desc)
      val expected = df.withColumn("rk", rank().over(w))
        .filter(col("rk") <= 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
      // v has only 8 distinct values over ~20 rows/key: ties beyond k
      // are guaranteed, so the ties contract is actually exercised
      assert(expected.size > 200)
    } finally spark.conf.unset(key)
  }

  test("map-side state bound: results stay exact when keys overflow it") {
    // force the partial phase to pass rows through after 2 tracked keys;
    // the final phase must still produce the exact top-k per key
    val key = "spark.graft.topk.maxMapKeys"
    spark.conf.set(key, "2")
    try {
      val rnd = new scala.util.Random(7)
      val rows = (0 until 2000).map(i =>
        (rnd.nextInt(200).toLong, i.toLong, rnd.nextInt(50).toDouble))
      val df = rows.toDF("k", "id", "v").repartition(8)
      val got = TopK.perKey(df, Seq("k"), Seq(("v", true), ("id", false)), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("v").desc, col("id"))
      val expected = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally spark.conf.unset(key)
  }

  test("physical plan is the two-phase heap operator, not sort+window") {
    val df = Tables.orders(spark, Sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val p = TopK.perKey(df, Seq("o_custkey"), Seq(("o_totalprice", true)), 3)
      .queryExecution.executedPlan.toString
    // node prints as "TopKPerKey" (Spark strips the Exec suffix):
    // map-side partial + final around a key-hashed Exchange
    assert("TopKPerKey \\[".r.findAllIn(p).length == 2, p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
    assert(p.contains("Exchange hashpartitioning(o_custkey"), p.take(1500))
  }
}
