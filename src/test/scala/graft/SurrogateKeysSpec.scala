package graft

import graft.operators.SurrogateKeys
import org.scalatest.funsuite.AnyFunSuite

class SurrogateKeysSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("mintKeys: dense 1..N in key order, stable under repartitioning") {
    val df = Seq("delta", "alpha", "charlie", "bravo", "alpha", "delta")
      .toDF("k")
    val got = SurrogateKeys.mintKeys(df, Seq("k"), "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("alpha" -> 1L, "bravo" -> 2L, "charlie" -> 3L,
      "delta" -> 4L))
    // same ids regardless of how the input happens to be partitioned
    val reparted = SurrogateKeys.mintKeys(df.repartition(7), Seq("k"), "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reparted == got)
  }

  test("q57: every fact row of the same key gets the same minted id") {
    val q = SurrogateKeys.q57SurrogateKeys(spark, Sf)
    assert(q.count() == Tables.events(spark, Sf).count())
    val perKey = q.groupBy("match_key")
      .agg(org.apache.spark.sql.functions.countDistinct("match_id").as("n"))
    assert(perKey.filter(org.apache.spark.sql.functions.col("n") =!= 1)
      .count() == 0)
  }

  test("mintKeys plan: the key-ranking window is partitioned, not global") {
    val p = SurrogateKeys.q57SurrogateKeys(spark, Sf)
      .queryExecution.executedPlan.toString
    // local ranks run per range partition (parallel); only the
    // #partitions-sized offset table may pass through a single partition
    assert(p.contains("hashpartitioning(_part"), p.take(2000))
  }
}
