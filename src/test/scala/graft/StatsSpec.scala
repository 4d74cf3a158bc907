package graft

import graft.operators.StatsOps
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.StatsOps.{Completeness, Uniqueness, Satisfies,
    Referential}

  test("dq report: planted violations measured in exact ppm") {
    val facts = Seq(
      (1L, Option(10L), 5.0, "O"),
      (2L, Option(20L), -1.0, "O"), // range violation
      (3L, None: Option[Long], 3.0, "X"), // null key + domain violation
      (3L, Option(99L), 2.0, "F")) // dup orderkey + orphan custkey
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val dim = Seq(10L, 20L).toDF("k")
    val got = StatsOps.dqReport(facts, Seq(
      Completeness("o_custkey"),
      Uniqueness("o_orderkey"),
      Satisfies("positive", col("o_totalprice") > 0),
      Satisfies("domain", col("o_orderstatus").isin("O", "F", "P")),
      Referential("o_custkey", dim, "k"))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got("completeness_o_custkey") == ((750000L, false)))
    assert(got("uniqueness_o_orderkey") == ((750000L, false)))
    assert(got("positive") == ((750000L, false)))
    assert(got("domain") == ((750000L, false)))
    assert(got("referential_o_custkey") == ((500000L, false)))
  }

  test("corr matrix drops incomplete rows (complete-case analysis)") {
    val df = Seq(
      (Option(1.0), Option(2.0)), (Option(2.0), Option(4.0)),
      (Option(3.0), None: Option[Double]), // must not skew the moments
      (None: Option[Double], Option(9.0)),
      (Option(3.0), Option(6.0))).toDF("x", "y")
    val got = StatsOps.corrMatrix(df, Seq("x", "y")).collect()
    assert(got.length == 1 && got.head.getDouble(2) == 1.0)
  }

  test("dq report rejects non-identifier and duplicate check names") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      StatsOps.dqReport(df, Seq(Satisfies("bad name!", col("a") > 0)))
    }
    intercept[IllegalArgumentException] {
      StatsOps.dqReport(df, Seq(Satisfies("dup", col("a") > 0),
        Satisfies("dup", col("b") > 0)))
    }
  }

  test("q95: the orders suite is all-pass on the test data") {
    val got = StatsOps.q95DqReport(spark, Sf).collect()
    assert(got.length == 5)
    got.foreach { r =>
      assert(r.getBoolean(2) && r.getLong(1) == 1000000L, r.toString)
    }
  }

  test("corr matrix: exact ±1 on linearly dependent columns") {
    val df = (1 to 200).map(i => (i * 1.0, 2.0 * i + 3.0, -1.0 * i))
      .toDF("x", "y", "z")
    val got = StatsOps.corrMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("x", "y")) == 1.0)
    assert(got(("x", "z")) == -1.0)
    assert(got(("y", "z")) == -1.0)
  }

  test("q93 is ONE pass: a single lineitem scan, partially aggregated") {
    val q = StatsOps.q93CorrMatrix(spark, Sf)
    q.collect()
    // AQE prints Final + Initial plan sections — audit the final one
    val p = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "FileScan|BatchScan".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 scan, got $scans:\n${p.take(2000)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2, // partial + final
      s"partial aggregation missing:\n${p.take(2000)}")
  }

  test("q93 matches a local double-precision Pearson within the " +
      "round-4 tolerance") {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = StatsOps.q93CorrMatrix(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size == 6)
    val data = Tables.lineitem(spark, Sf)
      .select(cols.head, cols.tail: _*).collect()
      .map(r => cols.indices.map(r.getDouble).toArray)
    val n = data.length.toDouble
    def pearson(i: Int, j: Int): Double = {
      val (si, sj) = (data.map(_(i)).sum, data.map(_(j)).sum)
      val sij = data.map(r => r(i) * r(j)).sum
      val (sii, sjj) =
        (data.map(r => r(i) * r(i)).sum, data.map(r => r(j) * r(j)).sum)
      (n * sij - si * sj) /
        (math.sqrt(n * sii - si * si) * math.sqrt(n * sjj - sj * sj))
    }
    for (i <- 0 until 4; j <- i + 1 until 4) {
      val e = pearson(i, j)
      val g = got((cols(i), cols(j)))
      assert(math.abs(g - e) <= 1e-4 + 1e-9,
        s"${cols(i)}×${cols(j)}: got $g expected $e")
    }
  }
}
