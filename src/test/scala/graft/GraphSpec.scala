package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Local reference PageRank with the operator's exact integer math. */
  private def localPageRank(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size
    val init = 1000000000000L / n
    val base = (15L * init) / 100L
    var r = deg.keys.map(_ -> init).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = in.map { case (v, s) => v -> (base + (85L * s) / 100L) }
    }
    r
  }

  private def sym(pairs: (Long, Long)*): Seq[(Long, Long)] =
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }

  test("pageRank matches the local integer reference on a path and " +
      "a star graph, bit for bit") {
    for (edges <- Seq(
        sym((1L, 2L), (2L, 3L)),                     // path 1-2-3
        sym((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)), // star centered on 1
        sym((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))) {
      val got = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 15)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == localPageRank(edges, 15))
    }
  }

  test("star center outranks leaves; total mass stays ~10^12") {
    val edges = sym((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val r = GraphOps.pageRank(edges.toDF("src", "dst"), iters = 15)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L) && r(2L) == r(3L) && r(3L) == r(4L))
    val total = r.values.sum
    // truncating division leaks a little mass; must stay within 1%
    assert(total > 990000000000L && total <= 1000000000000L)
  }

  test("q105 ranks every co-purchased part exactly once") {
    val got = GraphOps.q105PageRank(spark, Sf)
      .select(col("partkey"), col("rank_ppt")).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getLong(0)).distinct.length == got.length)
    assert(got.forall(_.getLong(1) > 0L))
  }
}
