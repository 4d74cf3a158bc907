package graft

import graft.functions.PairMergeExpression
import graft.operators.BpeTrain
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("pair merge: leftmost non-overlapping semantics") {
    val df = Seq(
      (1L, Seq("a", "a", "a")),          // aaa + (a,a) -> [aa, a]
      (2L, Seq("a", "a", "a", "a")),     // aaaa -> [aa, aa]
      (3L, Seq("b", "a", "a", "b")),     // -> [b, aa, b]
      (4L, Seq("a", "b")),               // no match
      (5L, Seq.empty[String])).toDF("id", "syms")
    val got = df.select(col("id"),
      PairMergeExpression.pairMerge(spark, col("syms"), "a", "a").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("aa", "a"))
    assert(got(2L) == Seq("aa", "aa"))
    assert(got(3L) == Seq("b", "aa", "b"))
    assert(got(4L) == Seq("a", "b"))
    assert(got(5L) == Seq())
  }

  /** Reference BPE on a word-frequency map: overlapping pair counts
    * (sliding window), argmax on (weight desc, left, right), leftmost
    * non-overlapping merge — the exact semantics the distributed
    * version claims.
    */
  private def localBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var syms: Seq[(List[String], Long)] =
      words.toSeq.map { case (w, c) => (w.map(_.toString).toList, c) }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (r <- 0 until rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      syms.foreach { case (ss, c) =>
        ss.sliding(2).foreach {
          case List(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((l, rr), w) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r, l, rr, w))
        syms = syms.map { case (ss, c) =>
          val merged = scala.collection.mutable.ListBuffer[String]()
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == rr) {
              merged += (l + rr); i += 2
            } else { merged += ss(i); i += 1 }
          }
          (merged.toList, c)
        }
      }
    }
    out.toSeq
  }

  test("distributed BPE equals the local reference, merge by merge") {
    val words = Tables.documents(spark, Sf)
      .filter(col("text").isNotNull)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val wordMap = words.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = BpeTrain.train(spark, words, rounds = 8)
    val want = localBpe(wordMap, rounds = 8)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("q76 output: fused symbols, positive weights, distinct steps") {
    val rows = BpeTrain.q76Bpe(spark, Sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("step")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("left") + r.getAs[String]("right"))
      assert(r.getAs[Long]("weight") > 0)
    }
  }

  test("misra-gries: superset of true heavy hitters under merge") {
    // skewed synthetic stream: token i appears ~n/i times (zipf-ish)
    val items = (1 to 40).flatMap(i => Seq.fill(4000 / i)(s"t$i"))
    val ds = spark.sparkContext.parallelize(items, 8).toDS()
    val (cands, total) = ds
      .select(graft.functions.MisraGries.sketch(32).toColumn).head()
    assert(total == items.length)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
    val mustKeep = exact.filter(_._2 * 33 > total).keys.toSet
    assert(mustKeep.subsetOf(cands.toSet),
      s"missing: ${mustKeep -- cands.toSet}")
    assert(cands.size <= 32)
  }

  test("q77 heavy hitters equals the exact groupBy formulation") {
    val got = operators.TextOps.q77Hh(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.documents(spark, Sf).filter(col("text").isNotNull)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("cnt") * 64 > col("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }
}
