package graft

import graft.operators.FuzzyJoin
import org.scalatest.funsuite.AnyFunSuite

class FuzzyJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Classic full-DP edit distance — the local reference the blocked
    * join must reproduce exactly.
    */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("delete-1 blocked pairs equal the naive n² levenshtein join " +
      "(substitutions, insertions, deletions, length-1 strings)") {
    val rnd = new scala.util.Random(42)
    val ab = "abcd"
    def randStr(n: Int) =
      (0 until n).map(_ => ab(rnd.nextInt(ab.length))).mkString
    val base = (0 until 120).map(_ => randStr(1 + rnd.nextInt(7)))
    val mutated = base.flatMap { s =>
      val i = rnd.nextInt(s.length)
      Seq(s.updated(i, ab(rnd.nextInt(ab.length))),          // substitute
        s.substring(0, i) + s.substring(i + 1),              // delete
        s.substring(0, i) + ab(rnd.nextInt(ab.length)) + s.substring(i))
    }
    val all = (base ++ mutated).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val got = FuzzyJoin
      .editDistance1Pairs(all.toDF("id", "name"), "id", "name")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("id_a")),
        r.getLong(r.fieldIndex("id_b")), r.getLong(r.fieldIndex("dist"))))
      .toSet
    val byId = all.toMap
    val expected = (for {
      (ia, sa) <- all; (ib, sb) <- all
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
    assert(expected.nonEmpty && expected.exists(_._3 == 0) &&
      expected.exists(_._3 == 1), "test corpus must plant dups AND edits")
    assert(got == expected,
      s"missing=${(expected -- got).take(5).map(p => (byId(p._1), byId(p._2)))} " +
        s"extra=${(got -- expected).take(5)}")
  }

  test("null names match nothing; exact duplicates surface at dist 0") {
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, null.asInstanceOf[String]),
      (4L, "abc")).toDF("id", "name")
    val got = FuzzyJoin.editDistance1Pairs(df, "id", "name").collect()
      .map(r => (r.getLong(0) max r.getLong(1), r.getLong(0) min r.getLong(1),
        r.getLong(r.fieldIndex("dist")))).toSet
    assert(got == Set((2L, 1L, 1L), (4L, 1L, 0L), (4L, 2L, 1L)))
  }

  test("q91 plans as hash equi-joins: no nested loop, no cartesian") {
    val q = FuzzyJoin.q91FuzzyJoin(spark, Sf)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("_key"), p.take(2000))
  }

  test("q91: nonempty, every pair verified within distance 1") {
    val rows = FuzzyJoin.q91FuzzyJoin(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(r.fieldIndex("dist"))
      assert(d >= 0 && d <= 1)
      assert(lev(r.getAs[String]("name_a"), r.getAs[String]("name_b")) == d)
    }
  }
}
