package graft.operators

import graft.Tables
import graft.functions.{BpeEncodeExpression, PairMergeExpression}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary training (byte-pair encoding, Sennrich
  * et al. 2016 — the tokenizer-training step of an LLM data pipeline)
  * on the classic word-frequency formulation.
  *
  * 100-TB shape: the only corpus-scale work is ONE word-count groupBy
  * (map-side combined). The merge loop then runs on the DISTINCT-WORD
  * table — vocab-scale (millions of rows), not corpus-scale — and each
  * round is a partially-aggregated pair count plus a 1-row argmax;
  * symbol arrays are rewritten by the codegen'd O(L) [[PairMerge]]
  * pass and the lineage is cut per round (the q61 loop pattern).
  * Everything is deterministic: the argmax breaks ties on
  * (weight desc, left asc, right asc), a total order.
  */
object BpeTrain {

  /** Run `rounds` merge steps over a (word, cnt) frequency table.
    * Returns the learned merge table (step, left, right, weight).
    * Stops early when no adjacent pair remains.
    */
  def train(s: SparkSession, words: DataFrame, rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var syms = words.select(col("cnt"),
      filter(split(col("word"), ""), x => x =!= "").as("syms"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val n1 = greatest(size(col("syms")) - 1, lit(0))
      val top = syms
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), n1), slice(col("syms"), lit(2), n1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum(col("cnt")).as("w"))
        .orderBy(col("w").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, rr, w) = (top(0).getAs[String]("l"),
          top(0).getAs[String]("r"), top(0).getAs[Long]("w"))
        merges += ((r, l, rr, w))
        syms = syms.select(col("cnt"),
          PairMergeExpression.pairMerge(s, col("syms"), l, rr).as("syms"))
          .localCheckpoint(false)
        r += 1
      }
    }
    merges.toSeq
  }

  /** 90. Learned BPE merge table over the documents corpus (12 rounds).
    * The result is the vocabulary artifact itself — tiny by definition
    * (one row per merge) — so materializing it driver-side is the
    * semantics, not a collect() smell.
    */
  private def wordCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  def q76Bpe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    train(s, wordCounts(s, d), rounds = 12)
      .toDF("step", "left", "right", "weight")
      .select(col("step").cast("long").as("step"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("weight"))
  }

  /** 121. Tokenize the corpus with the vocabulary q76 trains — the
    * apply-side that turns a merge table into training tokens
    * ([[graft.functions.BpeEncode]]: min-rank loop, codepoint symbols,
    * per-executor word memoization). The merge table is the bounded
    * driver-side artifact train() already materializes; encoding itself
    * is ONE scan, zero shuffle, one codegen'd call per row — the shape
    * that tokenizes 100 TB at I/O speed. No SQL oracle: rank-priority
    * merging is the canonical-but-iterative semantics ANSI SQL can't
    * express (a per-merge sequential replay diverges the moment a later
    * merge creates an earlier merge's pair) — BpeSpec differentials
    * cover it against an independent reference encoder.
    */
  def q106BpeEncode(s: SparkSession, d: String): DataFrame = {
    val merges = train(s, wordCounts(s, d), rounds = 12)
      .map(m => (m._2, m._3))
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), BpeEncodeExpression.bpeEncode(s,
        split(lower(trim(col("text"))), "\\s+"), merges).as("sub"))
      .select(col("doc_id"), size(col("sub")).cast("long").as("n_subtok"),
        array_join(col("sub"), " ").as("subtoks"))
  }
}
