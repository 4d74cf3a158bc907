package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Banded interval (range) join: facts with a point timestamp against a
  * table of [lo, hi] windows, matched when `lo <= ts <= hi`.
  *
  * Spark has no native range-join operator: `facts.join(windows,
  * ts between lo and hi)` plans as BroadcastNestedLoopJoin (or a
  * cartesian when neither side broadcasts) — O(|facts| × |windows|)
  * comparisons, a non-starter once the window table outgrows a few
  * thousand rows. The banded formulation turns it into an EQUI-join:
  * each window row explodes to the fixed-width time buckets it covers,
  * each fact maps to exactly ONE bucket, and the join key is the
  * bucket — so the shuffle is hash-partitioned, never nested-loop. A
  * (fact, window) pair can only meet in the fact's single bucket, so no
  * post-join dedup is needed; the exact BETWEEN filter then drops
  * same-bucket non-overlaps. Choose `bucketUs` near the typical window
  * width: wider buckets mean fewer replicas per window (explosion
  * factor ≈ width/bucketUs + 1) but more non-matching same-bucket pairs
  * for the filter.
  *
  * Reference counterpart: the season-window assignment
  * (helper_functions.py:7-85) is this join's aligned special case —
  * here the windows are arbitrary unaligned intervals.
  */
object RangeJoin {

  /** Join `facts` (point column `ts`, LONG µs) to `windows` ([`lo`,
    * `hi`] LONG µs, inclusive) on containment. Output: every fact
    * column plus every window column, one row per (fact, window) match.
    */
  def intervalJoin(facts: DataFrame, ts: String, windows: DataFrame,
      lo: String, hi: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    require(!facts.columns.contains("_bucket") &&
      !windows.columns.contains("_bucket"),
      "inputs must not carry a _bucket column (the join's working key)")
    // `div` is integer division (Column./ is double division — lossy at
    // µs magnitudes); all timestamps are non-negative µs, so
    // truncation = floor and the bucketing is exact
    val wb = windows.withColumn("_bucket",
      explode(sequence(expr(s"`$lo` div $bucketUs"),
        expr(s"`$hi` div $bucketUs"))))
    val fb = facts.withColumn("_bucket", expr(s"`$ts` div $bucketUs"))
    fb.join(wb, Seq("_bucket"))
      .filter(col(ts) >= col(lo) && col(ts) <= col(hi))
      .drop("_bucket")
  }

  /** 104. Campaign-window attribution: the 20 highest-value purchases
    * each open a ±2 h window; count the events (and distinct users)
    * active inside each window, corpus-wide — the interval join with
    * genuinely unaligned windows (every bound is an arbitrary purchase
    * instant), so no date_trunc equi-key exists. The bucketed plan
    * keeps it an equi-join on the 1-hour bucket: window rows replicate
    * ~5×, facts map to one bucket each, and the shuffle stays
    * hash-partitioned no matter how many windows there are (the
    * nested-loop alternative degrades linearly in |windows|).
    */
  def q89IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
    val windows = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("window_id"), col("value"),
        unix_micros(col("ts")).as("pus"))
      .orderBy(col("value").desc, col("window_id")).limit(20)
      .select(col("window_id"),
        (col("pus") - 2 * hourUs).as("lo"), (col("pus") + 2 * hourUs).as("hi"))
    intervalJoin(ev, "us", windows, "lo", "hi", bucketUs = hourUs)
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
  }
}
