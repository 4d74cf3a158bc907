package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted EXACT-distinct rollup store — the materialized form of
  * the q161/q169/q181 chunked bitmap algebra (reference counterpart:
  * the distinct-player dashboards over warehouse views,
  * sql/db_creation_script.sql:185-205, made incremental).
  *
  * The artifact is one row per (group, day, 2¹⁶-chunk of the key
  * space) holding a 1024-word membership bitmap: KBs per occupied
  * cell, re-aggregatable to ANY grain — weekly, all-time, ad-hoc
  * sliding windows — by word-wise OR ([[graft.functions.BitmapOr]])
  * without ever re-reading facts. This is q162's "metrics store
  * derives coarser grains from the persisted daily artifact" pattern
  * with EXACT set semantics instead of sketch estimates: per-chunk
  * popcounts SUM exactly because chunks partition the key domain, and
  * the OR-merge is associative/commutative so re-aggregation depth
  * and order never matter (byte-determinism asserted in the suite).
  *
  * 100-TB shape: a day's facts fold into the artifact once (one
  * map-side-combined aggregate); every later NDV question — "distinct
  * users per type last 30 days" — is artifact-scale algebra over
  * calendar × occupied-chunk rows. The append is idempotent per day
  * (rebuild the day, overwrite its partition).
  */
object BitmapIndex {

  /** Fold a fact frame into the daily artifact: one bitmap per
    * (group, day, occupied chunk) plus the row count.
    */
  def build(facts: DataFrame, groupCol: String, tsCol: String,
      keyCol: String): DataFrame = {
    val bm = udaf(new graft.functions.BitmapAgg(1L << 16),
      org.apache.spark.sql.Encoders.scalaLong)
    facts
      .filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("grp"), to_date(col(tsCol)).as("day"),
        shiftrightunsigned(col(keyCol), 16).as("chunk"),
        col(keyCol).bitwiseAND(lit(65535L)).as("_off"))
      .groupBy(col("grp"), col("day"), col("chunk"))
      .agg(bm(col("_off")).as("bits"), count(lit(1)).cast("long").as("n"))
  }

  /** Persist day-partitioned (hive dirs → day-range reads prune at
    * planning time, the TableLayout rule).
    */
  def write(artifact: DataFrame, dir: String): Unit =
    artifact.withColumn("part_day", date_format(col("day"), "'d'yyyyMMdd"))
      .write.mode("overwrite").partitionBy("part_day").parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("part_day")

  /** Exact distinct keys + row count per group over [from, to] — pure
    * artifact algebra, the fact table is never touched: OR-merge each
    * chunk's daily bitmaps across the range, popcount, sum chunks.
    */
  def distinctBetween(index: DataFrame, from: String, to: String)
      : DataFrame = {
    val orAgg = udaf(new graft.functions.BitmapOr())
    def pop(c: org.apache.spark.sql.Column) =
      aggregate(transform(c, w => bit_count(w).cast("long")), lit(0L),
        (acc, x) => acc + x)
    index
      .filter(col("day").between(lit(from).cast("date"),
        lit(to).cast("date")))
      .groupBy(col("grp"), col("chunk"))
      .agg(orAgg(col("bits")).as("_u"), sum(col("n")).as("_n"))
      .groupBy(col("grp"))
      .agg(sum(pop(col("_u"))).cast("long").as("distinct_keys"),
        sum(col("_n")).cast("long").as("n_rows"))
  }
}
