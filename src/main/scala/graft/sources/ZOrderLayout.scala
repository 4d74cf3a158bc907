package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering layout: sort the table along an
  * interleaved-bit curve over TWO key columns so every output file gets
  * a tight min/max bounding box in BOTH dimensions at once — parquet
  * footer stats then skip row groups / files for predicates on EITHER
  * key. A single-column sort gives perfect skipping on that column and
  * none on the other; the z-curve trades a little of each for useful
  * skipping on both (the standard lakehouse OPTIMIZE ZORDER layout).
  *
  * Mechanics: each key is affine-scaled to 16 bits with engine-exact
  * integer math (`(x−min)·65535 DIV (max−min)` — the bounds come from
  * one tiny aggregate, broadcast back, never a driver round-trip), bits
  * spread to even positions by the classic mask cascade, and the two
  * words interleaved. 2^32 curve cells is far finer than any realistic
  * file count, so cell resolution never limits skipping granularity.
  *
  * Scale: the write is `repartitionByRange` on the z-value — an
  * equi-DEPTH cut of the curve (sampled range boundaries), so files
  * stay balanced under key skew where a fixed grid would not. The whole
  * computation is built-in integer expressions (codegen'd, one scan +
  * one range exchange); the 100-TB cost is the same as any sorted
  * rewrite, paid once at layout time.
  *
  * Reference analogue: the reference keeps single-key clustered
  * indexes only (sql/db_creation_script.sql:22-116); multi-dimensional
  * clustering is the lake-native generalization its row-store B-trees
  * never needed.
  */
object ZOrderLayout {

  /** Spread the low 16 bits of `c` to even positions (0 → 0, 1 → 2, …)
    * via the mask cascade; stays in pure codegen'd long arithmetic.
    */
  private[graft] def spread16(c: Column): Column = {
    val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two pre-scaled 16-bit words: `a` takes the
    * even bit positions, `b` the odd ones.
    */
  private[graft] def zValue16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** `df` plus a `zval` column over long columns `a` and `b`.
    * Scaling is integer round-down against the observed [min, max] of
    * each key ((x−min)·65535 must fit a long — true for ids, epoch
    * days/seconds, and anything else under ~2^47); constant columns
    * scale to 0. The bounds aggregate is 1 row, broadcast into the scan.
    */
  def withZValue(df: DataFrame, a: String, b: String): DataFrame = {
    val bounds = df.agg(min(col(a)).as("_amn"), max(col(a)).as("_amx"),
      min(col(b)).as("_bmn"), max(col(b)).as("_bmx"))
    def scale(c: String, mn: String, mx: String) = expr(
      s"CASE WHEN $mx = $mn THEN 0L " +
        s"ELSE (($c - $mn) * 65535L) DIV ($mx - $mn) END")
    df.crossJoin(broadcast(bounds))
      .withColumn("zval",
        zValue16(scale(a, "_amn", "_amx"), scale(b, "_bmn", "_bmx")))
      .drop("_amn", "_amx", "_bmn", "_bmx")
  }

  /** Rewrite `df` into `files` z-clustered parquet files: equi-depth
    * range cut along the curve, curve-sorted within each file so
    * row-group stats are tight too.
    */
  def zorderWrite(df: DataFrame, a: String, b: String, files: Int,
      dir: String): Unit =
    withZValue(df, a, b)
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(dir)

  /** 116. The curve itself, oracle-checked: every order's z-value over
    * (o_custkey, order epoch-day) — deterministic integer math, so
    * DuckDB reproduces it bit-for-bit.
    */
  def q101Zorder(s: SparkSession, d: String): DataFrame =
    withZValue(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        unix_date(to_date(col("o_orderdate"))).as("o_day")),
      "o_custkey", "o_day")
      .select(col("o_orderkey"), col("zval"))
}
