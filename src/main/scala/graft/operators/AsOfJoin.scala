package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the payload of the LATEST right row
  * with right.ts <= left.ts within the same key — the temporal-join
  * operator Spark's built-ins don't name.
  *
  * Implementation is the scalable union+window form, not a per-key
  * lookup: tag both sides, union, one shuffle keyed by the join key,
  * and a running `last(payload, ignoreNulls)` ordered by time. O(n log
  * partition) with exactly one shuffle — equivalent plans via range
  * joins explode quadratically on dense keys.
  */
object AsOfJoin {

  /** @param payload right-side columns carried to the match (emitted as
    *   `asof_<name>`); right must contain keys ++ tsCol ++ payload.
    */
  def lastPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String, payload: Seq[String])
      : DataFrame = {
    val leftTagged = left.select(
      (Seq(struct(left.columns.map(col): _*).as("_lrow"),
        col(leftTsCol).as("_ts"), lit(0).as("_isr")) ++ keys.map(col)): _*)
      .withColumns(payload.map(p => s"_p_$p" -> lit(null)).toMap)
    val rightTagged = right.select(
      (Seq(lit(null).cast(leftTagged.schema("_lrow").dataType).as("_lrow"),
        col(rightTsCol).as("_ts"), lit(1).as("_isr")) ++ keys.map(col) ++
        payload.map(p => col(p).as(s"_p_$p"))): _*)

    // rights sort before lefts at equal ts → "<=" semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_isr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withAsOf = leftTagged.unionByName(rightTagged)
      .withColumns(payload.map(p =>
        s"_a_$p" -> last(col(s"_p_$p"), ignoreNulls = true).over(w)).toMap)

    withAsOf.filter(col("_isr") === 0)
      .select(col("_lrow.*") +:
        payload.map(p => col(s"_a_$p").as(s"asof_$p")): _*)
  }

  /** 39. Latest prior purchase per user for every event (left outer
    * as-of semantics: events before any purchase get NULL).
    */
  def q39AsOfJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
    val purchases = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("ts").as("purchase_ts"))
    lastPrior(ev, purchases, Seq("user_id"), "ts", "ts",
      Seq("purchase_ts"))
      .withColumnRenamed("asof_purchase_ts", "last_purchase_ts")
  }
}
