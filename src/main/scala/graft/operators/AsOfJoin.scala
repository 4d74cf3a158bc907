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
    *
    * Payloads travel inside ONE struct: the struct is non-null for
    * every right row even when its fields are null, so
    * `last(_, ignoreNulls)` anchors on the latest right ROW — per-column
    * sentinels would skip a genuinely-null payload value and silently
    * fall back to an earlier right row.
    */
  def lastPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String, payload: Seq[String])
      : DataFrame = {
    val pType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)))
    val leftTagged = left.select(
      (Seq(struct(left.columns.map(col): _*).as("_lrow"),
        col(leftTsCol).as("_ts"), lit(0).as("_isr"),
        lit(null).cast(pType).as("_p")) ++ keys.map(col)): _*)
    val rightTagged = right.select(
      (Seq(lit(null).cast(leftTagged.schema("_lrow").dataType).as("_lrow"),
        col(rightTsCol).as("_ts"), lit(1).as("_isr"),
        struct(payload.map(col): _*).as("_p")) ++ keys.map(col)): _*)

    // rights sort before lefts at equal ts → "<=" semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_isr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withAsOf = leftTagged.unionByName(rightTagged)
      .withColumn("_a", last(col("_p"), ignoreNulls = true).over(w))

    withAsOf.filter(col("_isr") === 0)
      .select(col("_lrow.*") +:
        payload.map(p => col(s"_a.$p").as(s"asof_$p")): _*)
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
