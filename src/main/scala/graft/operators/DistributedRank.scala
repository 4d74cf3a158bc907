package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global per-group row ranks without a per-group single-reducer sort.
  *
  * `row_number() OVER (PARTITION BY group ORDER BY ord)` sends EVERY row
  * of a group through one reducer — fatal when groups are few and large
  * (3 return flags × 33 TB each). This formulation range-partitions by
  * (group, ord) so partitions are ordered slices, ranks each slice in
  * parallel, and adds per-(partition, group) offsets computed from a
  * #partitions × #groups count table (driver-scale, broadcast back).
  * The result equals the global window rank wherever ties are resolved
  * by value (ties share a partition under range partitioning).
  */
object DistributedRank {

  /** Append `rankCol` = 1-based rank of each row within its
    * `groupCols` group ordered by `orderCols` (ascending).
    *
    * INVARIANT the correctness of `_off + _lrn` rests on: the offsets
    * branch and the join's left branch must see IDENTICAL
    * `spark_partition_id()` values, i.e. one physical execution of the
    * range exchange. Relying on Spark's ReuseExchange rule for that is
    * NOT safe — the r9 20M-row stress run caught the self-join's
    * attribute dedup defeating reuse, the range exchange executing
    * twice, and RangePartitioner's rdd-id-seeded SAMPLING picking
    * different boundaries per execution (≈450k duplicate ranks). The
    * ranged frame is therefore localCheckpoint'd: `_part` is data
    * computed on one materialization, impossible to diverge.
    * PlanAuditSpec asserts ZERO rangepartitioning in q45's consumer
    * plan (the exchange is hidden inside the checkpoint — consumers
    * see a Scan ExistingRDD) and pins the exchange itself in
    * [[rangeSliced]]'s own plan, so a regression fails the suite.
    */
  /** The pre-checkpoint ranged frame — split out so PlanAuditSpec can
    * pin the rangepartitioning exchange that the checkpoint hides from
    * consumer plans.
    */
  private[graft] def rangeSliced(df: DataFrame, gc: Seq[org.apache.spark
      .sql.Column], oc: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.repartitionByRange((gc ++ oc): _*)
      .withColumn("_part", spark_partition_id())

  def withRank(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], rankCol: String): DataFrame = {
    val gc = groupCols.map(col)
    val oc = orderCols.map(col)
    val parted = rangeSliced(df, gc, oc).localCheckpoint(false)
    // per-partition rank: parallel (each range slice independently)
    val localW = Window.partitionBy(col("_part") +: gc: _*).orderBy(oc: _*)
    val local = parted.withColumn("_lrn",
      row_number().over(localW).cast("long"))
    // one row per (partition, group) — driver-scale however big df is
    val counts = local.groupBy(col("_part") +: gc: _*)
      .agg(count(lit(1)).as("_n"))
    val offW = Window.partitionBy(gc: _*).orderBy(col("_part"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_n")).over(offW), lit(0L)))
      .select(col("_part") +: gc :+ col("_off"): _*)
    local.join(broadcast(offsets), "_part" +: groupCols)
      .withColumn(rankCol, col("_off") + col("_lrn"))
      .drop("_part", "_lrn", "_off")
  }

  /** Append `outCol` = EXCLUSIVE running sum of `valueCol` (long) within
    * its `groupCols` group ordered by `orderCols` — the distributed
    * prefix-sum primitive. Same shape as [[withRank]]: a global
    * `SUM OVER (PARTITION BY group ORDER BY ord)` window sends every
    * row of a group through one reducer; here partitions are ordered
    * range slices summed in parallel, plus broadcast per-(partition,
    * group) offsets (a #partitions × #groups table — driver-scale).
    * Shares withRank's one-materialization invariant: the ranged frame
    * is localCheckpoint'd so both consumers of `local` read identical
    * `_part` values (ReuseExchange alone is not safe — see withRank).
    */
  def withRunningSum(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], valueCol: String, outCol: String): DataFrame =
    withRunningSums(df, groupCols, orderCols, Seq(valueCol -> outCol))

  /** Multi-column [[withRunningSum]]: all `sums` (valueCol → outCol)
    * share the ONE range exchange, local window pass and offset
    * broadcast — k prefix sums for the price of one, where k separate
    * calls would pay k range shuffles of the full table.
    */
  def withRunningSums(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], sums: Seq[(String, String)]): DataFrame = {
    require(sums.nonEmpty, "need at least one (valueCol, outCol) pair")
    require(sums.map(_._2).distinct.size == sums.size,
      "output column names must be unique")
    val gc = groupCols.map(col)
    val oc = orderCols.map(col)
    val parted = rangeSliced(df, gc, oc).localCheckpoint(false)
    val localW = Window.partitionBy(col("_part") +: gc: _*).orderBy(oc: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // all windowed columns share one Window operator (same spec)
    val local = sums.foldLeft(parted) { case (acc, (v, o)) =>
      acc.withColumn(s"_lcs_$o",
        coalesce(sum(col(v)).over(localW), lit(0L)))
    }
    val aggExprs = sums.map { case (v, o) => sum(col(v)).as(s"_n_$o") }
    val counts = local.groupBy(col("_part") +: gc: _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
    val offW = Window.partitionBy(gc: _*).orderBy(col("_part"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums.foldLeft(counts) { case (acc, (_, o)) =>
      acc.withColumn(s"_off_$o",
        coalesce(sum(col(s"_n_$o")).over(offW), lit(0L)))
    }.select(col("_part") +: gc ++: sums.map(s => col(s"_off_${s._2}")): _*)
    val joined = local.join(broadcast(offsets), "_part" +: groupCols)
    val out = sums.foldLeft(joined) { case (acc, (_, o)) =>
      acc.withColumn(o, col(s"_off_$o") + col(s"_lcs_$o"))
    }
    out.drop("_part" +: sums.flatMap(s =>
      Seq(s"_lcs_${s._2}", s"_off_${s._2}")): _*)
  }
}
