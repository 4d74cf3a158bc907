package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed surrogate-key minting — the warehouse IDENTITY column
  * (reference `match_view_id INT IDENTITY` in
  * sql/db_creation_script.sql:104, consumed through the
  * match_key→id mapping join at etl_pipeline_script.py:140-145),
  * re-expressed without any single point of sequence generation.
  *
  * Keys are dense 1..N in natural-key sort order, so the assignment is
  * DETERMINISTIC (reproducible across runs, retries, and engines —
  * `monotonically_increasing_id` is neither dense nor stable). The
  * naive formulation — `row_number()` over a global window — collapses
  * all N keys onto one reducer; this one never does: range-partition
  * the distinct keys, rank within each partition in parallel, then add
  * per-partition offsets computed from a #partitions-sized count table.
  */
object SurrogateKeys {

  /** Mint a dense surrogate id (1..N, ordered by `keyCols`) for each
    * distinct value of `keyCols` in `df`. Returns the key-mapping table
    * (keyCols + `idCol`), ready to join back onto facts.
    */
  def mintKeys(df: DataFrame, keyCols: Seq[String], idCol: String)
      : DataFrame = {
    val kc = keyCols.map(col)
    // range partitions are ordered (partition i's keys all sort before
    // partition i+1's), so local rank + preceding-partition offset is
    // exactly the global dense rank — with no single-partition stage
    val parted = df.select(kc: _*).distinct()
      .repartitionByRange(kc: _*)
      .withColumn("_part", spark_partition_id())
    val localW = Window.partitionBy(col("_part")).orderBy(kc: _*)
    val local = parted.withColumn("_local_rn",
      row_number().over(localW).cast("long"))
    // one row per partition — driver-scale regardless of key count
    val counts = local.groupBy(col("_part")).agg(count(lit(1)).as("_n"))
    val offW = Window.orderBy(col("_part"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_n")).over(offW), lit(0L)))
      .select(col("_part"), col("_off"))
    local.join(broadcast(offsets), "_part")
      .withColumn(idCol, col("_off") + col("_local_rn"))
      .drop("_part", "_local_rn", "_off")
  }

  /** 57. The reference's match-view load: mint ids for the distinct
    * match keys, then the key→id mapping join back onto the fact rows
    * (etl_pipeline_script.py:140-145).
    */
  def q57SurrogateKeys(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_id"),
      concat(date_format(col("ts"), "yyyyMMddHHmmss"), lit("_"),
        col("user_id")).as("match_key"))
    val mapping = mintKeys(ev, Seq("match_key"), "match_id")
    ev.join(mapping, "match_key")
      .select("event_id", "match_key", "match_id")
  }
}
