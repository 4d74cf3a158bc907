package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    *
    * Ranking runs on DistributedRank: range partitions are ordered, so
    * parallel local ranks + preceding-partition offsets equal the
    * global dense rank with no single-partition stage.
    */
  def mintKeys(df: DataFrame, keyCols: Seq[String], idCol: String)
      : DataFrame =
    DistributedRank.withRank(df.select(keyCols.map(col): _*).distinct(),
      groupCols = Seq.empty, orderCols = keyCols, rankCol = idCol)

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
