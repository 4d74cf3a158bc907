package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed parquet table with MERGE/DELETE semantics — the engine's
  * equivalent of the reference's MSSQL upserts and purge cascade
  * (db_ops.py:62-148, 53-59), re-expressed as snapshot replacement.
  *
  * Everything is a join or a window over the key — existing keys are
  * NEVER collected to the driver (the reference's `get_existing_data` →
  * Python set at etl_pipeline_script.py:43 dies at 100 TB). Writes go to
  * a fresh snapshot directory and flip atomically via rename, so readers
  * never see a half-written table. At cluster scale the same code runs
  * against an object store; a table format (e.g. log-structured commits)
  * would replace the rename, not the plan.
  */
object ParquetUpsertSink {

  /** Row-count accounting for a sink mutation — the reference logs the
    * inserted/updated/purged counts of every incremental run
    * (etl_pipeline_script.py:25-29,50-51); a pipeline that can't say
    * what it changed can't be audited.
    */
  case class SinkStats(inserted: Long, updated: Long, deleted: Long)

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataPath(tableDir: String) = new Path(tableDir, "data")

  def exists(spark: SparkSession, tableDir: String): Boolean =
    fs(spark, dataPath(tableDir)).exists(dataPath(tableDir))

  def read(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(dataPath(tableDir).toString)

  /** Atomically replace the table's data dir with `df`'s rows. */
  private def replace(spark: SparkSession, tableDir: String, df: DataFrame)
      : Unit = {
    val data = dataPath(tableDir)
    val tmp = new Path(tableDir, s"tmp-${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    val f = fs(spark, data)
    val old = new Path(tableDir, s"old-${java.util.UUID.randomUUID()}")
    if (f.exists(data) && !f.rename(data, old))
      throw new java.io.IOException(s"cannot stage out $data")
    if (!f.rename(tmp, data))
      throw new java.io.IOException(s"cannot commit $tmp -> $data")
    if (f.exists(old)) f.delete(old, true)
  }

  /** MERGE (upsert, last-write-wins): one row per key survives, updates
    * beating existing rows and later versions beating earlier ones.
    *
    * @param versionCol break ties within a batch (e.g. an event time);
    *   rows from `updates` always beat existing rows at equal version.
    */
  def upsert(spark: SparkSession, tableDir: String, updates: DataFrame,
      keys: Seq[String], versionCol: String): SinkStats = {
    // allowMissingColumns: schema evolution — updates may add columns
    // (nulls backfill the history) or omit dropped ones
    val tagged =
      if (!exists(spark, tableDir)) updates.withColumn("_src", lit(1))
      else read(spark, tableDir).withColumn("_src", lit(0))
        .unionByName(updates.withColumn("_src", lit(1)),
          allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    // winner row per key plus whether the key pre-existed (_mn = 0) —
    // both windows share the partition spec, so this is still ONE
    // shuffle on the key
    val winners = tagged
      .withColumn("_rn", row_number().over(w))
      .withColumn("_mn", min(col("_src")).over(Window.partitionBy(
        keys.map(col): _*)))
      .filter(col("_rn") === 1)
    // mutation accounting (computed BEFORE replace — the old snapshot's
    // files are gone afterwards): inserted = key only in updates;
    // updated = key pre-existed AND the WINNING row came from updates —
    // a key merely present on both sides whose incoming row loses the
    // version ordering leaves the table unchanged and is not an update
    val st = winners.agg(
        coalesce(sum(when(col("_mn") === 1, 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("_mn") === 0 && col("_src") === 1, 1L)
          .otherwise(0L)), lit(0L)))
      .first()
    replace(spark, tableDir, winners.drop("_rn", "_src", "_mn"))
    SinkStats(inserted = st.getLong(0), updated = st.getLong(1), deleted = 0L)
  }

  /** DELETE cascade: drop every row whose key appears in `purgeKeys`
    * (anti-join, the scalable form of the reference's per-key DELETE
    * loop).
    */
  def purge(spark: SparkSession, tableDir: String, purgeKeys: DataFrame,
      keyCol: String): SinkStats = {
    val current = read(spark, tableDir)
    val keySet = broadcast(purgeKeys.select(keyCol).distinct())
    // deleted = semi-join count BEFORE replace — deriving it from
    // before/after full counts costs two extra table scans AND races
    // with concurrent writers on the post-write read
    val deleted = current.join(keySet, Seq(keyCol), "left_semi").count()
    replace(spark, tableDir,
      current.join(keySet, Seq(keyCol), "left_anti"))
    SinkStats(inserted = 0L, updated = 0L, deleted = deleted)
  }

  /** Compact the table's data files into `numFiles` (small-file cleanup
    * after many incremental upserts — at scale, file count drives both
    * listing time and task overhead).
    */
  def compact(spark: SparkSession, tableDir: String, numFiles: Int): Unit =
    replace(spark, tableDir, read(spark, tableDir).coalesce(numFiles))

  /** Insert-new-only (append rows whose key is absent — the reference's
    * incremental season/match load, etl_pipeline_script.py:128-137).
    */
  def insertNewOnly(spark: SparkSession, tableDir: String, rows: DataFrame,
      keys: Seq[String]): SinkStats = {
    if (!exists(spark, tableDir)) {
      replace(spark, tableDir, rows)
      // footer metadata of the snapshot just written — no data scan
      return SinkStats(
        TableStatistics.parquetRowCount(spark, dataPath(tableDir).toString),
        0L, 0L)
    }
    val existing = read(spark, tableDir)
    // inserted = count of the appended rows BEFORE replace (before/after
    // full-table counts are two extra scans and race with concurrent
    // writers). localCheckpoint so the anti-join runs once — the count
    // and the write both read the materialized new rows.
    val newRows = rows.join(existing.select(keys.map(col): _*).distinct(),
      keys, "left_anti").localCheckpoint()
    val inserted = newRows.count()
    replace(spark, tableDir, existing.unionByName(newRows))
    SinkStats(inserted = inserted, updated = 0L, deleted = 0L)
  }

  /** Blocklist feedback: this run's failed keys become the next run's
    * blocklist — the reference appends failed player ids to
    * `dropped_players.json` so later extracts skip them
    * (etl_pipeline_script.py:63-70, api_extract.py:79). Composed from
    * the existing primitives: purge the failed keys from the target
    * table, then insert-new-only them into the blocklist table (re-runs
    * re-append nothing). q10's blocklist filter reads the updated list.
    *
    * @return (purge stats on the target, append stats on the blocklist)
    */
  def blocklistFeedback(spark: SparkSession, tableDir: String,
      blocklistDir: String, failedKeys: DataFrame, keyCol: String)
      : (SinkStats, SinkStats) = {
    val keys = failedKeys.select(keyCol).distinct()
    val purged = purge(spark, tableDir, keys, keyCol)
    val appended = insertNewOnly(spark, blocklistDir, keys, Seq(keyCol))
    (purged, appended)
  }
}
