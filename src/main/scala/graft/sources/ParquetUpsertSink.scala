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
    val merged = tagged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
    // mutation accounting: a key only in updates was inserted, a key on
    // both sides was updated (computed BEFORE replace — the old
    // snapshot's files are gone afterwards)
    val st = tagged.groupBy(keys.map(col): _*)
      .agg(min(col("_src")).as("_mn"), max(col("_src")).as("_mx"))
      .agg(
        coalesce(sum(when(col("_mn") === 1, 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("_mn") === 0 && col("_mx") === 1, 1L)
          .otherwise(0L)), lit(0L)))
      .first()
    replace(spark, tableDir, merged)
    SinkStats(inserted = st.getLong(0), updated = st.getLong(1), deleted = 0L)
  }

  /** DELETE cascade: drop every row whose key appears in `purgeKeys`
    * (anti-join, the scalable form of the reference's per-key DELETE
    * loop).
    */
  def purge(spark: SparkSession, tableDir: String, purgeKeys: DataFrame,
      keyCol: String): SinkStats = {
    val current = read(spark, tableDir)
    val before = current.count()
    val remaining = current.join(broadcast(purgeKeys.select(keyCol).distinct()),
      Seq(keyCol), "left_anti")
    replace(spark, tableDir, remaining)
    val after = read(spark, tableDir).count()
    SinkStats(inserted = 0L, updated = 0L, deleted = before - after)
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
      return SinkStats(read(spark, tableDir).count(), 0L, 0L)
    }
    val existing = read(spark, tableDir)
    val before = existing.count()
    val newRows = rows.join(existing.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    replace(spark, tableDir, existing.unionByName(newRows))
    val after = read(spark, tableDir).count()
    SinkStats(inserted = after - before, updated = 0L, deleted = 0L)
  }
}
