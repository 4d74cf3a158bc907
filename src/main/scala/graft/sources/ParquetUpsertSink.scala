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
      keys: Seq[String], versionCol: String): Unit = {
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
    replace(spark, tableDir, merged)
  }

  /** DELETE cascade: drop every row whose key appears in `purgeKeys`
    * (anti-join, the scalable form of the reference's per-key DELETE
    * loop).
    */
  def purge(spark: SparkSession, tableDir: String, purgeKeys: DataFrame,
      keyCol: String): Unit = {
    val current = read(spark, tableDir)
    val remaining = current.join(broadcast(purgeKeys.select(keyCol).distinct()),
      Seq(keyCol), "left_anti")
    replace(spark, tableDir, remaining)
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
      keys: Seq[String]): Unit = {
    if (!exists(spark, tableDir)) { replace(spark, tableDir, rows); return }
    val existing = read(spark, tableDir)
    val newRows = rows.join(existing.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    replace(spark, tableDir, existing.unionByName(newRows))
  }
}
