package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table layout for scale: partitioned writes (so predicate →
  * partition pruning skips whole directories) and bucketed tables (so
  * equi-joins on the bucket key need no shuffle at read time).
  *
  * At 100 TB these two decisions dominate query cost: a date-partitioned
  * events table turns a time-range scan from "read everything" into
  * "read the month", and bucketing the two biggest fact tables on the
  * join key removes the largest shuffle in the pipeline entirely.
  */
object TableLayout {

  /** Write `df` partitioned by a derived month column (hive-style dirs:
    * `part_month=2024-01/...`). Filters on `part_month` prune at
    * planning time — see the PartitionFilters plan audit.
    */
  def writeMonthPartitioned(df: DataFrame, tsCol: String, dir: String): Unit =
    df.withColumn("part_month", date_format(col(tsCol), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("part_month").parquet(dir)

  /** Day-grain variant — the right cut when a table's hot window is
    * days, not months (the layout decision is grain-per-velocity, not
    * one-size). The `d` prefix keeps partition-column type inference
    * from re-reading the value as DATE (the value must round-trip as
    * the STRING the Bloom index keys on).
    */
  def writeDayPartitioned(df: DataFrame, tsCol: String, dir: String): Unit =
    df.withColumn("part_day", date_format(col(tsCol), "'d'yyyyMMdd"))
      .write.mode("overwrite").partitionBy("part_day").parquet(dir)

  def readPartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Persist two tables bucketed on their join keys into the session
    * catalog; a subsequent equi-join on those keys reads co-located
    * buckets — no Exchange on either side.
    */
  def writeBucketed(df: DataFrame, bucketCol: String, buckets: Int,
      table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // the in-memory catalog forgets tables between sessions but their
    // warehouse directories survive — clear any orphaned location
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)
  }
}
