package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Catalog-style table statistics read from parquet footers — row counts
  * without a Spark job or a data scan.
  *
  * The reference sizes its work from the warehouse catalog (row counts
  * are free in any table format); at 100 TB an eager `df.count()` at
  * plan-build time is a full-scan job per query. Footer metadata is
  * O(files), driver-side, and exact — the same numbers a lakehouse
  * catalog stores at commit time.
  */
object TableStatistics {

  /** Exact row count of a parquet file or directory of parquet files,
    * summed from footer metadata (no job, no data pages read).
    */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    def filesUnder(p: Path): Seq[Path] = {
      val st = fs.getFileStatus(p)
      if (st.isFile) Seq(p)
      else
        fs.listStatus(p).toSeq
          .filterNot(s => s.getPath.getName.startsWith("_") ||
            s.getPath.getName.startsWith("."))
          .flatMap(s => filesUnder(s.getPath))
    }
    filesUnder(p).map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try reader.getRecordCount finally reader.close()
    }.sum
  }

  /** Row count of a named testdata table (`<dir>/<name>.parquet`). */
  def tableRowCount(spark: SparkSession, dir: String, name: String): Long =
    parquetRowCount(spark, s"$dir/$name.parquet")

  /** Exact maximum of an INT64 column from parquet footer statistics —
    * the catalog's column max, free of any scan (column chunks store
    * min/max at write time). None when any chunk lacks statistics (a
    * partial max would be silently wrong). Sizes bounded-domain
    * structures (bitmap width, bucket counts) at plan-build time the
    * way BloomJoin sizes its sketch from `parquetRowCount`.
    */
  def parquetLongColumnMax(spark: SparkSession, path: String,
      column: String): Option[Long] = {
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    def filesUnder(p: Path): Seq[Path] = {
      val st = fs.getFileStatus(p)
      if (st.isFile) Seq(p)
      else
        fs.listStatus(p).toSeq
          .filterNot(s => s.getPath.getName.startsWith("_") ||
            s.getPath.getName.startsWith("."))
          .flatMap(s => filesUnder(s.getPath))
    }
    val chunkMaxes = filesUnder(p).flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        reader.getFooter.getBlocks.asScala.flatMap { block =>
          block.getColumns.asScala
            .filter(_.getPath.toDotString == column)
            .map { c =>
              val st = c.getStatistics
              if (st == null || st.isEmpty || !st.hasNonNullValue) None
              else st.genericGetMax match {
                case l: java.lang.Long => Some(l.longValue())
                case _ => None
              }
            }
        }.toList
      } finally reader.close()
    }
    if (chunkMaxes.isEmpty || chunkMaxes.exists(_.isEmpty)) None
    else Some(chunkMaxes.flatten.max)
  }
}
