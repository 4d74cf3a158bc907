package graft.plans

import org.apache.spark.sql.DataFrame

/** Lineage cut that also RESETS plan statistics.
  *
  * `Dataset.localCheckpoint` in Spark 4.1 carries the parent plan's
  * `Statistics` onto the resulting `LogicalRDD`
  * (`LogicalRDD.rewriteStatsAndConstraints`, ExistingRDD.scala). For an
  * iterative loop whose per-round plan JOINS checkpoints of its own
  * previous round, that makes `sizeInBytes` compound MULTIPLICATIVELY:
  * `SizeInBytesOnlyStatsPlanVisitor.visitJoin` is the product of the
  * children's sizes, so the BigInt's bit-length doubles (or worse —
  * one doubling per self-join in the round plan) every round, and by
  * round ~7 a single stats multiplication is a Toom-Cook product of
  * gigabit integers that runs for hours ON THE DRIVER, before any job
  * starts (r13: the pointer-jumping CC round plan has three joins, and
  * planning hung inside the checkpoint call itself).
  *
  * Rebuilding the frame from its row RDD truncates lineage the same way
  * (RDD-level `localCheckpoint`, materialized eagerly) but the new
  * `LogicalRDD` starts from `defaultSizeInBytes` — stats growth resets
  * every cut. The price is one internal↔external row conversion per
  * pass, so use this at NODE/KEY grain (label tables, frontier sets),
  * not on corpus-scale frames.
  */
object LineageCut {
  /** Eager stats-free cut: materializes `df` now (flushing any
    * accumulators its expressions tick) and returns a frame whose plan
    * is a fresh scan of the checkpointed rows.
    */
  def cut(df: DataFrame): DataFrame = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    rdd.count()
    df.sparkSession.createDataFrame(rdd, df.schema)
  }
}
