package graft

/** Scratch dev probe: time the co-purchase edge-build variants. */
object ProbeEdges {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime
      val n = f
      println(f"[edges] $name%-24s ${(System.nanoTime - t0) / 1e9}%6.2f s  n=$n")
    }
    for (_ <- 1 to 3) {
      t("coPurchaseEdges") {
        operators.GraphOps.coPurchaseEdges(spark, d)
          .localCheckpoint(false).count()
      }
      t("coPurchaseRawPairs") {
        operators.GraphOps.coPurchaseRawPairs(spark, d)
          .localCheckpoint(false).count()
      }
      t("rawPairs+dedup") {
        import org.apache.spark.sql.functions._
        operators.GraphOps.coPurchaseRawPairs(spark, d)
          .filter(col("src") < col("dst")).distinct()
          .localCheckpoint(false).count()
      }
      t("pruned(minCount=2)") {
        operators.GraphOps.prunedCoPurchaseEdges(spark, d, 2)
          .localCheckpoint(false).count()
      }
    }
    spark.stop()
  }
}
