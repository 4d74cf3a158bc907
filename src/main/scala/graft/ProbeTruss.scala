package graft

import org.apache.spark.sql.functions._

/** Scratch dev probe: q240 k-truss stage timing. */
object ProbeTruss {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime
      val r = f
      println(f"[kt] $name%-24s ${(System.nanoTime - t0) / 1e9}%6.2f s")
      r
    }
    for (_ <- 1 to 2) {
      val raw = operators.GraphOps.coPurchaseRawPairs(spark, d)
      val und = t("und build+ck") {
        val u = raw
          .select(least(col("src"), col("dst")).as("u"),
            greatest(col("src"), col("dst")).as("v"))
          .filter(col("u") < col("v")).distinct()
          .localCheckpoint(false)
        u.count(); u
      }
      val nE = und.count()
      val out = t("peel (collect+compute)") {
        // kTruss with the gate forced low so it must go driver-side —
        // call through the public API on the checkpointed und
        operators.GraphOps.kTruss(
          und.select(col("u").as("src"), col("v").as("dst"))
            .unionByName(und.select(col("v").as("src"), col("u").as("dst"))),
          k = 6)
      }
      t("noop write") {
        out.write.format("noop").mode("overwrite").save()
      }
      println(s"[kt] nE=$nE")
    }
    spark.stop()
  }
}
