package graft
import org.apache.spark.scheduler._
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"
    @volatile var jobs = 0; @volatile var stages = 0; @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs += 1 }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks }
    })
    operators.GraphOps.q105PageRank(spark, d).count() // warm
    Thread.sleep(500); jobs = 0; stages = 0; tasks = 0
    val t0 = System.nanoTime
    operators.GraphOps.q105PageRank(spark, d).count()
    Thread.sleep(500)
    println(f"[probe] q105: ${(System.nanoTime-t0)/1e9}%.2f s, jobs=$jobs stages=$stages tasks=$tasks")
    spark.stop()
  }
}
