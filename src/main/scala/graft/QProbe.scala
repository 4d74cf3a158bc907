package graft
import org.apache.spark.scheduler._

/** Dev prober: steady-state times + job/stage/task counts for a list
  * of SparkEntry queries in ONE JVM. Usage:
  *   runMain graft.QProbe <sfDir> <query> [<query> ...]
  * Each query: 1 warm-up + 3 timed noop-sink runs (the Bench action).
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args(0)
    @volatile var jobs = 0; @volatile var stages = 0; @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs += 1 }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks }
    })
    def once(name: String): Double = {
      val t0 = System.nanoTime
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime - t0) / 1e9
    }
    args.drop(1).foreach { name =>
      spark.sparkContext.setJobDescription(s"probe:$name")
      once(name) // warm-up
      val reps = (1 to 3).map { _ =>
        Thread.sleep(200); jobs = 0; stages = 0; tasks = 0
        val t = once(name)
        (t, jobs, stages, tasks)
      }
      val best = reps.map(_._1).min
      println(f"[probe] $name%-24s best=$best%6.2f s  " +
        reps.map(r => f"${r._1}%.2f(j=${r._2},st=${r._3},tk=${r._4})")
          .mkString("  "))
    }
    spark.stop()
  }
}
