package graft

/** Dev utility: dump `.explain("formatted")` for named queries to
  * files. Usage: runMain graft.ExplainDump <sfDir> <outDir> <suffix>
  * <query> [<query> ...] — writes <outDir>/<query>_<suffix>.txt.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args(0); val outDir = args(1); val suffix = args(2)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    args.drop(3).foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[explain] wrote $name")
    }
    spark.stop()
  }
}
