package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val name = args(0); val sf = args(1)
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
