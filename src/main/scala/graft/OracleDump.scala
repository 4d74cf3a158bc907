package graft

/** Dev utility: print one `SparkEntry.oracleSql` entry to stdout (or a
  * file) so a single oracle can be iterated against DuckDB without a
  * full `graft.Verify` dump cycle. Usage:
  *   runMain graft.OracleDump <query_key> [outFile]
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: OracleDump <query_key> [outFile]")
    val sql = SparkEntry.oracleSql.getOrElse(args(0),
      sys.error(s"no oracle for ${args(0)}"))
    if (args.length > 1)
      java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
        sql.getBytes("UTF-8"))
    else println(sql)
  }
}
