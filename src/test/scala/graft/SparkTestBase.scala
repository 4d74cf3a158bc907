package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (GraftSession config: AQE,
  * UTC, nanosAsLong).
  */
trait SparkTestBase {
  lazy val spark: SparkSession = GraftSession.get("4")
  val Sf = "/root/testdata/sf0.001"
}
