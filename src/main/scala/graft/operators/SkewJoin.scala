package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for large⋈small joins on skewed keys, for when
  * AQE's runtime skew splitting isn't available (e.g. the skewed side
  * feeds a non-shuffle stage) or the skew is known up front.
  *
  * The large side gets a deterministic per-row salt in [0, n); the small
  * side is replicated n times. The join key becomes (key, salt), so a hot
  * key's rows spread over n reducers instead of one.
  */
object SkewJoin {

  /** Per-row deterministic salt from a stable column (row identity —
    * e.g. a primary key), NOT from the join key (salting the key's hash
    * would keep each hot key on one reducer).
    */
  private def saltOf(stable: Column, n: Int): Column =
    pmod(xxhash64(stable), lit(n.toLong)).cast("int")

  /** Only inner and left-outer are supported: the small side is
    * replicated n times, so a right/full outer join would emit every
    * UNMATCHED small-side row n times (matched rows join exactly once
    * because the salt must agree). Left-outer is safe — unmatched rows
    * come from the un-replicated large side.
    */
  def saltedJoin(large: DataFrame, largeKey: String, stableCol: String,
      small: DataFrame, smallKey: String, n: Int,
      joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter").contains(jt),
      s"saltedJoin supports inner/left_outer only, got '$joinType': " +
        "the replicated small side would duplicate unmatched right rows")
    val salted = large.withColumn("_salt", saltOf(col(stableCol), n))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated,
        salted(largeKey) === replicated(smallKey) &&
          salted("_salt") === replicated("_salt"), joinType)
      .drop("_salt")
  }

  /** 43. Driver-visible instantiation: lineitem ⋈ part on the fact
    * table's part key, salt 8 — the manual-skew-mitigation shape for a
    * hot dimension key. The salt is derived from `l_orderkey` (row
    * identity, NOT the join key — hashing the join key would keep each
    * hot key on one reducer). Output is DEFINED to equal the plain
    * inner join (matched rows join exactly once because the salt must
    * agree), so the DuckDB oracle is that plain join.
    */
  def q86SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = graft.Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val dim = graft.Tables.part(s, d)
      .filter(col("p_size") <= 10)
      .select("p_partkey", "p_brand")
    saltedJoin(li, "l_partkey", "l_orderkey", dim, "p_partkey", n = 8)
      .select("l_orderkey", "l_linenumber", "p_partkey", "p_brand")
  }

  /** Key histogram — find candidates for salting: keys whose row count
    * exceeds `threshold` times the mean.
    */
  def skewedKeys(df: DataFrame, key: String, threshold: Double): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val mean = counts.agg(avg(col("n")).as("mean_n"))
    counts.crossJoin(broadcast(mean))
      .filter(col("n") > col("mean_n") * threshold)
      .select(col(key), col("n"))
  }
}
