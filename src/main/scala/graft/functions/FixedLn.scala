package graft.functions

/** e9 fixed-point integer ln(p/q) as a GENERATED SQL step list — ONE
  * definition emitted for both engines (Spark `DIV`, DuckDB `//`; all
  * operands non-negative, so truncating and flooring division agree).
  *
  * Algorithm (input columns `_p`, `_q`, longs with p ≥ q ≥ 1): range-
  * reduce by the power of two found with pure integer compares
  * (⌊log₂(p/q)⌋ = ⌊log₂⌊p/q⌋⌋ for integers), m = (p/q)/2^k ∈ [1,2),
  * z = (m−1)/(m+1) ∈ [0,1/3), ln m = 2·atanh z by the odd series
  * through z¹⁷ (truncation < 1e-9), ln(p/q) = k·ln2 + ln m with ln2 as
  * the e9 constant 693147181. Absolute error vs true ln ≲ 1e-8 —
  * irrelevant for cross-engine agreement, because BOTH engines compute
  * the identical integer. Long-safe for p up to ~2.3e9 (the z
  * numerator 2e9·(p−q·2^k) overflows first); callers with larger
  * rationals quantize to ppm shares first (the q244/q245 pattern).
  *
  * Unlocked operator family (r11): q112 BM25 idf, q244 WOE/IV, q245
  * Jensen-Shannon divergence, q246 document cross-entropy — every
  * log-based score that was structurally rows-only while it went
  * through libm `ln` (whose last ulp differs across engines, the q58
  * rule) is now a full oracle row.
  */
object FixedLn {

  val Ln2E9 = 693147181L
  val One9 = 1000000000L

  /** (columnName, sqlExpr) steps computing `out` = ln(_p/_q)·1e9 from
    * long columns `_p`, `_q`; apply in order (each step may reference
    * earlier ones — chained withColumn in Spark, lateral column
    * aliases in DuckDB).
    */
  def steps(div: String, out: String): Seq[(String, String)] = {
    val ks = (1 to 40).reverse
    val kkCase = ks.map(k => s"WHEN _t >= ${1L << k} THEN $k")
      .mkString("CASE ", " ", " ELSE 0 END")
    val m2kCase = ks.map(k => s"WHEN _t >= ${1L << k} THEN ${1L << k}")
      .mkString("CASE ", " ", " ELSE 1 END")
    Seq(
      "_t" -> s"_p $div _q",
      "_kk" -> kkCase,
      "_m2k" -> m2kCase,
      "_a9" -> "_p - _q * _m2k",
      "_b9" -> "_p + _q * _m2k",
      // 2000000000 folded: ANSI Spark parses 2 * 1000000000 as INT×INT
      // and throws on the overflow before promoting
      "_z" -> s"(2000000000 * _a9 + _b9) $div (2 * _b9)",
      "_z2" -> s"(_z * _z) $div $One9",
      "_p3" -> s"(_z * _z2) $div $One9",
      "_p5" -> s"(_p3 * _z2) $div $One9",
      "_p7" -> s"(_p5 * _z2) $div $One9",
      "_p9" -> s"(_p7 * _z2) $div $One9",
      "_p11" -> s"(_p9 * _z2) $div $One9",
      "_p13" -> s"(_p11 * _z2) $div $One9",
      "_p15" -> s"(_p13 * _z2) $div $One9",
      "_p17" -> s"(_p15 * _z2) $div $One9",
      "_lns" -> (s"_z + _p3 $div 3 + _p5 $div 5 + _p7 $div 7 " +
        s"+ _p9 $div 9 + _p11 $div 11 + _p13 $div 13 " +
        s"+ _p15 $div 15 + _p17 $div 17"),
      // CAST before the multiply: _kk is an INT-typed CASE and
      // INT×693147181 overflows 32 bits at kk ≥ 4 (ANSI throws)
      out -> s"CAST(_kk AS BIGINT) * $Ln2E9 + 2 * _lns")
  }

  /** The same algorithm in plain Scala longs — the independent replay
    * tests and driver-side consumers use this; it is definitionally
    * bit-identical to the SQL steps.
    */
  def lnE9(p: Long, q: Long): Long = {
    require(p >= q && q >= 1, s"lnE9 needs p >= q >= 1, got $p/$q")
    val t = p / q
    val kk = (40 to 1 by -1).find(k => t >= (1L << k)).getOrElse(0)
    val m2k = 1L << kk
    val a9 = p - q * m2k
    val b9 = p + q * m2k
    val z = (2000000000L * a9 + b9) / (2 * b9)
    val z2 = z * z / One9
    var pw = z
    var lns = z
    var j = 3L
    while (j <= 17L) {
      pw = pw * z2 / One9
      lns += pw / j
      j += 2
    }
    kk * Ln2E9 + 2 * lns
  }

  /** Signed variant for q < p OR p < q (still p, q ≥ 1):
    * ln(p/q) = −ln(q/p) when p < q.
    */
  def lnE9Signed(p: Long, q: Long): Long =
    if (p >= q) lnE9(p, q) else -lnE9(q, p)
}
