package graft.functions

/** e9 fixed-point integer exp(x) for NON-NEGATIVE e9 inputs — the
  * [[FixedLn]] companion, same contract: one generated SQL step list
  * for both engines (Spark `DIV` / DuckDB `//`), every operand
  * non-negative so truncating and flooring division agree (the q148
  * sign rule never triggers — callers sign-split, computing exp(|x|)
  * and inverting: exp(−x)·1e18 = 1e18 DIV exp(x)·…, or using the
  * σ(−z) = 1 − σ(z) identity).
  *
  * Algorithm (input `_x` e9, 0 ≤ x ≤ [[MaxX]]): k = ⌊x/ln2⌋ by integer
  * division (r = x − k·ln2 ∈ [0, ln2) stays non-negative — a
  * round-to-NEAREST k would make r signed and reopen the DIV/floor
  * divergence), exp(r) by the Taylor series through r¹²/12!
  * (truncation < 3e-11 at r < ln 2), exp(x) = exp(r)·2^k by one CASE
  * power-of-two multiply. Output e9 (exp(x)·1e9); the plain-long
  * ceiling is x ≤ 20.7e9 (k ≤ 29, exp(r)·2^k ≤ 2e9·2^29 < 2^63). The
  * shipped operators clamp logits to ±20e9, where the σ/softmax tails
  * are < 2.1e-9 — below the e9 output quantum anyway.
  *
  * Unlocked operator family (r11): q247 logistic quality-classifier
  * scoring (the fastText/CCNet-style quality filter), q248
  * temperature-softmax source mixing, q249 perplexity = exp(q246's
  * cross-entropy).
  */
object FixedExp {

  val Ln2E9: Long = FixedLn.Ln2E9
  val One9: Long = FixedLn.One9

  /** Max e9 input the long pipeline supports (k ≤ 29). */
  val MaxX: Long = 20L * One9 + 700000000L // 20.7e9

  /** (columnName, sqlExpr) steps computing `out` = exp(_x)·1e9 from a
    * long e9 column `_x` with 0 ≤ _x ≤ [[MaxX]]; apply in order
    * (chained withColumn in Spark, lateral aliases in DuckDB).
    */
  def steps(div: String, out: String): Seq[(String, String)] = {
    val pow2 = (0 to 29).map(k => s"WHEN _ek = $k THEN ${1L << k}")
      .mkString("CASE ", " ", " ELSE 0 END")
    val fact = Seq(2L, 6L, 24L, 120L, 720L, 5040L, 40320L, 362880L,
      3628800L, 39916800L, 479001600L)
    val pows = (2 to 12).map { n =>
      s"_w$n" -> s"(_w${n - 1} * _er) $div $One9"
    }
    Seq(
      "_ek" -> s"_x $div $Ln2E9",
      "_er" -> s"_x - _ek * $Ln2E9",
      "_w1" -> "_er") ++ pows ++ Seq(
      "_es" -> (s"$One9 + _er + " +
        fact.zipWithIndex.map { case (f, i) => s"_w${i + 2} $div $f" }
          .mkString(" + ")),
      "_e2k" -> pow2,
      out -> "_es * _e2k")
  }

  /** The same algorithm in plain Scala longs — bit-identical to the
    * SQL steps by construction.
    */
  def expE9(x: Long): Long = {
    require(x >= 0 && x <= MaxX, s"expE9 domain [0, $MaxX], got $x")
    val k = (x / Ln2E9).toInt
    val r = x - k * Ln2E9
    val fact = Array(2L, 6L, 24L, 120L, 720L, 5040L, 40320L, 362880L,
      3628800L, 39916800L, 479001600L)
    var pw = r
    var s = One9 + r
    var i = 0
    while (i < fact.length) {
      pw = pw * r / One9
      s += pw / fact(i)
      i += 1
    }
    s * (1L << k)
  }

  /** σ(z)·1e9 for a SIGNED e9 logit, |z| clamped to 20e9 (tails beyond
    * are < 2.1e-9, below the output quantum): all-positive pipeline —
    * a = exp(|z|), σ(|z|) = round(1e9·a/(a+1e9)), σ(−|z|) by the
    * 1 − σ identity. BigInt only for the bounded 1e9·a product (the
    * SQL form uses DECIMAL(38,0)/HUGEINT there).
    */
  def sigmoidE9(z: Long): Long = {
    val az = math.min(math.abs(z), 20L * One9)
    val a = expE9(az)
    val pos = ((BigInt(2) * One9 * a + (BigInt(a) + One9)) /
      (BigInt(2) * (BigInt(a) + One9))).toLong
    if (z >= 0) pos else One9 - pos
  }
}
