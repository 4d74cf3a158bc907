package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fuzzy entity-resolution join: all pairs of rows whose string key is
  * within edit distance 1, found WITHOUT the O(n²) cross join.
  *
  * Blocking is the symmetric-delete (SymSpell) scheme: every string
  * emits itself plus its `length` delete-one-character variants, and two
  * strings with `levenshtein ≤ 1` are guaranteed to share at least one
  * variant — equal strings share the string itself, a substitution at
  * position i shares the delete-at-i variant, and an insertion's longer
  * side deletes the inserted character to produce the shorter side
  * verbatim. The candidate set is therefore a hash EQUI-join on the
  * variant key (ids only through the shuffle, payloads re-attached
  * after — the LSH pipeline discipline), and the exact `levenshtein`
  * verify drops the scheme's false positives (delete-neighborhood
  * overlap admits e.g. transpositions at distance 2). Spark's native
  * plan for the same predicate is a BroadcastNestedLoopJoin — n²
  * `levenshtein` calls, a non-starter past ~10⁵ rows, and exactly what
  * the DuckDB oracle has to run.
  *
  * Scale shape: keys are O(n·L) rows of short strings, the join is
  * hash-partitioned, and the verify is codegen'd with the threshold
  * variant's early exit. Bucket sizes are data-dependent (a variant
  * shared by m strings yields m² candidate pairs) — for near-identical
  * key populations cap or salt the hot variants; for edit distance
  * k > 1 the same scheme nests (delete-≤k neighborhoods), trading key
  * volume L^k for the same lossless guarantee.
  *
  * Reference counterpart: the name-keyed dimension maintenance in
  * db_ops.py:34-55 assumes exact keys; this is the fuzzy variant that
  * survives typo'd / re-crawled entity names.
  */
object FuzzyJoin {

  /** All (id_a < id_b) pairs of `rows` with `levenshtein(name) ≤ 1`,
    * with both names and the exact distance attached. Null names match
    * nothing (SQL semantics: `levenshtein(NULL, x)` is NULL).
    */
  def editDistance1Pairs(rows: DataFrame, id: String, name: String)
      : DataFrame = {
    // del_ix = -1 keeps the string itself; i ∈ [0, len) deletes the
    // 0-based character at i. substr is 1-based; every piece is
    // codegen'd (explode + substr + concat — no interpreted HOF lambda).
    val nm = col("_fj_name")
    val keyed = rows
      .select(col(id).as("_fj_id"), col(name).as("_fj_name"))
      .withColumn("_del_ix", explode(sequence(lit(-1), length(nm) - 1)))
      .withColumn("_key", when(col("_del_ix") === -1, nm)
        .otherwise(concat(
          nm.substr(lit(1), col("_del_ix")),
          nm.substr(col("_del_ix") + 2, length(nm) - col("_del_ix") - 1))))
      .select(col("_fj_id"), col("_key"))
    // ids-only candidates: a pair can meet in several buckets → distinct
    val cand = keyed.select(col("_fj_id").as("id_a"), col("_key"))
      .join(keyed.select(col("_fj_id").as("id_b"), col("_key")), Seq("_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // payload re-attach + exact verify (threshold form early-exits the
    // DP once the running minimum exceeds 1)
    val na = rows.select(col(id).as("id_a"), col(name).as("name_a"))
    val nb = rows.select(col(id).as("id_b"), col(name).as("name_b"))
    cand.join(na, Seq("id_a")).join(nb, Seq("id_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), 1).cast("long"))
      .filter(col("dist") >= 0)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
  }

  /** 105. Customer-name fuzzy self-join: every pair of customers whose
    * names are one edit apart (zero-padded numeric names make digit
    * substitutions plentiful). The oracle runs the naive n² inequality
    * join — same output, quadratically more work.
    */
  def q91FuzzyJoin(s: SparkSession, d: String): DataFrame =
    editDistance1Pairs(Tables.customer(s, d), "c_custkey", "c_name")
}
