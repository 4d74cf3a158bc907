package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bloom-prefiltered shuffle join: when the probe side is huge, the build
  * side is too big to broadcast-join outright, and most probe rows have
  * NO partner (the selective-dimension pattern — a filtered customer
  * segment against the full event log), ship a Bloom filter of the build
  * keys to the probe scan and drop partnerless rows BEFORE the shuffle.
  * The filter is megabytes where the build rows are gigabytes; false
  * positives only let a few extra rows through to the exact join, so the
  * result is identical to the plain join — what changes is that the
  * probe-side Exchange carries match-rate × |probe| rows instead of
  * |probe|. (The same idea as Spark's runtime row-level filtering, as an
  * explicit engine operator with the filter pushed into whole-stage
  * codegen via [[graft.functions.BloomMightContain]].)
  *
  * Scale: the build side is scanned once to populate the sketch
  * (`stat.bloomFilter`, a tree-reduced aggregate) and once for the join
  * itself — the price of shrinking the big side's shuffle, worth it
  * exactly when match rate ≪ 1. `expectedItems` sizes the sketch
  * (n·ln(1/fpp)/ln²2 bits ≈ 1.2 MB per million keys at 1% fpp); pass the
  * catalog/footer row count — do NOT leave the default in a hot path, it
  * costs an extra count() job.
  *
  * Reference counterpart: the keyed incremental loads of
  * etl_pipeline_script.py:128-145 (match_cards ⋈ new match keys) — at
  * 100 TB the "which rows have partners" question is what this answers
  * without shuffling the fact table.
  */
object BloomJoin {

  def prefilterJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame = {
    val n = if (expectedItems > 0) expectedItems else small.count()
    val bf = small.stat.bloomFilter(smallKey, n, fpp)
    val prefiltered = big.filter(graft.functions.BloomFilterExpression
      .mightContain(big.sparkSession, col(bigKey), bf))
    // Drop the build side's key: it duplicates bigKey value-for-value,
    // and when the two names collide every downstream select-by-name
    // would hit an ambiguous-column error.
    prefiltered.join(small, prefiltered(bigKey) === small(smallKey))
      .drop(small(smallKey))
  }
}
