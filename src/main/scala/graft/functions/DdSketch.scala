package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** DETERMINISTIC mergeable quantile sketch — the DDSketch bucketing
  * (Masson, Lee & Rim, VLDB 2019) with a fixed log-γ bucket array:
  * bucket i > 0 covers value units in (γ^(i−1), γ^i], bucket 0 holds
  * zeros, and the estimate for bucket i is the interval midpoint
  * 2γ^i/(γ+1) — relative error ≤ (γ−1)/(γ+1) ≈ 1% at γ = 1.02.
  *
  * Why not the DataSketches KLL/REQ family (q162's HLL cousin):
  * those compact by RANDOM sampling, so two runs over the same data
  * produce different sketches — unusable under this engine's
  * determinism contract (every run must be row-identical). A fixed
  * bucket array is deterministic BY CONSTRUCTION, and its merge is
  * element-wise addition — exact, associative, commutative, so
  * map-side combine and any re-aggregation depth (the q162 rollup
  * pattern: daily artifacts → weekly/all-time at artifact scale)
  * cannot change the result. The price is a value-range cap: 2048
  * buckets cover unit values up to γ²⁰⁴⁷ ≈ 4·10¹⁷ at γ = 1.02;
  * larger values clamp to the top bucket (monitoring data — latencies,
  * sizes, prices — lives far below it).
  *
  * Input contract: NON-NEGATIVE integer units (scale fixed-decimal
  * data by 10⁴ first). Negatives are an error — a silent clamp would
  * corrupt low quantiles.
  */
object DdSketch {
  val Gamma = 1.02
  val Buckets = 2048
  private val LogGamma = math.log(Gamma)

  /** Bucket index of a non-negative value in units. */
  def bucketOf(units: Long): Int = {
    require(units >= 0, s"DdSketch values must be non-negative: $units")
    if (units == 0L) 0
    else {
      val i = math.ceil(math.log(units.toDouble) / LogGamma).toInt
      math.min(math.max(i, 1), Buckets - 1)
    }
  }

  /** Midpoint estimate of bucket i (0 → 0.0). */
  def estimateOf(bucket: Int): Double =
    if (bucket == 0) 0.0
    else 2.0 * math.pow(Gamma, bucket) / (Gamma + 1.0)

  /** Quantile q (0..1] from a bucket-count array: the value estimate of
    * the bucket holding the ⌈q·n⌉-th smallest element (nearest-rank).
    */
  def quantileFromCounts(counts: Array[Long], q: Double): Double = {
    val n = counts.sum
    require(n > 0, "empty sketch")
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var i = 0
    while (i < counts.length) {
      cum += counts(i)
      if (cum >= target) return estimateOf(i)
      i += 1
    }
    estimateOf(counts.length - 1)
  }
}

/** Bucket-count aggregation of non-negative long units. */
class DdSketchAgg
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  override def zero: Array[Long] = new Array[Long](DdSketch.Buckets)
  override def reduce(b: Array[Long], units: Long): Array[Long] = {
    b(DdSketch.bucketOf(units)) += 1L; b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Element-wise sum of long arrays — the MERGE side of any bucketed
  * artifact ([[DdSketchAgg]] counts, histogram vectors): re-aggregate
  * persisted daily sketches to any grain without touching rows.
  * Null/empty inputs are ignored; first non-empty input fixes the
  * length, later mismatches error (two different bucketings must
  * never silently zip-truncate).
  */
class LongVectorSum
    extends Aggregator[Array[Long], Array[Long], Array[Long]]
    with Serializable {
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(b: Array[Long], v: Array[Long]): Array[Long] =
    merge(b, if (v == null) Array.emptyLongArray else v)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // adopt a defensive copy, never the input array itself: later
    // merges mutate the buffer in place, and aliasing externally-owned
    // data would corrupt results if the encoder ever reused arrays
    if (a.isEmpty) b.clone()
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"vector length mismatch: ${a.length} vs ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
