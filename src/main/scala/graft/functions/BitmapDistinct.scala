package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact distinct-count over a bounded dense key domain via a fixed-width
  * bitmap — the roaring-bitmap/ClickHouse `groupBitmap` accelerator shape
  * for surrogate-key columns (the reference counts distinct players per
  * slice from its warehouse views, sql/db_creation_script.sql:185-205).
  *
  * Why not `countDistinct`: an exact distinct per group normally
  * re-shuffles the (group, key) pairs — the distinct KEYSET crosses the
  * wire. A bitmap buffer is a fixed ⌈domain/64⌉-word array whose merge is
  * word-wise OR: associative and commutative, so Spark map-side-combines
  * it like any partial aggregate and the shuffle carries ONE buffer per
  * (partition × group) instead of the keyset. For a 10⁹-key domain the
  * dense buffer would be 125 MB — the cap keeps a single dense buffer
  * honest (≤ 8 MB); beyond it, callers chunk the key space into
  * 2¹⁶-wide slices and run THIS aggregate per (group, chunk) — the
  * roaring-bitmap idea expressed relationally, with the identical
  * word-wise-OR merge algebra and no domain bound
  * ([[graft.operators.RelationalOps.bitmapDistinctPerGroup]]).
  * Exactness, unlike HLL, survives any merge order and any
  * re-aggregation depth.
  *
  * Keys must lie in [0, domain); out-of-range input is an ERROR (a
  * silent drop would fake exactness). Nulls are the caller's concern:
  * filter them before the aggregate (SQL COUNT(DISTINCT) semantics).
  */
class BitmapDistinct(val domain: Long)
    extends Aggregator[Long, Array[Long], Long] with Serializable {
  require(domain > 0 && domain <= (1L << 26),
    s"domain must be in (0, 2^26] for a dense bitmap (got $domain); " +
      "use a compressed bitmap beyond that")
  private val words = ((domain + 63) / 64).toInt

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], key: Long): Array[Long] = {
    if (key < 0 || key >= domain)
      throw new IllegalArgumentException(
        s"key $key outside bitmap domain [0, $domain)")
    b((key >>> 6).toInt) |= 1L << (key & 63)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Long = {
    var i = 0; var n = 0L
    while (i < b.length) { n += java.lang.Long.bitCount(b(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Word-wise OR of long-array bitmaps — the MERGE side of persisted
  * bitmap artifacts ([[BitmapAgg]] outputs): re-aggregate per-day
  * membership bitmaps to any window or grain without touching rows.
  * Empty/null inputs are ignored; first non-empty input fixes the
  * length (adopted as a defensive copy — later merges mutate the
  * buffer in place), later mismatches error (two different domains
  * must never silently zip-truncate).
  */
class BitmapOr
    extends org.apache.spark.sql.expressions.Aggregator[
      Array[Long], Array[Long], Array[Long]] with Serializable {
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(b: Array[Long], v: Array[Long]): Array[Long] =
    merge(b, if (v == null) Array.emptyLongArray else v)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) b.clone()
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"bitmap length mismatch: ${a.length} vs ${b.length}")
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
  }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** [[BitmapDistinct]] that returns the BITMAP itself instead of its
  * popcount — the membership ARTIFACT, not just the count. Set algebra
  * on the artifacts (AND = intersection, OR = union, word-wise) answers
  * overlap questions between any groups from ONE scan: k groups → k
  * bitmaps → k(k−1)/2 exact intersection cardinalities without ever
  * rescanning or re-shuffling the fact table (the q162 rollup idea with
  * EXACT set semantics instead of sketch estimates).
  */
class BitmapAgg(domain: Long)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  private val inner = new BitmapDistinct(domain)
  override def zero: Array[Long] = inner.zero
  override def reduce(b: Array[Long], key: Long): Array[Long] =
    inner.reduce(b, key)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    inner.merge(a, b)
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
