package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter sketch as a typed, MERGEABLE Aggregator
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012).
  *
  * Guarantee: with `k` counters, every item whose true frequency
  * exceeds n/(k+1) survives in the summary — a SUPERSET of the heavy
  * hitters — and the summary is O(k) regardless of how many distinct
  * items the stream has. That is the 100-TB point: a full
  * groupBy-count over all distinct tokens shuffles the whole keyspace;
  * the sketch reduces each partition to k counters, merges
  * associatively, and only the candidate set is ever re-counted
  * exactly.
  *
  * The buffer also carries the total item count so callers get the
  * threshold n in the same single pass.
  */
object MisraGries {

  /** (counters, total items seen). The counter map is MUTATED in place
    * by reduce/merge — the Aggregator contract permits returning the
    * same buffer, and per-item persistent-map copies are exactly the
    * allocation pattern a corpus-scale hot loop can't afford.
    */
  final class Buf(val m: scala.collection.mutable.HashMap[String, Long],
      var n: Long) extends Serializable

  def sketch(k: Int): Aggregator[String, Buf, (Seq[String], Long)] =
    new Aggregator[String, Buf, (Seq[String], Long)] {
      override def zero: Buf =
        new Buf(scala.collection.mutable.HashMap.empty, 0L)

      override def reduce(b: Buf, x: String): Buf = {
        val m = b.m
        val cur = m.getOrElse(x, -1L)
        if (cur >= 0L) m.update(x, cur + 1L)
        else if (m.size < k) m.update(x, 1L)
        else {
          // decrement-all on a miss at capacity; drop zeroed counters.
          // Amortized O(1): a full sweep needs k prior hits to rebuild.
          m.filterInPlace((_, c) => c > 1L)
          m.mapValuesInPlace((_, c) => c - 1L)
        }
        b.n += 1L
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        b.m.foreach { case (t, c) =>
          a.m.update(t, a.m.getOrElse(t, 0L) + c)
        }
        if (a.m.size > k) {
          // subtract the (k+1)-th largest count, drop non-positive —
          // the mergeable-summaries rule preserving the n/(k+1) bound
          val kth = a.m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
          a.m.mapValuesInPlace((_, c) => c - kth)
          a.m.filterInPlace((_, c) => c > 0L)
        }
        a.n += b.n
        a
      }

      override def finish(b: Buf): (Seq[String], Long) =
        (b.m.keys.toSeq.sorted, b.n)

      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[(Seq[String], Long)] =
        Encoders.kryo[(Seq[String], Long)]
    }
}
