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

  /** (counters, total items seen). */
  type Buf = (Map[String, Long], Long)

  def sketch(k: Int): Aggregator[String, Buf, (Seq[String], Long)] =
    new Aggregator[String, Buf, (Seq[String], Long)] {
      override def zero: Buf = (Map.empty, 0L)

      override def reduce(b: Buf, x: String): Buf = {
        val (m, n) = b
        val next =
          if (m.contains(x)) m.updated(x, m(x) + 1L)
          else if (m.size < k) m.updated(x, 1L)
          else {
            // decrement-all on a miss at capacity; drop zeroed counters
            m.flatMap { case (t, c) =>
              if (c > 1L) Some(t -> (c - 1L)) else None
            }
          }
        (next, n + 1L)
      }

      override def merge(a: Buf, b: Buf): Buf = {
        val sum = b._1.foldLeft(a._1) { case (acc, (t, c)) =>
          acc.updated(t, acc.getOrElse(t, 0L) + c)
        }
        val trimmed =
          if (sum.size <= k) sum
          else {
            // subtract the (k+1)-th largest count, drop non-positive —
            // the mergeable-summaries rule preserving the n/(k+1) bound
            val kth = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
            sum.flatMap { case (t, c) =>
              if (c - kth > 0L) Some(t -> (c - kth)) else None
            }
          }
        (trimmed, a._2 + b._2)
      }

      override def finish(b: Buf): (Seq[String], Long) =
        (b._1.keys.toSeq.sorted, b._2)

      override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
      override def outputEncoder: Encoder[(Seq[String], Long)] =
        Encoders.kryo[(Seq[String], Long)]
    }
}
