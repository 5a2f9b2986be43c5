package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries summary state: total items seen + the bounded counter set. */
case class MGSummary(n: Long, counters: Map[String, Long])

/** Mergeable Misra–Gries heavy-hitter sketch (Misra & Gries 1982; the
  * mergeable form is Agarwal et al., "Mergeable Summaries", PODS'12): at
  * most k counters ever exist. `reduce` decrements every counter when a
  * non-resident token arrives with the buffer full; `merge` sums the two
  * counter sets and subtracts the (k+1)-th largest count so the result is
  * again ≤ k counters. Under ANY reduce/merge order the summary keeps the
  * two-sided guarantee
  *
  *   est(t) ≤ true(t)   and   true(t) − est(t) ≤ n/(k+1),
  *
  * so every token with true frequency > n/(k+1) is guaranteed a surviving
  * counter. State is O(k) regardless of input size — map-side partials
  * stay bounded on a 100 TB token stream and only k-entry buffers cross
  * the shuffle, which is the whole point: candidate generation without a
  * per-token exchange. The counter total `n` rides in the same buffer so
  * the threshold needs no second aggregate.
  *
  * The immutable-Map rebuild per decrement is fine for k ≤ a few hundred
  * (the regime the guarantee targets); an array-backed buffer is the
  * constant-factor upgrade if k ever needs to be large.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, MGSummary, MGSummary] {

  override def zero: MGSummary = MGSummary(0L, Map.empty)

  override def reduce(b: MGSummary, t: String): MGSummary = {
    val c = b.counters
    val next = c.get(t) match {
      case Some(v)            => c.updated(t, v + 1L)
      case None if c.size < k => c.updated(t, 1L)
      case None =>
        // decrement-all: one arrival cancels against one unit of every
        // resident counter (the charging argument behind the n/(k+1) bound)
        c.flatMap { case (t2, v2) => if (v2 > 1L) Some(t2 -> (v2 - 1L)) else None }
    }
    MGSummary(b.n + 1L, next)
  }

  override def merge(x: MGSummary, y: MGSummary): MGSummary = {
    val m = (x.counters.keySet ++ y.counters.keySet).iterator
      .map(t => t -> (x.counters.getOrElse(t, 0L) + y.counters.getOrElse(t, 0L)))
      .toMap
    val trimmed =
      if (m.size <= k) m
      else {
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(k)
        m.flatMap { case (t, v) => if (v > cut) Some(t -> (v - cut)) else None }
      }
    MGSummary(x.n + y.n, trimmed)
  }

  override def finish(r: MGSummary): MGSummary = r

  override def bufferEncoder: Encoder[MGSummary] = ExpressionEncoder[MGSummary]()

  override def outputEncoder: Encoder[MGSummary] = bufferEncoder
}
