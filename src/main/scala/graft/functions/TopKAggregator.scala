package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored neighbor candidate. */
case class Scored(n_id: Long, cos: Double)

/** Typed single-pass top-k aggregator (SURVEY.md §7.3's optional custom
  * Aggregator): keeps the k best (cos desc, n_id asc) per group in a bounded
  * buffer. Compared to the window row_number formulation, partial aggregation
  * runs map-side, so only k rows per (partition, group) cross the shuffle —
  * the difference between shuffling k·|queries| rows and shuffling the whole
  * similarity matrix at 100 TB.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] = Ordering.by(s => (-s.cos, s.n_id))

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.size < k) (buf :+ a).sorted(ord)
    else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
    else buf

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    (x ++ y).sorted(ord).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    bufferEncoder
}
