package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (value, id) entry of a bounded top-k aggregate (value desc, id asc). */
case class Ranked(v: Long, id: Long)

/** Bounded top-k per group as a typed `Aggregator`: keeps only the k best
  * (value desc, id asc) pairs in the aggregation buffer.
  *
  * Scale rationale: the standard `row_number() OVER (PARTITION BY g ORDER BY
  * v DESC) <= k` formulation shuffles and sorts EVERY row of every group.
  * This aggregate is partial-aggregable — each map task reduces its slice of
  * a group to ≤ k entries before the shuffle, so shuffle volume is
  * O(k · groups · mappers) regardless of group size, and no sort of the full
  * group ever happens. At 100 TB (billions of rows per hot group) that is
  * the difference between a bounded and an unbounded stage.
  *
  * Determinism: the (v desc, id asc) total order makes the result — and the
  * oracle's ROW_NUMBER formulation — unique, so the query is exact-hash
  * gated despite the nondeterministic merge order.
  */
class TopKAgg(k: Int) extends Aggregator[Ranked, Seq[Ranked], Seq[Ranked]] {
  private def better(a: Ranked, b: Ranked): Boolean =
    a.v > b.v || (a.v == b.v && a.id < b.id)
  // buffers stay sorted, so merge is a bounded merge of two ≤ k lists
  private def mergeBounded(a: Seq[Ranked], b: Seq[Ranked]): Seq[Ranked] =
    (a ++ b).sortWith(better).take(k)

  override def zero: Seq[Ranked] = Nil
  override def reduce(buf: Seq[Ranked], in: Ranked): Seq[Ranked] =
    mergeBounded(buf, in :: Nil)
  override def merge(a: Seq[Ranked], b: Seq[Ranked]): Seq[Ranked] =
    mergeBounded(a, b)
  override def finish(buf: Seq[Ranked]): Seq[Ranked] = buf
  override def bufferEncoder: Encoder[Seq[Ranked]] =
    ExpressionEncoder[Seq[Ranked]]()
  override def outputEncoder: Encoder[Seq[Ranked]] =
    ExpressionEncoder[Seq[Ranked]]()
}

object TopK {
  /** Encoder for the two-column udaf application site. */
  val inputEncoder: Encoder[Ranked] = Encoders.product[Ranked]
}
