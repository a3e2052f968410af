package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Top-2 argmin by (d2, id) — the map-side-combinable aggregate the
  * two-level router's TOP-2 SUPER routing needs (SURVEY §4.2's
  * custom-Aggregator case): collecting the two lexicographically
  * smallest (distance, id) pairs per group in ONE pass. The
  * alternatives are worse at scale: a window over the items×sups
  * expand shuffles n·√cells rows (the groupBy collapses them
  * map-side), and two chained min(struct) passes scan the expand
  * twice. Ties break exactly like `min(struct(d2, id))` — strictly
  * lexicographic — so the streamed encoder's Long arithmetic and the
  * oracle's `row_number() OVER (ORDER BY d2, sid)` agree bit-for-bit
  * on integer-valued distances.
  */
final case class MinPair2Buf(d1: Double, i1: Long, d2: Double, i2: Long)

object MinPair2 extends Aggregator[(Double, Long), MinPair2Buf, Seq[Long]] {

  private val noneD = Double.MaxValue
  private val noneI = Long.MaxValue

  override def zero: MinPair2Buf = MinPair2Buf(noneD, noneI, noneD, noneI)

  private def lt(ad: Double, ai: Long, bd: Double, bi: Long): Boolean =
    ad < bd || (ad == bd && ai < bi)

  private def ins(b: MinPair2Buf, d: Double, i: Long): MinPair2Buf =
    if (lt(d, i, b.d1, b.i1)) MinPair2Buf(d, i, b.d1, b.i1)
    else if (lt(d, i, b.d2, b.i2)) MinPair2Buf(b.d1, b.i1, d, i)
    else b

  override def reduce(b: MinPair2Buf, v: (Double, Long)): MinPair2Buf =
    ins(b, v._1, v._2)

  override def merge(a: MinPair2Buf, b: MinPair2Buf): MinPair2Buf =
    ins(ins(a, b.d1, b.i1), b.d2, b.i2)

  /** Best-first ids; the sentinel pair (empty-group slots) drops out. */
  override def finish(r: MinPair2Buf): Seq[Long] =
    Seq((r.d1, r.i1), (r.d2, r.i2))
      .filter(p => p._1 != noneD || p._2 != noneI)
      .map(_._2)

  override def bufferEncoder: Encoder[MinPair2Buf] = ExpressionEncoder[MinPair2Buf]()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  /** Column form: top-2 ids by ascending (d2, id). */
  def top2(d2: Column, id: Column): Column =
    org.apache.spark.sql.functions
      .udaf(this, ExpressionEncoder[(Double, Long)]()).apply(d2, id)
}
