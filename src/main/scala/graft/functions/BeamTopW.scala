package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Top-w (d2, id) pairs by ascending (d2, id), DEDUPLICATED by id —
  * the one-shuffle beam cut (r18). The beam serve's round state is
  * "the w best distinct candidates seen so far"; expressed as
  * groupBy(q,c).min + window it costs TWO exchanges per round, and
  * the wide 16×5 dial pays five rounds of that on query-sized frames
  * (stage-scheduling-bound at local[32], a cluster barrier each at
  * scale). This aggregator folds dedup + cut into ONE map-side-
  * combinable pass: state is the ≤ w lexicographically smallest
  * pairs with UNIQUE ids.
  *
  * Exactness of the capped, dedup-on-insert state rests on the
  * caller's contract: a duplicate id ALWAYS carries the identical d2
  * (d2 is a pure function of the (query, candidate) vectors, and
  * every producer — entry scoring, round scoring, the carried beam —
  * computes the same integer-exact squared L2). Under that contract,
  * skipping a duplicate — whether it loses to the current worst or
  * matches an in-state id — never discards information, and
  * `(a ++ b).distinct` in merge collapses duplicates as whole pairs.
  * Same INTEGER-VALUED d2 < 2⁵³ input contract as [[MinPairW]]
  * (micro-unit squared-L2 sums, exact in the Double cast); ties
  * break strictly lexicographically by (d2, id), bit-identical to
  * the oracle's `row_number() OVER (ORDER BY d2, c_id) <= w`.
  */
final case class BeamTopW(w: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(w >= 1, s"beam width must be >= 1, got $w")

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Seq.empty

  /** Full-buffer no-better candidates cost one comparison; an equal
    * id already in state is skipped (its d2 is identical by the
    * input contract).
    */
  override def reduce(b: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    if (b.length == w && !lt(v, b.last)) b
    else if (b.exists(_._2 == v._2)) b
    else ((b :+ v).sortWith(lt)).take(w)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).distinct.sortWith(lt).take(w)

  /** Best-first (d2, id) pairs. */
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object BeamTopW {
  /** Column form: top-`w` distinct-id (d2, id) pairs, best first —
    * an `array<struct<_1: double, _2: bigint>>`.
    */
  def topPairs(w: Int)(d2: Column, id: Column): Column =
    org.apache.spark.sql.functions
      .udaf(BeamTopW(w), ExpressionEncoder[(Double, Long)]()).apply(d2, id)
}
