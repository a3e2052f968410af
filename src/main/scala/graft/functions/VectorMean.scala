package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise mean of `array<float>` columns — the custom
  * `Aggregator[IN, BUF, OUT]` case SURVEY §4.2 reserves for when
  * built-ins can't express the computation efficiently: the DataFrame
  * alternative is `posexplode` (64× row blowup) → groupBy(dim) →
  * re-assembly, three shuffles of element rows. This buffer is one
  * fixed-size double array per group per partition, merged pairwise —
  * a single map-side-combinable aggregate.
  *
  * Accumulation is (sum per partition, then merge) — the usual
  * aggregate summation order; consumers comparing against a serial
  * oracle should round coarsely enough to absorb last-ulp differences
  * (the query key floors at 1e-4).
  */
final case class VecMeanBuf(sums: Array[Double], n: Long)

object VectorMean extends Aggregator[Seq[Float], VecMeanBuf, Seq[Double]] {

  type Buf = VecMeanBuf
  private def Buf(s: Array[Double], n: Long): Buf = VecMeanBuf(s, n)

  override def zero: Buf = Buf(Array.empty[Double], 0L)

  /** Ragged input is a data bug, not a truncation opportunity: a
    * silently clipped sum would produce a skewed "mean" with no error.
    */
  private def requireDim(expected: Int, got: Int): Unit =
    if (expected != got) throw new IllegalArgumentException(
      s"VectorMean: inconsistent vector dimension ($got vs $expected)")

  override def reduce(b: Buf, v: Seq[Float]): Buf = {
    // gate on n, not sums.isEmpty: a zero-length FIRST vector leaves
    // sums empty with n=1, and the next row must still be compared
    // against dimension 0, not silently re-size the buffer
    val s = if (b.n == 0) new Array[Double](v.length) else b.sums
    if (b.n > 0) requireDim(s.length, v.length)
    var i = 0
    while (i < s.length) { s(i) += v(i); i += 1 }
    Buf(s, b.n + 1)
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      requireDim(a.sums.length, b.sums.length)
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      Buf(a.sums, a.n + b.n)
    }
  }

  override def finish(r: Buf): Seq[Double] =
    if (r.n == 0) Seq.empty else r.sums.toSeq.map(_ / r.n)

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()

  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  /** Column form for untyped DataFrames. */
  def centroid(c: Column): Column =
    org.apache.spark.sql.functions.udaf(this, ExpressionEncoder[Seq[Float]]()).apply(c)
}
