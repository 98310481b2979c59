package graft.functions.expressions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Mergeable k-minimum-values sketch as a typed `Aggregator`: the
  * buffer is the group's current k smallest DISTINCT hash values,
  * sorted ascending — the register-merge primitive of HyperBall-style
  * iterative sketch propagation (g09), where each round merges every
  * neighbor's whole sketch into the node's own.
  *
  * Input rows are sketches (sorted-ascending distinct arrays; a
  * singleton seed is the degenerate case), so `reduce` and `merge` are
  * the SAME sorted dedup-merge, cut at k. Like [[GroupedTopK]], the
  * map-side partial collapses any in-degree to ONE k-array per
  * (group, partition) before the shuffle — the counter-merge shape
  * that makes neighborhood sketching linear in |E| per round. Unlike
  * the row-explode formulation (distinct + bottom-k = two exchanges of
  * |E|·k rows), this aggregates arrays directly: one exchange of at
  * most |V|·k values per round.
  *
  * Portability: the sketch CONTENT is plain sorted hashes, so any
  * engine replays it with `row_number() OVER (ORDER BY h) <= k` over
  * the unioned members — the g09 oracle does exactly that. */
final class KmvMerge(k: Int)
    extends Aggregator[Seq[Long], Vector[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Vector[Long] = Vector.empty

  private def mergeSorted(a: Seq[Long], b: Seq[Long]): Vector[Long] = {
    val out = Vector.newBuilder[Long]
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue; var any = false
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) { val x = a(i); i += 1; x }
              else { val x = b(j); j += 1; x }
      if (!any || v != last) { out += v; last = v; any = true; n += 1 }
    }
    out.result()
  }

  override def reduce(buf: Vector[Long], in: Seq[Long]): Vector[Long] =
    mergeSorted(buf, in)

  override def merge(a: Vector[Long], b: Vector[Long]): Vector[Long] =
    mergeSorted(a, b)

  override def finish(buf: Vector[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Vector[Long]] =
    ExpressionEncoder[Vector[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object KmvMerge {
  /** Column function: `merge(32)(sketchCol)` → array<bigint>, the k
    * smallest distinct values across all input sketches, ascending. */
  def merge(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvMerge(k),
      ExpressionEncoder[Seq[Long]]())
}
