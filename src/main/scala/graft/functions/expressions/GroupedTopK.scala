package graft.functions.expressions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Element of a [[GroupedTopK]] result: an id with its ranking score. */
final case class Scored(score: Double, id: Long)

/** Exact top-k per group as a typed `Aggregator` (Spark wraps it in a
  * `ScalaAggregator`, a `TypedImperativeAggregate`: the buffer lives as
  * a JVM object inside ObjectHashAggregate and is only serialized at the
  * partial/final boundary).
  *
  * Ordering is (score DESC, id ASC) — row_number semantics, fully
  * deterministic under ties.
  *
  * Scale shape: the buffer is the group's current top-k kept sorted, so
  * a row costs one O(log k)-ish bounded insertion and a group of ANY
  * size contributes at most k elements to the shuffle after map-side
  * partial aggregation. The window-rank formulation of the same query
  * shuffles and sorts EVERY row of every group — on a 100 TB fact the
  * difference is the whole job.
  */
final class GroupedTopK(k: Int)
    extends Aggregator[Scored, Vector[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Vector[Scored] = Vector.empty

  override def reduce(buf: Vector[Scored], in: Scored): Vector[Scored] =
    if (buf.length >= k && better(buf.last, in)) buf
    else {
      val i = buf.indexWhere(better(in, _))
      val inserted =
        if (i < 0) buf :+ in
        else (buf.take(i) :+ in) ++ buf.drop(i)
      if (inserted.length > k) inserted.take(k) else inserted
    }

  override def merge(a: Vector[Scored], b: Vector[Scored]): Vector[Scored] = {
    // Both sides sorted by (score desc, id asc): standard merge, cut at k.
    val out = Vector.newBuilder[Scored]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && better(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Vector[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Vector[Scored]] =
    ExpressionEncoder[Vector[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}

object GroupedTopK {
  /** Column function: `topK(3)(scoreCol, idCol)` → array<struct<score,id>>
    * sorted by (score desc, id asc). */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new GroupedTopK(k), Encoders.product[Scored])
}
