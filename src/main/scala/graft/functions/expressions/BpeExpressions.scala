package graft.functions.expressions

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level byte-pair encoding (GPT-2-style; Sennrich et al. 2016,
  * Radford et al. 2019 — public literature) shared by the `bpe_encode` /
  * `bpe_decode` expressions and [[graft.text.Bpe]]'s trainer.
  *
  * The token alphabet starts as the 256 raw byte values; each learned
  * merge (a, b) → new id appends one entry, so id `256 + r` IS the
  * merge of rank `r` — the merge list is the whole model, shipped into
  * the expressions as one `array<long>` literal (one packed pair per
  * merge, ~KB even for a 50k-merge production vocabulary; it rides the
  * serialized plan to every task, the broadcast-variable pattern
  * without the ceremony).
  *
  * Pre-tokenization is LOSSLESS: the text splits into alnum runs,
  * whitespace runs, and single other chars — every char lands in
  * exactly one pre-token, so decode(encode(text)) == text byte-for-byte
  * (GPT-2 reaches the same property by folding the leading space into
  * the word; separate whitespace tokens keep the regex portable).
  * Merges never cross pre-token boundaries (the Sennrich word-boundary
  * rule).
  */
object BpeCodec {
  /** Lossless pre-tokenizer: alnum run | whitespace run | one other char. */
  val PreToken: Pattern = Pattern.compile("[A-Za-z0-9]+|\\s+|[^A-Za-z0-9\\s]")

  /** One merge packed into a long: left id << 21 | right id (ids stay
    * far below 2^21 for any realistic merge count). */
  @inline def pack(a: Int, b: Int): Long = (a.toLong << 21) | b.toLong
  @inline def left(p: Long): Int = (p >>> 21).toInt
  @inline def right(p: Long): Int = (p & 0x1fffff).toInt
}

/** Runtime form of a trained merge list: rank lookup for encoding, the
  * id → bytes vocabulary for decoding. Built once per expression
  * instance (lazily, from the foldable merges child), reused across all
  * rows of the task. */
final class BpeCodec(merges: Array[Long]) extends Serializable {

  private val ranks = {
    val m = new java.util.HashMap[java.lang.Long, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) { m.put(merges(i), 256 + i); i += 1 }
    m
  }

  /** vocab(id) = the byte string the id decodes to. */
  val vocab: Array[Array[Byte]] = {
    val v = new Array[Array[Byte]](256 + merges.length)
    var i = 0
    while (i < 256) { v(i) = Array(i.toByte); i += 1 }
    var r = 0
    while (r < merges.length) {
      val (l, rt) = (BpeCodec.left(merges(r)), BpeCodec.right(merges(r)))
      // a merge may only pair ids that exist before it (bytes or earlier
      // merges) — fail with the malformed value, not a bare index error
      // deep in the array build (merge lists can arrive from SQL text)
      require(l < 256 + r && rt < 256 + r,
        s"malformed BPE merge at rank $r: packed ${merges(r)} pairs id " +
          s"${math.max(l, rt)}, but only ${256 + r} ids exist yet")
      v(256 + r) = v(l) ++ v(rt)
      r += 1
    }
    v
  }

  /** Greedy merge application over one pre-token's bytes: repeatedly
    * merge every occurrence of the adjacent pair with the LOWEST merge
    * rank until no remaining pair was ever learned. (Equivalent to
    * replaying merges in learned order: later merges only create NEW
    * ids, so they can never create a fresh instance of an earlier
    * pair — the spec exploits that equivalence as its independent
    * recompute.) */
  private def encodeWord(bytes: Array[Byte], from: Int, until: Int,
      out: scala.collection.mutable.ArrayBuilder.ofInt): Unit = {
    var n = until - from
    val ids = new Array[Int](n)
    var i = 0
    while (i < n) { ids(i) = bytes(from + i) & 0xff; i += 1 }
    var done = n < 2
    while (!done) {
      var bestId = Int.MaxValue
      var j = 0
      while (j < n - 1) {
        val m = ranks.get(BpeCodec.pack(ids(j), ids(j + 1)))
        if (m != null && m.intValue() < bestId) bestId = m.intValue()
        j += 1
      }
      if (bestId == Int.MaxValue) done = true
      else {
        val p = merges(bestId - 256)
        val a = BpeCodec.left(p); val b = BpeCodec.right(p)
        var w = 0; var r = 0
        while (r < n) {
          if (r < n - 1 && ids(r) == a && ids(r + 1) == b) { ids(w) = bestId; r += 2 }
          else { ids(w) = ids(r); r += 1 }
          w += 1
        }
        n = w
        done = n < 2
      }
    }
    i = 0
    while (i < n) { out += ids(i); i += 1 }
  }

  def encode(text: String): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    out.sizeHint(text.length / 2)
    val m = BpeCodec.PreToken.matcher(text)
    while (m.find()) {
      val wb = text.substring(m.start, m.end).getBytes(StandardCharsets.UTF_8)
      encodeWord(wb, 0, wb.length, out)
    }
    out.result()
  }

  /** Byte-concat of the ids' vocab entries, decoded as UTF-8. Invalid
    * sequences (an id-range slice can cut a multi-byte char between two
    * byte-level ids) decode to U+FFFD per `java.lang.String` — never an
    * error, and lossless whenever the slice covers whole chars. */
  def decode(ids: Array[Int]): String = {
    val bb = new java.io.ByteArrayOutputStream(ids.length * 2)
    var i = 0
    while (i < ids.length) { bb.write(vocab(ids(i))); i += 1 }
    new String(bb.toByteArray, StandardCharsets.UTF_8)
  }
}

private[expressions] trait BpeExpression extends BinaryExpression with CodegenFallback {
  /** The merges child must be a foldable array<long> — evaluated once
    * per expression instance, not per row. */
  protected def checkMerges(pos: String): TypeCheckResult =
    right.dataType match {
      case ArrayType(LongType, _) if right.foldable => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable array<bigint> merge list as $pos, " +
          s"got ${other.catalogString}")
    }

  @transient protected lazy val codec =
    new BpeCodec(right.eval().asInstanceOf[ArrayData].toLongArray())
}

/** bpe_encode(text, merges) → array<int> of byte-level BPE token ids. */
case class BpeEncodeIds(left: Expression, right: Expression) extends BpeExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case StringType => checkMerges("argument 2")
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(text: Any, mergesIgnored: Any): Any =
    new GenericArrayData(codec.encode(text.asInstanceOf[UTF8String].toString))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bpe_encode"
}

/** bpe_decode(ids, merges) → string: the ids' byte strings concatenated
  * and decoded as UTF-8 (see [[BpeCodec.decode]] for the slice-boundary
  * semantics). */
case class BpeDecode(left: Expression, right: Expression) extends BpeExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case ArrayType(IntegerType, _) => checkMerges("argument 2")
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_decode requires array<int>, got ${other.catalogString}")
    }
  override def dataType: DataType = StringType

  override def nullSafeEval(ids: Any, mergesIgnored: Any): Any =
    UTF8String.fromString(codec.decode(ids.asInstanceOf[ArrayData].toIntArray()))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bpe_decode"
}
