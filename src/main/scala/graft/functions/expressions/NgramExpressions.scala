package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram hash-set expressions — the per-row workhorse of the
  * dedup/decontamination family (d02/d03/d05/p02/t14).
  *
  * The HOF formulation (`transform(sequence(...), i -> aggregate(slice(
  * th, i, n), seed, rotate-xor))` + `array_distinct` + `array_sort`)
  * allocates a slice per gram and pays interpreted-lambda dispatch per
  * element: ~1M NamedLambdaVariable evaluations for a 5k-doc corpus,
  * measured as the dominant cost of t14 (≈3s of a 4.2s query at sf0.1).
  * These expressions do the same work in one primitive loop per row —
  * the identical built-in→native upgrade `minhash_signature` /
  * `top_repeat_counts` already took. The HOF formulations remain in
  * specs as cross-checks (bit-identical outputs).
  *
  * Both return SORTED DISTINCT hashes, so results feed
  * `sorted_intersect_size` (O(n+m) merge) with no extra sort.
  */
object NgramHashes {
  /** Rotate-xor combiner seed — part of the engine spec (matches the
    * documented HOF formulation in DedupOps.shingled). */
  val Seed: Long = 1125899906842597L

  @inline def rotl13(acc: Long): Long = (acc << 13) | (acc >>> 51)

  /** Sort + dedupe in place; returns the compacted prefix length. */
  def sortDistinct(a: Array[Long], n: Int): Int = {
    java.util.Arrays.sort(a, 0, n)
    var w = 0
    var i = 0
    while (i < n) {
      if (w == 0 || a(w - 1) != a(i)) { a(w) = a(i); w += 1 }
      i += 1
    }
    w
  }

  def result(a: Array[Long], n: Int): GenericArrayData = {
    val out = new Array[Long](n)
    System.arraycopy(a, 0, out, 0, n)
    new GenericArrayData(out)
  }

  @inline def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D) // space, \t \n \x0B \f \r
}

/** word_ngram_md5_hashes(text, n) → sorted distinct md5-prefix hashes
  * of whitespace-token n-grams — [[WordNgramHashes]] with the hash
  * family swapped from the Spark-private xxhash64/rotate-xor fold to an
  * ENGINE-PORTABLE one: gram = the n tokens joined by a single space,
  * hash = first 8 bytes of md5(gram) big-endian (the [[Md5Prefix64]]
  * family). Any engine reproduces it as
  * `md5(array_to_string(tokens[i:i+n-1], ' '))` — which is what lets
  * d02's full MinHash-LSH pipeline carry a DuckDB oracle. Fewer than n
  * tokens → ONE gram over all tokens; zero tokens → md5("") (both
  * mirroring the clamped-slice semantics of the xxhash64 variant).
  * ~10× the per-gram cost of [[WordNgramHashes]] — the documented
  * portability price (t04/s02/d04 discipline). */
case class WordNgramMd5Hashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"word_ngram_md5_hashes needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_ngram_md5_hashes requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val nBytes = bytes.length
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var nTok = 0
    var i = 0
    while (i < nBytes) {
      while (i < nBytes && NgramHashes.isWs(bytes(i))) i += 1
      if (i < nBytes) {
        val st = i
        while (i < nBytes && !NgramHashes.isWs(bytes(i))) i += 1
        if (nTok == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(nTok) = st; ends(nTok) = i; nTok += 1
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val nGrams = math.max(nTok - n + 1, 1)
    val gs = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      md.reset()
      var t = g
      val until = math.min(g + n, nTok)
      while (t < until) {
        if (t > g) md.update(0x20.toByte)
        md.update(bytes, starts(t), ends(t) - starts(t))
        t += 1
      }
      val d = md.digest()
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      gs(g) = h
      g += 1
    }
    NgramHashes.result(gs, NgramHashes.sortDistinct(gs, nGrams))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_ngram_md5_hashes"
}

/** word_ngram_hashes(text, n) → sorted distinct rotate-xor hashes of
  * whitespace-token n-grams. Token hash = xxhash64(token) (seed 42,
  * byte-identical to Spark's built-in over the same token); gram hash
  * folds the n token hashes with rotate-xor from [[NgramHashes.Seed]] —
  * exactly the HOF in DedupOps.shingled / shingleJaccardEdges. Fewer
  * than n tokens → ONE gram over all tokens (the HOF's clamped-slice
  * behavior). Tokens are maximal runs of non-ASCII-whitespace bytes
  * (`\S+` semantics; UTF-8 continuation bytes are never ≤ 0x20, so the
  * byte scan is multi-byte-safe). */
case class WordNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"word_ngram_hashes needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_ngram_hashes requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D) // space, \t \n \x0B \f \r

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val nBytes = s.numBytes()
    // token hashes (xxhash64 of each token's bytes, Spark's default seed)
    var cap = 16
    var th = new Array[Long](cap)
    var nTok = 0
    var i = 0
    while (i < nBytes) {
      while (i < nBytes && isWs(s.getByte(i))) i += 1
      if (i < nBytes) {
        val start = i
        while (i < nBytes && !isWs(s.getByte(i))) i += 1
        if (nTok == cap) { cap *= 2; th = java.util.Arrays.copyOf(th, cap) }
        th(nTok) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, offset + start, i - start, 42L)
        nTok += 1
      }
    }
    val nGrams = math.max(nTok - n + 1, 1)
    val gs = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      var acc = NgramHashes.Seed
      var t = g
      val until = math.min(g + n, nTok)
      while (t < until) { acc = NgramHashes.rotl13(acc) ^ th(t); t += 1 }
      gs(g) = acc
      g += 1
    }
    // zero tokens: the HOF aggregates an empty slice → bare seed; keep it
    NgramHashes.result(gs, NgramHashes.sortDistinct(gs, nGrams))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_ngram_hashes"
}

/** char_ngram_hashes(text, n) → sorted distinct xxhash64 values of the
  * character n-grams (char-boundary-aligned byte windows — identical to
  * `xxhash64(substring(text, i, n))`). Shorter than n chars → ONE gram
  * over the whole text. Same gram domain as [[WinnowSketch]] (which
  * keeps only the bottom-k); this keeps the full distinct set for exact
  * Jaccard verification (d03). */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"char_ngram_hashes needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_ngram_hashes requires string, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val nBytes = s.numBytes()
    val starts = new Array[Int](s.numChars() + 1)
    var i = 0; var c = 0
    while (i < nBytes) {
      starts(c) = i; c += 1
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
    }
    starts(c) = nBytes
    val nChars = c
    val nGrams = math.max(nChars - n + 1, 1)
    val gs = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      val from = starts(g)
      val until = starts(math.min(g + n, nChars))
      gs(g) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, offset + from, until - from, 42L)
      g += 1
    }
    NgramHashes.result(gs, NgramHashes.sortDistinct(gs, nGrams))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_ngram_hashes"
}
