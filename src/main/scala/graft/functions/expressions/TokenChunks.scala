package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_chunks(text, chunk_tok, stride)` — a native Catalyst
  * `Generator` (UDTF): one row fans out to its fixed-token-window
  * chunks with overlap, the context-window prep step of every LLM
  * training pipeline (t05). Completes the engine's Catalyst extension
  * matrix: Expression, Aggregator, TypedImperativeAggregate, optimizer
  * Rule, PlannerStrategy, SparkPlan all have entries — this is the
  * Generator class.
  *
  * Semantics are BIT-IDENTICAL to the t05 HOF formulation
  * (`posexplode(transform(sequence(0, nc-1), i → array_join(
  * slice(toks, i·stride+1, chunkTok), " ")))` over
  * `regexp_extract_all(text, '\S+')`), asserted by a cross-check spec:
  *   - tokens are maximal `\S+` runs (ASCII whitespace separators —
  *     Java regex `\s` = space + 0x09–0x0D; multi-byte UTF-8 chars
  *     never contain ASCII bytes, so a byte scan is exact);
  *   - chunk i covers tokens [i·stride, i·stride+chunkTok), joined by
  *     ONE space (the HOF's array_join — original inter-token
  *     whitespace is normalized);
  *   - nc = 1 if n ≤ chunkTok else ceil((n-chunkTok)/stride)+1; a
  *     token-less document still emits one empty chunk (slice of an
  *     empty array → "");
  *   - NULL text emits no rows (the HOF's posexplode(null)).
  *
  * Why native: the HOF chain allocates the full token ARRAY per row
  * (one UTF8String per token), then a lambda-dispatched slice + join
  * per chunk — ~n interpreted NamedLambdaVariable evaluations and 2×
  * the chunk bytes in transient arrays. This generator does ONE byte
  * scan over the text recording token offsets into two primitive int
  * arrays, then emits each chunk as a single byte-copy from the
  * original string — no token objects, no lambda dispatch, and the
  * chunk iterator is LAZY so a pathological document streams its
  * chunks instead of materializing them (GenerateExec consumes the
  * iterator row by row). Same built-in→native upgrade the
  * word_ngram_hashes family took (≥3× measured there).
  *
  * Scale shape: per-row compute only — no shuffle, no state; the
  * operator scales with input splits exactly like the HOF t05.
  */
case class TokenChunks(child: Expression, chunkTok: Int, stride: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(chunkTok > 0 && stride > 0, "chunk_tok and stride must be positive")

  override def elementSchema: StructType = StructType(
    StructField("chunk_idx", LongType, nullable = false) ::
    StructField("chunk_text", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_chunks requires a string column, got ${child.dataType}")

  override protected def withNewChildInternal(newChild: Expression): TokenChunks =
    copy(child = newChild)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val bytes = t.asInstanceOf[UTF8String].getBytes
    // pass 1: token offsets (start, end) as primitive arrays
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var n = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      while (i < len && NgramHashes.isWs(bytes(i))) i += 1
      if (i < len) {
        val s = i
        while (i < len && !NgramHashes.isWs(bytes(i))) i += 1
        if (n == starts.length) {
          starts = java.util.Arrays.copyOf(starts, n * 2)
          ends = java.util.Arrays.copyOf(ends, n * 2)
        }
        starts(n) = s; ends(n) = i; n += 1
      }
    }
    val nTok = n
    val nc =
      if (nTok <= chunkTok) 1
      else (nTok - chunkTok + stride - 1) / stride + 1
    val ss = starts
    val ee = ends
    // lazy chunk iterator: one byte-copy per chunk, no token objects
    new Iterator[InternalRow] {
      private var c = 0
      override def hasNext: Boolean = c < nc
      override def next(): InternalRow = {
        val from = c * stride
        val until = math.min(from + chunkTok, nTok)
        var total = 0
        var j = from
        while (j < until) { total += ee(j) - ss(j); j += 1 }
        if (until > from) total += until - from - 1 // single-space joins
        val out = new Array[Byte](total)
        var w = 0
        j = from
        while (j < until) {
          if (j > from) { out(w) = ' '; w += 1 }
          val tl = ee(j) - ss(j)
          System.arraycopy(bytes, ss(j), out, w, tl)
          w += tl
          j += 1
        }
        val row = new GenericInternalRow(2)
        row.setLong(0, c.toLong)
        row.update(1, UTF8String.fromBytes(out))
        c += 1
        row
      }
    }
  }

  override def prettyName: String = "token_chunks"
}
