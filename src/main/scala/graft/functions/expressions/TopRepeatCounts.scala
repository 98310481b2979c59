package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object TopRepeatCounts {
  private val Space = UTF8String.fromString(" ")

  /** One pass over the token array: hash-map occurrence counts for tokens
    * and (adjacent-pair) bigrams, returning the two maxima. O(n) time and
    * O(distinct) space per row — replaces the
    * `aggregate(array_distinct(t), …, filter(t, _ === w))` HOF, whose
    * O(|distinct|·|tokens|) comparisons per row make a single 100k-token
    * web document ~2×10⁹ operations (the straggler-task hazard VERDICT r3
    * flagged for exactly the corpus Gopher gating targets).
    *
    * Called from generated code (see [[TopRepeatCountsExpr.doGenCode]]):
    * the loop body is compiled Scala invoked as one static call per row,
    * keeping the projection inside whole-stage codegen. */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val tokCounts = new java.util.HashMap[UTF8String, Array[Int]](math.max(16, n * 2))
    var topTok = 0L
    var i = 0
    while (i < n) {
      val c = tokCounts.computeIfAbsent(arr.getUTF8String(i), _ => new Array[Int](1))
      c(0) += 1
      if (c(0) > topTok) topTok = c(0)
      i += 1
    }
    var topBg = 0L
    if (n >= 2) {
      val bgCounts = new java.util.HashMap[UTF8String, Array[Int]](math.max(16, n * 2))
      i = 0
      while (i + 1 < n) {
        val bg = UTF8String.concat(arr.getUTF8String(i), Space, arr.getUTF8String(i + 1))
        val c = bgCounts.computeIfAbsent(bg, _ => new Array[Int](1))
        c(0) += 1
        if (c(0) > topBg) topBg = c(0)
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](topTok, topBg))
  }
}

/** top_repeat_counts(array<string>) →
  * struct<top_token_cnt: bigint, top_bigram_cnt: bigint>: the maximum
  * occurrence count of any single token and of any adjacent token bigram —
  * the Gopher repetition-gate numerators (catalog query t08).
  *
  * Empty input yields (0, 0); a single-token input yields (1, 0) — the
  * same coalesce-to-0 semantics as the DuckDB oracle's
  * `coalesce(list_max(...), 0)` over empty distinct lists. */
case class TopRepeatCountsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_repeat_counts requires array<string>, got ${other.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("top_token_cnt", LongType, nullable = false),
    StructField("top_bigram_cnt", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    TopRepeatCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.expressions.TopRepeatCounts.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "top_repeat_counts"
}
