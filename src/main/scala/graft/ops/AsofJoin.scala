package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join — an operator Spark SQL lacks natively. For each left
  * row, attach the payload of the latest right row with the same equality
  * key and `right.timeKey <= left.timeKey`.
  *
  * Built by COMPOSITION (preference (a) of SURVEY.md §7.3, before custom
  * plans): tag both sides, union, and run one `last(_, ignoreNulls)`
  * window per payload column ordered by (time, side) within the equality
  * key — the right row sorts before a left row at the same instant, so
  * ties get `<=` semantics, matching DuckDB's `ASOF JOIN ... ON l.t >= r.t`.
  *
  * Scale shape: exactly one shuffle (hash by `eqKey`) + one
  * per-partition sort — the same cost as a dedicated sort-merge as-of
  * implementation, with AQE skew handling for hot keys for free. No
  * broadcast of either side is needed, so both sides may be arbitrarily
  * large.
  */
object AsofJoin {

  /** @param payload right-side columns to carry (must not collide with
    *                left column names). */
  def leftAsof(
      left: DataFrame,
      right: DataFrame,
      eqKey: String,
      timeKey: String,
      payload: Seq[String]): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(eqKey))
      .orderBy(col(timeKey).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE last(ignoreNulls) over a struct of all payload columns, gated on
    // _side: filling each column independently could stitch values from
    // DIFFERENT right rows when a right row legitimately carries a NULL
    // payload value (diverging from ASOF semantics). The struct is non-null
    // exactly for right rows, so the whole payload comes from the single
    // latest matched right row — NULLs inside it are preserved as-is.
    val filled = unioned.withColumn("_asof_payload",
      last(when(col("_side") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
    filled.filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        payload.map(c => col(s"_asof_payload.$c").as(c)): _*)
  }
}
