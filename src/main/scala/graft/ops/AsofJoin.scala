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
    val filled = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .select(left.columns.map(col) ++ payload.map(col): _*)
  }
}
