package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key assignment policies (W4 — ref etl.ipynb:51–52, 78–94
  * assigns ids 1..n by sorted natural key).
  *
  * SURVEY.md §7.4: the parity policy reproduces the reference exactly but
  * funnels the dimension through one partition — correct and cheap for
  * dims (4…3,194 rows; any real dimension under ~10M), wrong for a
  * billion-row dimension. The scale policies trade contiguity for full
  * parallelism.
  */
object SurrogateKeys {

  /** Parity policy: dense 1..n ids in natural-key sort order.
    * `row_number` over an unpartitioned window — single-partition sort,
    * acceptable only because dimensions are small by design. */
  def sortedRowNumber(key: Column): Column =
    row_number().over(Window.orderBy(key)).cast("int")

  /** Scale policy A: stable content-hash ids. Fully parallel, no sort,
    * ids are stable under re-runs and appends (a new dim row never
    * changes existing ids). Not dense; collision probability ~n²/2⁶⁴
    * (negligible below billions of keys). */
  def hashKey(key: Column): Column = xxhash64(key)

  /** Scale policy B: dense ids without a global sort —
    * sort-within-partitions by key after a range repartition, then offset
    * each partition by the cumulative count of earlier partitions
    * (two distributed passes + one tiny driver-side prefix sum). */
  def denseIds(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df.repartitionByRange(col(keyCol)).sortWithinPartitions(keyCol)
    val counts = parted.rdd.mapPartitionsWithIndex {
      case (i, it) => Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _)
    val offsetMap = counts.map(_._1).zip(offsets).toMap
    val schema = df.schema
    val rows = parted.rdd.mapPartitionsWithIndex { case (i, it) =>
      var n = offsetMap(i)
      it.map { r => n += 1; org.apache.spark.sql.Row.fromSeq(r.toSeq :+ n) }
    }
    spark.createDataFrame(rows,
      schema.add(idCol, org.apache.spark.sql.types.LongType))
  }
}
