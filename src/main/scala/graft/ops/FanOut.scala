package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Re-balance a SMALL input to full session parallelism before a
  * high-fan-out or per-row-expensive stage (k-gram explode, deletion-key
  * explode, media encode/decode).
  *
  * Scan parallelism is decided from INPUT bytes (file splits,
  * `maxPartitionBytes`) — right for scans, wrong for operators whose
  * work is hundreds of times their input: a single-row-group parquet
  * file hands the entire explode/codec stage ONE task no matter how
  * many cores exist, because the planner never sees the post-fan-out
  * volume. One narrow round-robin shuffle of the small side buys full
  * parallelism for the expensive stage; the shuffle cost is bounded by
  * the SMALL pre-fan-out payload. At 100 TB inputs arrive in many
  * splits and this repartition degenerates to a cheap rebalance — it
  * never hurts, and on skewed split counts it still fixes stragglers.
  * Measured at sf0.1 on local[32]: d08 14.6s → 2.5s, d09 8.1s → 1.0s,
  * m03 4.8s → 0.7s.
  */
object FanOut {
  private def width(df: Dataset[_]): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

  def apply(df: DataFrame): DataFrame = df.repartition(width(df))

  def ds[T](d: Dataset[T]): Dataset[T] = d.repartition(width(d))
}
