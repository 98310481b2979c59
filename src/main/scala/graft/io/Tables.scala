package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table catalog over a driver test-data directory
  * (`/root/testdata/sf*` — see TESTDATA.md).
  *
  * All reads are plain `spark.read.parquet`: Catalyst pushes filters and
  * prunes columns into the scan (verify via `PushedFilters` / `ReadSchema`
  * in `.explain("formatted")`). At warehouse scale the same tables would be
  * partitioned (e.g. orders/lineitem by month of date key) so partition
  * pruning composes with these pushdowns; nothing in the query layer
  * assumes a physical layout.
  */
final case class Tables(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    events: DataFrame,
    documents: DataFrame,
    embeddings: DataFrame
)

object Tables {

  /** Memoized per (session, dir): schema inference costs one parquet
    * footer read per table; the returned DataFrames are lazy logical
    * plans, safely shared across catalog queries. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Tables]()

  def apply(spark: SparkSession, dir: String): Tables =
    cache.computeIfAbsent((spark, dir), { case (s, d) => load(s, d) })

  private def load(spark: SparkSession, dir: String): Tables = {
    def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    Tables(
      lineitem = t("lineitem"),
      orders = t("orders"),
      customer = t("customer"),
      part = t("part"),
      supplier = t("supplier"),
      nation = t("nation"),
      region = t("region"),
      events = normalizeEventTs(t("events")),
      documents = t("documents"),
      embeddings = t("embeddings")
    )
  }

  /** events.ts normalization to session-TZ TIMESTAMP, the engine-wide
    * timestamp convention (session TZ is pinned UTC in GraftSession, so
    * instants and the DuckDB oracle's naive micros coincide):
    *  - parquet TIMESTAMP(NANOS) (+ `spark.sql.legacy.parquet.nanosAsLong`)
    *    arrives as long nanoseconds → convert with integer division
    *    (exact — a double division would lose precision above 2^53 ns);
    *  - parquet TIMESTAMP(MICROS) with isAdjustedToUTC=false arrives as
    *    TIMESTAMP_NTZ under Spark's NTZ inference → cast to TIMESTAMP
    *    (exact under the UTC session TZ: same micros, instant-typed). */
  private[graft] def normalizeEventTs(events: DataFrame): DataFrame =
    events.schema("ts").dataType match {
      case LongType =>
        events.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        events.withColumn("ts", col("ts").cast(TimestampType))
      case _ => events
    }
}
