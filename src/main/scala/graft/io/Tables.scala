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
  *
  * Small-input compaction repair: the driver's test parquet arrives as ONE
  * row group per table, and a parquet row group is indivisibly one scan
  * task — `maxPartitionBytes` splitting yields empty tasks, so every stage
  * FUSED into the scan (regex scoring, n-gram explode, codecs) runs on one
  * core regardless of cluster width. The production fix for this input
  * shape is compaction, so [[load]] rewrites tables below
  * [[CompactMaxBytes]] into a session-local multi-row-group copy ONCE per
  * (session, dir) and serves the compacted scan. Query plans stay
  * scan-rooted (pushdown/pruning intact, no per-query exchange), and at
  * warehouse scale the guard disables itself: real inputs exceed the
  * threshold and already arrive in many splits.
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

  /** Tables above this size are served as-is: they already arrive in
    * enough splits/row groups for parallel scans, and rewriting them
    * would not be a bounded one-time cost. */
  private val CompactMaxBytes = 256L * 1024 * 1024

  /** Below this size the table is broadcast-dim territory (region,
    * nation); a one-task scan is already the right plan. */
  private val CompactMinBytes = 16L * 1024

  /** Source path → compacted copy path ("" = serve the raw file),
    * memoized per JVM rather than per session: the compacted files are
    * session-INDEPENDENT (same rows, same JVM-core-derived width), and
    * several catalog queries isolate conf changes in
    * `spark.newSession()` — a session-keyed memo made each of those
    * rewrite all ten tables on every invocation (q40 measured
    * 1.1 s → 6.2 s; every streaming query paid ~1.5 s of the same tax).
    *
    * ASSUMPTION (by design): source parquet under a served path is
    * immutable for the JVM's lifetime — the memo is keyed on path alone,
    * so an in-place rewrite of an input file would be served from the
    * stale compacted copy. The engine's inputs are the driver-generated
    * read-only testdata dirs, which satisfy this; a deployment serving
    * mutable paths should key on (path, mtime) instead.
    *
    * The map holds lazy cells, not values: `computeIfAbsent` only
    * constructs the (cheap) cell inside the CHM bin lock, and the
    * Spark rewrite job runs under the cell's own lazy-init lock — so
    * concurrent FIRST readers of one path serialize on that path only,
    * never on the map bin (which could block unrelated tables that
    * happen to share a bin). */
  private final class CompactCell(compute: () => String) {
    lazy val resolved: String = compute()
  }
  private val compactPath =
    new java.util.concurrent.ConcurrentHashMap[String, CompactCell]()

  private def load(spark: SparkSession, dir: String): Tables = {
    def t(name: String) = compacted(spark, s"$dir/$name.parquet")
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

  /** Serve `path`, compacting single-row-group small inputs into a
    * session-local balanced copy first (see class doc). The rewrite is a
    * round-robin repartition to session width — deterministic
    * (sort-before-repartition) and bounded by the small input size — and
    * happens once per (session, dir) via the [[cache]] memo.
    */
  private[graft] def compacted(spark: SparkSession, path: String): DataFrame = {
    val cell = compactPath.computeIfAbsent(path,
      p => new CompactCell(() => rewriteIfSmall(spark, p)))
    val resolved = cell.resolved
    spark.read.parquet(if (resolved.isEmpty) path else resolved)
  }

  /** The one-time rewrite decision + job for [[compacted]]. Width comes
    * from the JVM's core count, NOT the calling session's
    * shuffle-partition conf: the memo is JVM-wide, so a narrow session
    * warming the cache first must not permanently pin every later
    * session's scan parallelism below its core budget. */
  private def rewriteIfSmall(spark: SparkSession, p: String): String = {
    val raw = spark.read.parquet(p)
    val bytes =
      try {
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(spark.sessionState.newHadoopConf())
          .getContentSummary(hp)
          .getLength
      } catch { case _: java.io.IOException => -1L }
    if (bytes < CompactMinBytes || bytes > CompactMaxBytes) ""
    else {
      val width = Runtime.getRuntime.availableProcessors
      // TempLayouts (not a bare createTempDirectory): tmpfs placement and
      // shutdown-hook cleanup — the old direct dir leaked on exit
      val out = TempLayouts.scratch("graft-compact-")
      raw.repartition(width).write.mode("overwrite").parquet(out)
      out
    }
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
