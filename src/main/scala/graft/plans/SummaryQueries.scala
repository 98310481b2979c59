package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{Tables, TempLayouts}
import graft.queries.GraftQuery

/** Maintained summaries + the catalog entry that rides
  * [[SummaryRewrite]].
  *
  * The summary is the engine-side artifact a warehouse team maintains
  * next to a 100 TB fact table (rebuilt incrementally per partition as
  * data lands — q48's incremental-partition pattern); here it is built
  * once per (JVM, sf-dir) from the driver's events table, which is a
  * read-only snapshot, so build-once matches the registry's
  * immutability contract.
  */
object SummaryQueries {

  /** The engine's micro-unit measure over events.value — the exact
    * per-row expression q53's observed metrics use, so the summary's
    * partial sums re-aggregate with no float ever added
    * (cross-engine-deterministic by construction). */
  private def valueMicros: Column = floor(col("value") * lit(1e6)).cast("long")

  /** One snapshot's (day, event_type) partials — the aggregation shape
    * shared by the one-time build, the per-batch maintenance pass, and
    * (via the oracle) the full-rebuild equivalence check. */
  private def dayAgg(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(valueMicros).as("sum_value_micros"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Build the (day, event_type) events summary for `dir` once per JVM
    * and (re-)register it for [[SummaryRewrite]]. Returns the summary
    * path. ~days × |event types| rows: vanishingly small next to the
    * fact table at any scale. */
  def ensureEventsDaily(spark: SparkSession, dir: String): String = {
    val base = Tables(spark, dir).events
    val path = TempLayouts.cached(s"summary#events_daily#$dir", "graft-summary-") { out =>
      dayAgg(base).write.mode("overwrite").parquet(out)
    }
    SummaryRegistry.register(SummaryRegistry.define(
      base, path,
      keyCols = Seq("event_type"),
      cntCol = "cnt",
      sumCols = Seq("sum_value_micros" -> valueMicros),
      minCols = Seq("min_value" -> col("value")),
      maxCols = Seq("max_value" -> col("value"))))
    path
  }

  /** q77's history/batch split at the 2024-01-25 12:00 UTC cutoff.
    *
    * The filter must reach the FACT SCAN for the maintenance pass to be
    * O(batch) IO, but the engine-wide `ts` column is COMPUTED (parquet
    * TIMESTAMP(NANOS) arrives as long under `nanosAsLong` and
    * [[graft.io.Tables.normalizeEventTs]] converts) — a timestamp
    * predicate on a computed column never pushes. So the split is
    * expressed against the RAW nanos column before conversion (exact:
    * cutoffNanos = cutoffMicros·1000, and `div 1000` truncation maps
    * each side of the nanos boundary to the same side of the timestamp
    * boundary), which pushes as a plain long range into the scan —
    * row-group stats then skip history row groups, the file-level twin
    * of q48's partition pruning on a date-partitioned landing layout.
    * Inputs that already arrive timestamp-typed take the direct filter
    * (equally pushable). */
  private def eventsSplit(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.LongType
    val raw = Tables.compacted(spark, s"$dir/events.parquet")
    val cutoffMicros = java.time.LocalDateTime.of(2024, 1, 25, 12, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    raw.schema("ts").dataType match {
      case LongType =>
        val nanos = cutoffMicros * 1000L
        (Tables.normalizeEventTs(raw.filter(col("ts") < lit(nanos))),
          Tables.normalizeEventTs(raw.filter(col("ts") >= lit(nanos))))
      case _ =>
        val ev = Tables(spark, dir).events
        val cutoff = timestamp_micros(lit(cutoffMicros))
        (ev.filter(col("ts") < cutoff), ev.filter(col("ts") >= cutoff))
    }
  }

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // q76: the dashboard metric-card aggregation (streamlit.py:52–131
    // shape: per-type counts/sums/extremes over the full fact table),
    // WRITTEN against the base events table — the optimizer rule
    // answers it from the (day, event_type) summary. The oracle
    // recomputes from raw events in DuckDB, so a green row proves the
    // whole chain: summary build, registration, rewrite soundness, and
    // re-aggregation semantics.
    GraftQuery(
      "q76_agg_summary_rewrite",
      "aggregate navigation: per-type totals over events answered from a maintained (day,type) summary by an injected optimizer rule",
      (spark, dir) => {
        ensureEventsDaily(spark, dir)
        val t = Tables(spark, dir)
        t.events
          .filter(col("event_type") =!= lit("error"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(valueMicros).as("sum_value_micros"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"))
          .orderBy(col("event_type"))
      },
      Some(
        """SELECT event_type,
          |       count(*) AS cnt,
          |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros,
          |       min(value) AS min_value,
          |       max(value) AS max_value
          |FROM events
          |WHERE event_type <> 'error'
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // q77: the maintenance half of the summary story — how the q76
    // artifact stays fresh as a 100 TB fact table grows. History
    // (ts < the cutoff) aggregates ONCE into a persisted v1 summary;
    // when a new batch lands, ONLY the batch is aggregated (O(batch)
    // fact IO — the plan spec pins the pushed ts filter) and its
    // partials merge into the stored ones by re-aggregation
    // (sum/sum/min/max are associative partials — exactly the algebra
    // the rewrite rule relies on, now exercised across snapshots). The
    // cutoff is mid-day (2024-01-25 12:00) ON PURPOSE: Jan 25 exists
    // in BOTH v1 and the batch, so the merge must genuinely combine
    // overlapping groups, not just append rows. The oracle is the full
    // rebuild from raw events — a green row IS the
    // incremental-equals-rebuild equivalence proof, at value level.
    GraftQuery(
      "q77_summary_incremental",
      "incremental summary maintenance: batch-only aggregation merged into stored (day,type) partials == full rebuild (q48 pattern for the q76 summary)",
      (spark, dir) => {
        val (history, batch) = eventsSplit(spark, dir)
        val v1 = TempLayouts.cached(
          s"summary#events_daily_v1#$dir", "graft-summary-v1-") { out =>
          dayAgg(history).write.mode("overwrite").parquet(out)
        }
        spark.read.parquet(v1)
          .unionByName(dayAgg(batch))
          .groupBy(col("day"), col("event_type"))
          .agg(
            sum(col("cnt")).as("cnt"),
            sum(col("sum_value_micros")).as("sum_value_micros"),
            min(col("min_value")).as("min_value"),
            max(col("max_value")).as("max_value"))
          .orderBy(col("day"), col("event_type"))
      },
      Some(
        """SELECT date_trunc('day', ts) AS day, event_type,
          |       count(*) AS cnt,
          |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros,
          |       min(value) AS min_value,
          |       max(value) AS max_value
          |FROM events
          |GROUP BY 1, 2
          |ORDER BY day, event_type""".stripMargin)
    )
  )
}
