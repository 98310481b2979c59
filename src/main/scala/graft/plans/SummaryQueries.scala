package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
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

  /** Build the (day, event_type) events summary for `dir` once per JVM
    * and (re-)register it for [[SummaryRewrite]]. Returns the summary
    * path. ~days × |event types| rows: vanishingly small next to the
    * fact table at any scale. */
  def ensureEventsDaily(spark: SparkSession, dir: String): String = {
    val base = Tables(spark, dir).events
    val path = TempLayouts.cached(s"summary#events_daily#$dir", "graft-summary-") { out =>
      base
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(valueMicros).as("sum_value_micros"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .write.mode("overwrite").parquet(out)
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
    )
  )
}
