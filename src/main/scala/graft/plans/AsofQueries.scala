package graft.plans

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.GraftQuery

/** Catalog entry for the NATIVE as-of join (see [[NativeAsofJoin]]). */
object AsofQueries {

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // q78: the native as-of join — q23's operator through the custom
    // LogicalPlan + SparkStrategy + SparkPlan path (AsofJoinNode →
    // AsofJoinExec, injected via injectPlannerStrategy), pointed the
    // other way around (latest click at-or-before each purchase) so the
    // two entries answer different questions. DuckDB verifies with its
    // native ASOF LEFT JOIN — one green row proves the whole
    // custom-operator chain: logical node construction, strategy
    // dispatch, EnsureRequirements co-partitioning + sorting, and the
    // merge-scan executor.
    GraftQuery(
      "q78_asof_join_native",
      "native as-of join (custom plan + strategy + exec): latest click at-or-before each purchase",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val clicks = t.events.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("prev_click_id"))
        val purchases = t.events.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        NativeAsofJoin.leftAsof(purchases, clicks, "user_id", "ts",
            Seq("prev_click_id"))
          .select(col("event_id"), col("user_id"), col("value"),
            col("prev_click_id"))
          .orderBy(col("event_id"))
      },
      Some(
        """WITH clicks AS (
          |  SELECT user_id, ts, max(event_id) AS prev_click_id
          |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
          |purchases AS (
          |  SELECT event_id, user_id, ts, value
          |  FROM events WHERE event_type = 'purchase')
          |SELECT p.event_id, p.user_id, p.value, c.prev_click_id
          |FROM purchases p ASOF LEFT JOIN clicks c
          |  ON p.user_id = c.user_id AND p.ts >= c.ts
          |ORDER BY p.event_id""".stripMargin)
    )
  )
}
