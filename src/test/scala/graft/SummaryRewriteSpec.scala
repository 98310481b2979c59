package graft

import org.apache.spark.sql.functions._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.io.Tables
import graft.plans.{SummaryQueries, SummaryRewrite}
import graft.queries.Catalog

/** Soundness + plan shape of the summary-navigation optimizer rule
  * (graft.plans.SummaryRewrite): the rewrite must fire exactly when its
  * gate holds, answer from the summary scan, and change nothing about
  * the result. */
class SummaryRewriteSpec extends SparkSpecBase {

  private def summaryPath = SummaryQueries.ensureEventsDaily(spark, sf0001)

  private def q76 = Catalog.queries("q76_agg_summary_rewrite")(spark, sf0001)

  /** Root paths of every file scan in the optimized plan (the logical
    * plan's toString elides locations, so assert on the relations). */
  private def scanPaths(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten.toSet

  private def summaryScanned(df: DataFrame): Boolean =
    scanPaths(df).exists(_.contains("graft-summary-"))

  test("q76 is answered from the summary scan, not the fact table") {
    val path = summaryPath
    val df = q76
    val paths = scanPaths(df)
    assert(paths.exists(_.contains(new java.io.File(path).getName)),
      s"expected summary scan at $path, scanned: $paths")
    assert(paths.forall(p => !p.contains("events.parquet") && !p.contains("graft-compact")),
      s"fact-table scan survived the rewrite: $paths")
  }

  test("rewrite is result-transparent: identical rows with the rule off") {
    summaryPath
    val on = q76.collect().toSeq
    spark.conf.set(SummaryRewrite.EnabledKey, "false")
    try {
      val offDf = q76
      assert(!summaryScanned(offDf),
        s"rule fired while disabled: ${scanPaths(offDf)}")
      assert(offDf.collect().toSeq == on, "summary answer diverged from base answer")
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "true")
  }

  test("key filter is pushed into the summary scan") {
    summaryPath
    val p = q76.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(event_type)"),
      s"key filter not pushed into the summary scan:\n$p")
  }

  test("gate: a non-key filter blocks the rewrite") {
    summaryPath
    val df = Tables(spark, sf0001).events
      .filter(col("value") > lit(100.0))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(!summaryScanned(df),
      s"unsound rewrite past a measure filter: ${scanPaths(df)}")
  }

  test("gate: a distinct aggregate blocks the rewrite") {
    summaryPath
    val df = Tables(spark, sf0001).events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"))
    assert(!summaryScanned(df),
      s"unsound rewrite of a distinct aggregate: ${scanPaths(df)}")
  }

  test("gate: a computed grouping key blocks the rewrite") {
    summaryPath
    val df = Tables(spark, sf0001).events
      .groupBy(upper(col("event_type")).as("t"))
      .agg(count(lit(1)).as("cnt"))
    assert(!summaryScanned(df),
      s"unsound rewrite of a derived grouping key: ${scanPaths(df)}")
  }

  test("q77: maintenance scan bounded by a PUSHED cutoff; straddled day genuinely merged") {
    val df = Catalog.queries("q77_summary_incremental")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    // the batch aggregation's fact scan must carry the cutoff as a
    // pushed long-range filter (the raw-nanos split), not a post-scan
    // Filter over the converted timestamp
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"batch cutoff not pushed into the fact scan:\n$p")
    // Jan 25 straddles the 12:00 cutoff: the stored v1 partials hold
    // strictly fewer Jan-25 events than the merged summary, so a green
    // count proves the merge COMBINED overlapping groups
    def jan25(d: org.apache.spark.sql.DataFrame): Long = d
      .filter(date_format(col("day"), "yyyy-MM-dd") === "2024-01-25")
      .agg(sum(col("cnt"))).head.getLong(0)
    val mergedCnt = jan25(df)
    val v1 = spark.read.parquet(graft.io.TempLayouts.cached(
      s"summary#events_daily_v1#$sf0001", "graft-summary-v1-")(_ => ()))
    val v1Cnt = jan25(v1)
    assert(v1Cnt > 0 && mergedCnt > v1Cnt,
      s"cutoff-day merge did not combine: v1=$v1Cnt merged=$mergedCnt")
  }

  test("global (no-grouping) totals also navigate to the summary") {
    summaryPath
    val df = Tables(spark, sf0001).events
      .agg(count(lit(1)).as("cnt"))
    assert(summaryScanned(df),
      s"global total did not navigate: ${scanPaths(df)}")
    val viaSummary = df.collect().head.getLong(0)
    spark.conf.set(SummaryRewrite.EnabledKey, "false")
    try assert(viaSummary == Tables(spark, sf0001).events.count())
    finally spark.conf.set(SummaryRewrite.EnabledKey, "true")
  }
}
