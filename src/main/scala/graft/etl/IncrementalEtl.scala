package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.GraftQuery

/** Incremental warehouse maintenance via DYNAMIC partition overwrite —
  * the batch-ETL idiom that makes a 100 TB aggregate table maintainable:
  * the nightly job recomputes ONLY the date partitions that received
  * late data and `INSERT OVERWRITE`s exactly those directories, leaving
  * every other partition's files untouched (no read-modify-write of the
  * table, no full recompute). Spark's
  * `partitionOverwriteMode=dynamic` writer option scopes the overwrite
  * to the partitions present in the incoming frame — the static default
  * would clear the whole table.
  *
  * The demo pipeline: daily (event_date, event_type) counts from the
  * events table. Load 1 writes the full history; a deterministic
  * late-arrival batch (every event_id ≡ 0 mod 13 of the LATEST day
  * arrives a second time) then patches that one day by rewriting only
  * its partition with the day's recomputed counts. Both loads are pure
  * integer counts → the final table carries a full DuckDB oracle, and
  * the spec proves the untouched partitions' files were not rewritten.
  */
object IncrementalEtl {

  private val dirCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    dirCache.values().forEach(p => deleteRecursively(new java.io.File(p)))))

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  private def dailyEvents(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .select(to_date(col("ts")).as("event_date"), col("event_type"), col("event_id"))

  private def counts(df: DataFrame): DataFrame =
    df.groupBy(col("event_date"), col("event_type")).agg(count(lit(1)).as("cnt"))

  /** Load 1: full history, hive-partitioned by day. */
  def fullLoad(spark: SparkSession, dir: String, out: String): Unit =
    counts(dailyEvents(spark, dir)).write
      .partitionBy("event_date").mode("overwrite").parquet(out)

  /** Late batch: the latest day's ≡0 (mod 13) events arrive again; that
    * day is recomputed from (original ∪ late) and ONLY its partition is
    * overwritten (`partitionOverwriteMode=dynamic` scopes the overwrite
    * to partitions present in the frame). The max-date lookup is one
    * tiny agg job (a broadcast scalar, same billing as
    * SimilarityOps.embeddingDim). */
  def latePatch(spark: SparkSession, dir: String, out: String): Unit = {
    val ev = dailyEvents(spark, dir)
    val maxDate = ev.agg(max(col("event_date"))).head().getDate(0)
    val lastDay = ev.filter(col("event_date") === lit(maxDate))
    counts(lastDay.unionByName(lastDay.filter(col("event_id") % 13 === 0)))
      .write.partitionBy("event_date").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(out)
  }

  /** Read the maintained table back (partition column re-materializes as
    * a string key so the oracle compares dates textually). */
  def finalTable(spark: SparkSession, out: String): DataFrame =
    spark.read.parquet(out)
      .select(date_format(col("event_date"), "yyyy-MM-dd").as("event_date"),
        col("event_type"), col("cnt"))
      .orderBy(col("event_date"), col("event_type"))

  /** Run the two-load pipeline; returns (final table, layout path). A
    * fresh layout dir per invocation (keyed only for exit cleanup) — a
    * catalog entry must not serve stale state across runs. */
  def dailyCountsWithLatePatch(spark: SparkSession, dir: String): (DataFrame, String) = {
    val out = java.nio.file.Files.createTempDirectory("graft_incr_etl_").toString
    dirCache.put(out, out)
    fullLoad(spark, dir, out)
    latePatch(spark, dir, out)
    (finalTable(spark, out), out)
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q48_incremental_partition_etl",
      "daily-count table maintained by dynamic partition overwrite of the late-data day",
      (spark, dir) => dailyCountsWithLatePatch(spark, dir)._1,
      Some(
        """WITH ev AS (
          |  SELECT CAST(ts AS DATE) AS event_date, event_type, event_id FROM events),
          |mx AS (SELECT max(event_date) AS d FROM ev),
          |cnts AS (
          |  SELECT event_date, event_type, count(*) AS c FROM ev GROUP BY 1, 2),
          |extra AS (
          |  SELECT event_date, event_type, count(*) AS c
          |  FROM ev, mx WHERE event_date = mx.d AND event_id % 13 = 0
          |  GROUP BY 1, 2)
          |SELECT CAST(c.event_date AS VARCHAR) AS event_date,
          |       c.event_type AS event_type,
          |       CAST(c.c + coalesce(e.c, 0) AS BIGINT) AS cnt
          |FROM cnts c LEFT JOIN extra e
          |  ON c.event_date = e.event_date AND c.event_type = e.event_type
          |ORDER BY 1, 2""".stripMargin)
    )
  )
}
