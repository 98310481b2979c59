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
    * fresh layout dir per invocation — a catalog entry must not serve
    * stale state across runs — but [[graft.io.TempLayouts.replacing]]
    * deletes the dir the rebuild displaces, so repeated bench/Verify
    * iterations in one JVM hold one live dir, not an unbounded trail
    * (round-4 advisory). */
  def dailyCountsWithLatePatch(spark: SparkSession, dir: String): (DataFrame, String) = {
    val out = graft.io.TempLayouts.replacing(
      "incr#" + new java.io.File(dir).getCanonicalPath, "graft_incr_etl_") { out =>
      fullLoad(spark, dir, out)
      latePatch(spark, dir, out)
    }
    (finalTable(spark, out), out)
  }

  /** Small-file compaction — the OTHER half of warehouse maintenance at
    * 100 TB: streaming/micro-batch ingest leaves thousands of KB-sized
    * files per partition (every scan pays a per-file open + footer read;
    * the metadata store pays a per-file listing), and the nightly
    * compactor rewrites each partition's file set into one right-sized
    * file WITHOUT changing the table's contents. Here ingest is
    * simulated by writing the events table day-partitioned with 8 files
    * per day (`repartition(8·days)` before the partitioned write);
    * compaction reads the layout back and `repartition(event_date)`
    * routes every day's rows to exactly one task → exactly one file per
    * day directory (an incremental compactor that targets only the
    * worst partitions is the same code over a partition predicate).
    * The rewrite lands in a VERSIONED sibling directory and
    * the "current" pointer moves — the q44 stand-in for a transactional
    * format's snapshot commit; rewriting the directory in place would
    * mean overwriting files a concurrent (or the compactor's own) scan
    * is reading. Contents are untouched by construction → the catalog
    * entry returns the compacted table and carries a full identity
    * oracle against the source; WritersSpec asserts the before/after
    * per-day file counts. Values travel as integer micro-units so the
    * identity is hash-exact. */
  def compactSmallFiles(spark: SparkSession, dir: String): (DataFrame, String) = {
    val out = graft.io.TempLayouts.replacing(
      "compact#" + new java.io.File(dir).getCanonicalPath, "graft_compact_") { out =>
      val ev = Tables(spark, dir).events
        .select(col("event_id"), to_date(col("ts")).as("event_date"),
          col("event_type"), floor(col("value") * 1e6).cast("long").as("value_micros"))
      // ingest shape: ~8 small files per day partition (hash by (day,
      // bucket)), committed as version 0 of the CommitLog table
      graft.io.CommitLog.commitNext(out) { p =>
        ev.repartition(256, col("event_date"), pmod(col("event_id"), lit(8)))
          .write.partitionBy("event_date").mode("overwrite").parquet(p)
      }
      // compaction: one task (= one file) per day, committed as the next
      // version — the atomic multi-partition pointer move; v0 stays
      // readable for any concurrent scan (CommitLogSpec pins isolation)
      graft.io.CommitLog.commitNext(out) { p =>
        spark.read.parquet(graft.io.CommitLog.versionPath(out, 0L))
          .repartition(col("event_date"))
          .write.partitionBy("event_date").mode("overwrite").parquet(p)
      }
    }
    val table = graft.io.CommitLog.snapshotLatest(spark, out).get
      .select(col("event_id"),
        date_format(col("event_date"), "yyyy-MM-dd").as("event_date"),
        col("event_type"), col("value_micros"))
      .orderBy(col("event_id"))
    (table, out)
  }

  /** Snapshot TIME TRAVEL + diff — the read side of the versioned-commit
    * discipline q44/q52 write by: because a commit lands as a NEW
    * versioned directory and the current pointer moves (never an
    * in-place mutation), every prior snapshot stays readable, so
    * yesterday's report is reproducible and "what changed between v0
    * and v1" is a plain two-snapshot join — `VERSION AS OF` plus CDC
    * diff in transactional-format terms. v0 = the daily counts; v1 =
    * the same counts recommitted after q48's deterministic late batch
    * (latest day's event_id ≡ 0 mod 13 arrive again). The diff reads
    * BOTH version directories — the proof that committing v1 destroyed
    * nothing. Group sets match by construction (the late batch only
    * re-delivers existing events), so the diff is an inner join;
    * all-integer counts → full oracle. At 100 TB: snapshots share
    * unchanged files in a real table format (here each version is
    * self-contained — the pointer-move commit is the part under test);
    * the diff query touches only the two aggregate snapshots, never
    * the raw events. */
  def snapshotDiff(spark: SparkSession, dir: String): (DataFrame, String) = {
    val out = graft.io.TempLayouts.replacing(
      "ttravel#" + new java.io.File(dir).getCanonicalPath, "graft_time_travel_") { out =>
      val ev = dailyEvents(spark, dir)
      graft.io.CommitLog.commitNext(out) { p =>
        counts(ev).write.mode("overwrite").parquet(p)
      }
      val maxDate = ev.agg(max(col("event_date"))).head().getDate(0)
      val late = ev.filter(col("event_date") === lit(maxDate)
        && col("event_id") % 13 === 0)
      graft.io.CommitLog.commitNext(out) { p =>
        counts(ev.unionByName(late)).write.mode("overwrite").parquet(p)
      }
    }
    def snap(v: Long, cName: String) = graft.io.CommitLog.snapshot(spark, out, v)
      .select(col("event_date"), col("event_type"), col("cnt").as(cName))
    val diff = snap(0L, "cnt_v0")
      .join(snap(1L, "cnt_v1"), Seq("event_date", "event_type"))
      .select(date_format(col("event_date"), "yyyy-MM-dd").as("event_date"),
        col("event_type"), col("cnt_v0"), col("cnt_v1"),
        (col("cnt_v1") - col("cnt_v0")).as("delta"))
      .orderBy(col("event_date"), col("event_type"))
    (diff, out)
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
    ),

    GraftQuery(
      "q52_compact_small_files",
      "small-file compaction: 8-files-per-day ingest layout rewritten to one file per partition",
      (spark, dir) => compactSmallFiles(spark, dir)._1,
      Some(
        """SELECT event_id,
          |       CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
          |       event_type,
          |       CAST(floor(value * 1000000) AS BIGINT) AS value_micros
          |FROM events
          |ORDER BY event_id""".stripMargin)
    ),

    GraftQuery(
      "q68_snapshot_time_travel",
      "read two committed snapshot versions and diff them: reproducible history + CDC-style delta",
      (spark, dir) => snapshotDiff(spark, dir)._1,
      Some(
        """WITH ev AS (
          |  SELECT CAST(ts AS DATE) AS event_date, event_type, event_id FROM events),
          |mx AS (SELECT max(event_date) AS d FROM ev),
          |v0 AS (
          |  SELECT event_date, event_type, count(*) AS c FROM ev GROUP BY 1, 2),
          |v1 AS (
          |  SELECT event_date, event_type, count(*) AS c FROM (
          |    SELECT event_date, event_type, event_id FROM ev
          |    UNION ALL
          |    SELECT ev.event_date, ev.event_type, ev.event_id
          |    FROM ev, mx WHERE ev.event_date = mx.d AND ev.event_id % 13 = 0)
          |  GROUP BY 1, 2)
          |SELECT CAST(v0.event_date AS VARCHAR) AS event_date, v0.event_type,
          |       CAST(v0.c AS BIGINT) AS cnt_v0, CAST(v1.c AS BIGINT) AS cnt_v1,
          |       CAST(v1.c - v0.c AS BIGINT) AS delta
          |FROM v0 JOIN v1 USING (event_date, event_type)
          |ORDER BY 1, 2""".stripMargin)
    )
  )
}
