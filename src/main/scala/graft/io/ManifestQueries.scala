package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.GraftQuery

/** Catalog entries for the manifest table format ([[ManifestLog]]):
  * plan-time file skipping from manifest statistics (q96) and
  * file-granular copy-on-write MERGE (q97).
  */
object ManifestQueries {

  /** The manifest-committed orders feed both entries read: integer-coded
    * (the q94/q95 interchange discipline — dates as ISO strings, money as
    * cents), range-partitioned + sorted so each data file owns a
    * contiguous slice of its sort column, stats collected at commit. Built
    * once per (JVM, dataset); returns the table base dir. */
  private def ordersByDate(spark: SparkSession, dir: String): String =
    TempLayouts.cached(
      "manifest_orders_date#" + new java.io.File(dir).getCanonicalPath,
      "graft_manifest_ord_") { base =>
      ManifestLog.commitAppend(
        spark, base,
        Tables(spark, dir).orders.select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderpriority").as("priority")),
        statsCols = Seq("odate"), sortCol = Some("odate"), files = 24): Unit
    }

  /** One `(k, cents, status)` orders table PER WRITE-PATH ENTRY
    * (`variant` ∈ {cow, mor, hybrid}): q97/q101/q104 each reset their
    * base to version 0 and vacuum the superseded run's files before
    * replaying their write, so a SHARED base would let entry B's reset
    * delete the data files entry A's still-lazy result DataFrame reads
    * (FileNotFoundException or wrong rows for any caller that defers
    * collection or interleaves entries — round-13 advisory). Isolated
    * bases make each entry's reset touch only files that entry itself
    * produced; the remaining caveat — don't hold one entry's result
    * across two invocations of the SAME entry — is the ordinary
    * overwrite semantics of a write-path query. */
  private def ordersByKey(spark: SparkSession, dir: String, variant: String): String =
    TempLayouts.cached(
      s"manifest_orders_key_$variant#" + new java.io.File(dir).getCanonicalPath,
      s"graft_manifest_kv_${variant}_") { base =>
      ManifestLog.commitAppend(
        spark, base,
        Tables(spark, dir).orders.select(
          col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderstatus").as("status")),
        statsCols = Seq("k"), sortCol = Some("k"), files = 16): Unit
    }

  /** q105's evolved table, built once per (JVM, dataset): v0 commits
    * orders as (k, cents, status) with that schema recorded; v1 appends
    * a batch that CARRIES the new physical column `prio` (every ninth
    * order re-keyed past the key space, priority attached) and commits
    * the evolved logical schema — `status` renamed to `order_status`
    * (metadata-only), `prio` added (v0 files never rewritten; reads
    * null-fill them). */
  private def ordersEvolved(spark: SparkSession, dir: String): String =
    TempLayouts.cached(
      "manifest_orders_evo#" + new java.io.File(dir).getCanonicalPath,
      "graft_manifest_evo_") { base =>
      val src = Tables(spark, dir).orders.select(
        col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderstatus").as("status"))
      val v0 = ManifestLog.commitAppend(spark, base, src,
        statsCols = Seq("k"), sortCol = Some("k"), files = 8)
      ManifestLog.commitSchema(base, v0, Seq(
        ManifestLog.ColumnDef("k", "k", "BIGINT"),
        ManifestLog.ColumnDef("cents", "cents", "BIGINT"),
        ManifestLog.ColumnDef("status", "status", "STRING")))
      val Array(mx) = src.agg(max(col("k"))).collect().map(_.getLong(0))
      val batch = Tables(spark, dir).orders
        .filter(pmod(col("o_orderkey"), lit(9)) === 0)
        .select((col("o_orderkey") + lit(2L * mx)).as("k"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio"))
      val v1 = ManifestLog.commitAppend(spark, base, batch,
        statsCols = Seq("k"), sortCol = Some("k"))
      ManifestLog.commitSchema(base, v1, Seq(
        ManifestLog.ColumnDef("k", "k", "BIGINT"),
        ManifestLog.ColumnDef("cents", "cents", "BIGINT"),
        ManifestLog.ColumnDef("order_status", "status", "STRING"),
        ManifestLog.ColumnDef("prio", "prio", "STRING")))
    }

  /** q107's three-version history, built once per (JVM, dataset):
    * v0 = orders as (k); v1 = append of every seventh order re-keyed
    * past the key space; v2 = merge-on-read delete of a closed-form v0
    * key band (1/15 of the key space, one fifth in). Read-only after
    * build — readChanges never mutates. */
  private def ordersChangeFeed(spark: SparkSession, dir: String): String =
    TempLayouts.cached(
      "manifest_orders_cdc#" + new java.io.File(dir).getCanonicalPath,
      "graft_manifest_cdc_") { base =>
      val src = Tables(spark, dir).orders.select(col("o_orderkey").as("k"))
      ManifestLog.commitAppend(spark, base, src,
        statsCols = Seq("k"), sortCol = Some("k"), files = 8): Unit
      val Array(mn, mx) = src.agg(min(col("k")), max(col("k"))).collect()
        .flatMap(r => Array(r.getLong(0), r.getLong(1)))
      val batch = src.filter(pmod(col("k"), lit(7)) === 0)
        .select((col("k") + lit(2L * mx)).as("k"))
      ManifestLog.commitAppend(spark, base, batch,
        statsCols = Seq("k"), sortCol = Some("k")): Unit
      val lo = mn + (mx - mn) / 5
      val hi = lo + (mx - mn) / 15
      ManifestLog.commitDelete(spark, base,
        src.filter(col("k").between(lo, hi)), statsCols = Seq("k")): Unit
    }

  /** 2×16-bit Morton (Z-order) interleave as a pure column expression —
    * unrolled at plan-build time (Scala-level loop, so shiftleft/right
    * take literal bit counts and the whole thing stays one codegen'd
    * integer expression). Inputs must be pre-normalized to [0, 65535]. */
  private def zValue(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** q106's Z-ordered table, built once per (JVM, dataset): orders laid
    * out by the Morton interleave of (order day, cents), both
    * min-max-normalized to 16 bits, 64 files, stats on BOTH columns.
    * A 1-D sort gives selective stats on the sort column only; the
    * space-filling curve keeps each file's bounding BOX small on both
    * dimensions, which is what makes 2-D predicate file-skipping work
    * (the public Delta/Databricks OPTIMIZE ZORDER BY design). */
  private def ordersZOrdered(spark: SparkSession, dir: String): String =
    TempLayouts.cached(
      "manifest_orders_z#" + new java.io.File(dir).getCanonicalPath,
      "graft_manifest_z_") { base =>
      val src = Tables(spark, dir).orders.select(
        col("o_orderkey").as("k"),
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("dday"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderpriority").as("priority"))
      val Array(mnD, mxD, mnC, mxC) = src.agg(
        min(col("dday")), max(col("dday")), min(col("cents")), max(col("cents")))
        .collect().flatMap(r => (0 to 3).map(r.getLong))
      def norm(c: org.apache.spark.sql.Column, mn: Long, mx: Long) =
        ((c - mn) * 65535L / math.max(1L, mx - mn)).cast("long")
      val withZ = src.withColumn("z",
        zValue(norm(col("dday"), mnD, mxD), norm(col("cents"), mnC, mxC)))
      val entries = ManifestLog.stage(spark, base, "v0-z", withZ,
        statsCols = Seq("dday", "cents"), sortCol = Some("z"), files = 64)
      ManifestLog.commitEntries(base, entries): Unit
    }

  /** A deliberately fragmented table — 12 incremental commits of orders
    * slices (the shape a streaming/incremental ingest leaves behind) —
    * the q99 OPTIMIZE input. Built once per (JVM, dataset). */
  private def ordersFragmented(spark: SparkSession, dir: String): String =
    TempLayouts.cached(
      "manifest_orders_frag#" + new java.io.File(dir).getCanonicalPath,
      "graft_manifest_frag_") { base =>
      val src = Tables(spark, dir).orders.select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderpriority").as("priority"))
      (0 until 12).foreach { s =>
        ManifestLog.commitAppend(spark, base,
          src.filter(pmod(col("o_orderkey"), lit(12)) === s),
          statsCols = Seq("odate"), sortCol = Some("odate")): Unit
      }
    }

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // q96: manifest-stats file skipping — the plan-time half of the
    // layout-skipping family (q55/q58/q62 skip ROW GROUPS via parquet
    // footer pushdown, which still opens every file's footer; this skips
    // whole FILES from one manifest read, the Delta/Iceberg data-skipping
    // move that matters when a table has 10⁶ files). The scan list is
    // resolved from [[ManifestLog.pruneRange]] over footer-harvested
    // min/max — no data file is touched for the skipped ranges — then the
    // row-level predicate still applies (edge files hold out-of-range
    // rows). ManifestLogSpec pins soundness (skipped files contain no
    // matching rows) and effectiveness (most files skipped); the oracle
    // pins values against the raw parquet table.
    GraftQuery(
      "q96_manifest_stats_skipping",
      "manifest min/max file pruning for a date-range revenue rollup (parquet-side oracle)",
      (spark, dir) => {
        val base = ordersByDate(spark, dir)
        val m = ManifestLog.manifest(base, ManifestLog.latest(base).get)
        val (keep, _) = ManifestLog.pruneRange(m, "odate", "1996-04-01", "1996-09-30")
        ManifestLog.read(spark, base, keep)
          .filter(col("odate") >= "1996-04-01" && col("odate") <= "1996-09-30")
          .groupBy(substring(col("odate"), 1, 7).as("month"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("rev_cents"),
            countDistinct(col("priority")).as("n_prio"))
          .orderBy(col("month"))
      },
      Some(
        """WITH feed AS (
          |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS odate,
          |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
          |         o_orderpriority AS priority
          |  FROM orders)
          |SELECT substr(odate, 1, 7) AS month,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(cents) AS BIGINT) AS rev_cents,
          |       CAST(count(DISTINCT priority) AS BIGINT) AS n_prio
          |FROM feed
          |WHERE odate >= '1996-04-01' AND odate <= '1996-09-30'
          |GROUP BY 1
          |ORDER BY 1""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // q97: file-granular copy-on-write MERGE — the production upsert
    // shape (public Delta MERGE semantics): a key-banded update+insert
    // batch lands by (1) stats-pruning the manifest to the AFFECTED files
    // (the band's key range), (2) rewriting only those files (anti-join
    // out the updated keys, union the new row versions), (3) publishing a
    // new manifest that references every untouched file UNCHANGED plus
    // the rewritten + inserted files. On a 100 TB table the write cost is
    // O(affected files + batch), never O(table); q65's merge is the
    // whole-table logical version, this is the physical-layout one.
    // ManifestLogSpec pins file reuse across versions (path identity),
    // bounded rewrite set, and old-snapshot immutability; the oracle pins
    // the merged STATE (every run re-executes the merge and reads it
    // back).
    GraftQuery(
      "q97_manifest_cow_merge",
      "copy-on-write MERGE rewriting only stats-affected files; merged state vs SQL oracle",
      (spark, dir) => {
        val base = ordersByKey(spark, dir, "cow")
        mergedSnapshot(spark, base)
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
          .orderBy(col("status"))
      },
      Some(
        """WITH base AS (
          |  SELECT o_orderkey AS k,
          |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
          |         o_orderstatus AS status
          |  FROM orders),
          |b AS (SELECT min(k) AS mn, max(k) AS mx FROM base),
          |band AS (SELECT mn + (mx - mn) // 3 AS lo,
          |                mn + (mx - mn) // 3 + (mx - mn) // 20 AS hi,
          |                mx
          |         FROM b),
          |upd AS (SELECT k, cents + 100 AS cents, 'X' AS status
          |        FROM base, band WHERE k BETWEEN lo AND hi),
          |ins AS (SELECT k + 2 * mx AS k, cents, 'N' AS status
          |        FROM base, band WHERE k BETWEEN lo AND hi),
          |merged AS (
          |  SELECT * FROM base WHERE k NOT IN (SELECT k FROM upd)
          |  UNION ALL SELECT * FROM upd
          |  UNION ALL SELECT * FROM ins)
          |SELECT status,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(cents) AS BIGINT) AS sum_cents,
          |       CAST(min(k) AS BIGINT) AS min_k,
          |       CAST(max(k) AS BIGINT) AS max_k
          |FROM merged
          |GROUP BY status
          |ORDER BY status""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // q99: OPTIMIZE (bin-packing compaction) on the manifest format —
    // the steady-state maintenance verb that undoes incremental-ingest
    // fragmentation: 12 small per-commit files rewrite into one sorted
    // file, every already-big file is reused BY REFERENCE, and the swap
    // publishes as a new manifest version while old snapshots keep
    // reading the fragments they reference (q52 is the CommitLog
    // directory-swap version of this; here the swap is one metadata
    // file, and history survives). The entry re-runs the compaction
    // every invocation and reads the packed snapshot back through a
    // full-oracle aggregate, so a row lost or duplicated by the rewrite
    // breaks the hash. ManifestLogSpec pins the structural contract
    // (file count drops, multiset identical, old version intact).
    GraftQuery(
      "q99_manifest_optimize",
      "bin-packing compaction of an incrementally-fragmented table; packed snapshot vs oracle",
      (spark, dir) => {
        val base = ordersFragmented(spark, dir)
        // a re-run on the already-packed head is a no-op (None) — read it
        val v = ManifestLog.optimize(spark, base, smallBytes = Long.MaxValue,
          statsCols = Seq("odate"), sortCol = Some("odate"))
          .getOrElse(ManifestLog.latest(base).get)
        ManifestLog.snapshot(spark, base, v)
          .groupBy(col("priority"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents"),
            min(col("odate")).as("min_odate"),
            max(col("odate")).as("max_odate"))
          .orderBy(col("priority"))
      },
      Some(
        """WITH feed AS (
          |  SELECT o_orderpriority AS priority,
          |         strftime(o_orderdate, '%Y-%m-%d') AS odate,
          |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
          |  FROM orders)
          |SELECT priority,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(cents) AS BIGINT) AS sum_cents,
          |       min(odate) AS min_odate,
          |       max(odate) AS max_odate
          |FROM feed
          |GROUP BY priority
          |ORDER BY priority""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // q101: merge-on-read DELETE (deletion vectors) — q97's dual. A
    // key-banded delete batch commits as ONE tombstone file of keys plus
    // a manifest line: zero data files touched at write time (the spec
    // pins path-identity of every data file across the delete), and the
    // read side anti-joins the broadcast-small tombstones. CoW (q97)
    // pays write amplification for clean reads; MoR pays a read-side
    // probe for O(batch) writes — a production format offers both and
    // compacts MoR tables back through OPTIMIZE/CoW when tombstones
    // accumulate. The delete is pinned to version 0 so every run
    // produces the same state; the oracle is the base minus the band.
    GraftQuery(
      "q101_manifest_delete_vectors",
      "merge-on-read delete: tombstone keys file, zero data-file rewrites (parquet-side oracle)",
      (spark, dir) => {
        val base = ordersByKey(spark, dir, "mor")
        // bench-loop hygiene: drop the previous run's tombstone version +
        // file before replaying (same discipline as mergedSnapshot)
        ManifestLog.resetToVersion(base, 0L)
        val v0 = ManifestLog.read(spark, base, ManifestLog.manifest(base, 0L))
        val Array(mn, mx) = v0.agg(min(col("k")), max(col("k"))).collect()
          .flatMap(r => Array(r.getLong(0), r.getLong(1)))
        val lo = mn + 2L * (mx - mn) / 3L
        val hi = lo + (mx - mn) / 25L
        // deterministic replay: compose version 0's DATA entries with
        // this run's tombstone explicitly (commitDelete itself is
        // head-based — rebasing a live table onto an old snapshot would
        // drop later commits, so the API refuses to offer it)
        val head = ManifestLog.latest(base).get
        val tomb = ManifestLog.stage(spark, base, s"v${head + 1L}-del",
            v0.filter(col("k").between(lo, hi)).select(col("k")).distinct(),
            statsCols = Seq("k"))
          .map(_.copy(kind = "delete", seq = head + 1L))
        val v = ManifestLog.commitEntries(base,
          ManifestLog.manifest(base, 0L) ++ tomb)
        ManifestLog.snapshot(spark, base, v)
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
          .orderBy(col("status"))
      },
      Some(
        """WITH base AS (
          |  SELECT o_orderkey AS k,
          |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
          |         o_orderstatus AS status
          |  FROM orders),
          |b AS (SELECT min(k) AS mn, max(k) AS mx FROM base),
          |band AS (SELECT mn + 2 * (mx - mn) // 3 AS lo,
          |                mn + 2 * (mx - mn) // 3 + (mx - mn) // 25 AS hi
          |         FROM b)
          |SELECT status,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(cents) AS BIGINT) AS sum_cents,
          |       CAST(min(k) AS BIGINT) AS min_k,
          |       CAST(max(k) AS BIGINT) AS max_k
          |FROM base, band
          |WHERE NOT (k BETWEEN lo AND hi)
          |GROUP BY status
          |ORDER BY status""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // q107: INCREMENTAL CHANGE READ between manifest versions — the
    // consumption-side primitive the write verbs (append q96, CoW q97,
    // MoR q101, hybrid q104) exist to feed: a downstream job that has
    // processed version F catches up to version T by reading ONLY the
    // files the manifest DIFF names (added data files → inserts;
    // removed data files + added tombstones → deletes, semi-joined to
    // F's snapshot so idempotent re-deletes emit nothing). Cost
    // O(changed files), never O(table) — at 100 TB this is the
    // difference between an incremental consumer and a nightly rescan.
    // The history is append (v1) then MoR delete (v2), so the file-diff
    // changes are EXACT; the oracle replays both legs in closed form.
    GraftQuery(
      "q107_manifest_incremental_read",
      "manifest-diff change feed v0→v2: appended rows as inserts, tombstoned keys as deletes",
      (spark, dir) => {
        val base = ordersChangeFeed(spark, dir)
        ManifestLog.readChanges(spark, base, 0L, 2L, Seq("k"))
          .groupBy(col("change_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
          .orderBy(col("change_type"))
      },
      Some(
        """WITH base AS (SELECT o_orderkey AS k FROM orders),
          |b AS (SELECT min(k) AS mn, max(k) AS mx FROM base),
          |ins AS (SELECT k + 2 * mx AS k FROM base, b WHERE k % 7 = 0),
          |band AS (SELECT mn + (mx - mn) // 5 AS lo,
          |                mn + (mx - mn) // 5 + (mx - mn) // 15 AS hi
          |         FROM b),
          |del AS (SELECT k FROM base, band WHERE k BETWEEN lo AND hi),
          |ch AS (
          |  SELECT 'insert' AS change_type, k FROM ins
          |  UNION ALL SELECT 'delete' AS change_type, k FROM del)
          |SELECT change_type,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(k) AS BIGINT) AS sum_k,
          |       CAST(min(k) AS BIGINT) AS min_k,
          |       CAST(max(k) AS BIGINT) AS max_k
          |FROM ch
          |GROUP BY 1
          |ORDER BY 1""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // q106: Z-ORDER layout + 2-D manifest file skipping — the layout
    // move that makes MULTI-column predicates prunable. q96's 1-D sort
    // gives selective per-file [min,max] on the sort column and useless
    // full-range stats on everything else; laying the table out along a
    // Morton curve of (order day, cents) keeps every file's bounding
    // box small on BOTH dimensions, so a conjunctive 2-D band prunes
    // files via two pruneRange passes over ONE metadata read. Pruning
    // stays stats-sound (kept ⊇ matching) regardless of the curve — the
    // curve only buys effectiveness, which the spec pins against the
    // same band on a 1-D layout (the win needs the band NARROW relative
    // to the file grid — a ~12% band over 64 files here; a third-wide
    // band over 16 files measurably favors the 1-D sort, which the spec
    // development surfaced). Bands are closed-form from the data; the
    // oracle replays the filtered rollup directly.
    GraftQuery(
      "q106_manifest_zorder",
      "Z-order (Morton) layout: 2-D stats band prunes files on both columns (parquet-side oracle)",
      (spark, dir) => {
        val base = ordersZOrdered(spark, dir)
        val m = ManifestLog.manifest(base, 0L)
        val snap = ManifestLog.read(spark, base, m)
        val Array(mnD, mxD, mnC, mxC) = snap.agg(
          min(col("dday")), max(col("dday")), min(col("cents")), max(col("cents")))
          .collect().flatMap(r => (0 to 3).map(r.getLong))
        val (loD, hiD) = (mnD + 7 * (mxD - mnD) / 16,
          mnD + 7 * (mxD - mnD) / 16 + (mxD - mnD) / 8)
        val (loC, hiC) = (mnC + 7 * (mxC - mnC) / 16,
          mnC + 7 * (mxC - mnC) / 16 + (mxC - mnC) / 8)
        val (keepD, _) = ManifestLog.pruneRange(m, "dday", loD.toString, hiD.toString)
        val (keep, _) = ManifestLog.pruneRange(keepD, "cents", loC.toString, hiC.toString)
        ManifestLog.read(spark, base, keep)
          .filter(col("dday").between(loD, hiD) && col("cents").between(loC, hiC))
          .groupBy(col("priority"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents"),
            min(col("dday")).as("min_dday"),
            max(col("dday")).as("max_dday"))
          .orderBy(col("priority"))
      },
      Some(
        """WITH src AS (
          |  SELECT datediff('day', DATE '1992-01-01', o_orderdate) AS dday,
          |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
          |         o_orderpriority AS priority
          |  FROM orders),
          |b AS (SELECT min(dday) AS mnd, max(dday) AS mxd,
          |             min(cents) AS mnc, max(cents) AS mxc FROM src),
          |band AS (SELECT mnd + 7 * (mxd - mnd) // 16 AS lod,
          |                mnd + 7 * (mxd - mnd) // 16 + (mxd - mnd) // 8 AS hid,
          |                mnc + 7 * (mxc - mnc) // 16 AS loc,
          |                mnc + 7 * (mxc - mnc) // 16 + (mxc - mnc) // 8 AS hic
          |         FROM b)
          |SELECT priority,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(cents) AS BIGINT) AS sum_cents,
          |       CAST(min(dday) AS BIGINT) AS min_dday,
          |       CAST(max(dday) AS BIGINT) AS max_dday
          |FROM src, band
          |WHERE dday BETWEEN lod AND hid AND cents BETWEEN loc AND hic
          |GROUP BY priority
          |ORDER BY priority""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // q104: HYBRID MERGE — q97 (copy-on-write) and q101 (merge-on-read
    // deletion vectors) composed the way a production format actually
    // runs a MERGE: the strategy is chosen PER FILE from manifest stats
    // alone (no data read at planning). Files the update band covers
    // densely (≥50% of the file's key range) are rewritten — they'd pay
    // a read-side probe on most rows forever; files it merely grazes
    // get their few affected keys tombstoned and the new row versions
    // appended — rewriting a 1 GB file to change 2% of it is the write
    // amplification MoR exists to avoid. Correct coexistence of the two
    // legs in ONE snapshot rides the sequence-scoping rule
    // ([[ManifestLog.ManifestEntry.seq]]): the tombstone (seq 1)
    // deletes the stale versions from the original files (seq 0) but
    // not the re-inserted updates (seq 1). ManifestLogSpec pins the
    // structural contract (bounded rewrite set, untouched files reused
    // by path identity, history intact); the oracle pins the merged
    // state.
    GraftQuery(
      "q104_manifest_merge_hybrid",
      "hybrid MERGE: stats-dense files rewritten (CoW), grazed files tombstoned (MoR), one snapshot",
      (spark, dir) => {
        val base = ordersByKey(spark, dir, "hybrid")
        hybridMergeSnapshot(spark, base)._1
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
          .orderBy(col("status"))
      },
      Some(
        """WITH base AS (
          |  SELECT o_orderkey AS k,
          |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
          |         o_orderstatus AS status
          |  FROM orders),
          |b AS (SELECT min(k) AS mn, max(k) AS mx FROM base),
          |band AS (SELECT mn + (mx - mn) // 2 AS lo,
          |                mn + (mx - mn) // 2 + (mx - mn) // 12 AS hi
          |         FROM b),
          |merged AS (
          |  SELECT k,
          |         CASE WHEN k BETWEEN lo AND hi THEN cents + 200 ELSE cents END AS cents,
          |         CASE WHEN k BETWEEN lo AND hi THEN 'M' ELSE status END AS status
          |  FROM base, band)
          |SELECT status,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(cents) AS BIGINT) AS sum_cents,
          |       CAST(min(k) AS BIGINT) AS min_k,
          |       CAST(max(k) AS BIGINT) AS max_k
          |FROM merged
          |GROUP BY status
          |ORDER BY status""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // q105: SCHEMA EVOLUTION through the manifest format — the two
    // metadata-only DDL verbs a production table lives on, composed in
    // one version step ([[ManifestLog.commitSchema]] /
    // [[ManifestLog.snapshotEvolved]]):
    //   ADD COLUMN `prio`  — only the post-evolution batch's files carry
    //     it physically; every v0 file is read null-filled, ZERO
    //     rewrites (the spec pins v0 path identity);
    //   RENAME `status` → `order_status` — pure column mapping
    //     (logical ≠ physical name), zero files touched; v0 remains
    //     readable under its own original schema.
    // q88 proved the same contract on raw parquet scans; this is the
    // version where the SCHEMA is table metadata, versioned beside the
    // manifest — what makes the contract durable rather than
    // per-reader convention. The oracle replays base ∪ batch with a
    // NULL-filled prio on the base leg.
    GraftQuery(
      "q105_manifest_schema_evolution",
      "manifest schema evolution: add-column null-fill + metadata-only rename (parquet-side oracle)",
      (spark, dir) => {
        val base = ordersEvolved(spark, dir)
        ManifestLog.snapshotEvolved(spark, base, 1L)
          .groupBy(col("order_status"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents"),
            count(col("prio")).as("n_prio"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
          .orderBy(col("order_status"))
      },
      Some(
        """WITH base AS (
          |  SELECT o_orderkey AS k,
          |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
          |         o_orderstatus AS status
          |  FROM orders),
          |b AS (SELECT max(k) AS mx FROM base),
          |batch AS (
          |  SELECT k + 2 * mx AS k, cents, status, o_orderpriority AS prio
          |  FROM (SELECT o_orderkey AS k,
          |               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
          |               o_orderstatus AS status, o_orderpriority
          |        FROM orders) src, b
          |  WHERE k % 9 = 0),
          |evolved AS (
          |  SELECT k, cents, status, CAST(NULL AS VARCHAR) AS prio FROM base
          |  UNION ALL SELECT k, cents, status, prio FROM batch)
          |SELECT status AS order_status,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(cents) AS BIGINT) AS sum_cents,
          |       CAST(count(prio) AS BIGINT) AS n_prio,
          |       CAST(min(k) AS BIGINT) AS min_k,
          |       CAST(max(k) AS BIGINT) AS max_k
          |FROM evolved
          |GROUP BY 1
          |ORDER BY 1""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // q103: the round's pieces composed end to end — a medallion
    // pipeline where every storage hop is native: events land as a
    // JSONL bronze feed through the DSv2 SINK (two-phase commit), come
    // back through the DSv2 SCAN (explicit schema), and commit to the
    // manifest format as a time-sorted silver table with footer stats;
    // the gold aggregate then stats-prunes the silver manifest to a
    // closed-form time band (middle quarter of the event-time range)
    // before the row-level filter and rollup. One oracle hash therefore
    // covers sink protocol + scan conversion + manifest commit + file
    // pruning + aggregation in a single plan. Bronze/silver build once
    // per JVM (the ingest legs are q98/q96's own entries); the PRUNED
    // READ re-executes every run.
    GraftQuery(
      "q103_jsonl_manifest_pipeline",
      "DSv2 sink → DSv2 scan → manifest silver → stats-pruned gold rollup (parquet-side oracle)",
      (spark, dir) => {
        val base = eventsSilver(spark, dir)
        val m = ManifestLog.manifest(base, 0L)
        val snap = ManifestLog.read(spark, base, m)
        val Array(mn, mx) = snap.agg(min(col("ts_us")), max(col("ts_us"))).collect()
          .flatMap(r => Array(r.getLong(0), r.getLong(1)))
        val lo = mn + (mx - mn) / 4
        val hi = mn + (mx - mn) / 2
        val (keep, _) = ManifestLog.pruneRange(m, "ts_us", lo.toString, hi.toString)
        ManifestLog.read(spark, base, keep)
          .filter(col("ts_us").between(lo, hi))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("value_micros")).as("sum_value_micros"),
            min(col("ts_us")).as("min_ts_us"),
            max(col("ts_us")).as("max_ts_us"))
          .orderBy(col("event_type"))
      },
      Some(
        """WITH src AS (
          |  SELECT event_type, user_id,
          |         epoch_ns(ts) // 1000 AS ts_us,
          |         CAST(floor(value * 1000000) AS BIGINT) AS value_micros
          |  FROM events),
          |b AS (SELECT min(ts_us) AS mn, max(ts_us) AS mx FROM src),
          |band AS (SELECT mn + (mx - mn) // 4 AS lo,
          |                mn + (mx - mn) // 2 AS hi
          |         FROM b)
          |SELECT event_type,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
          |       CAST(sum(value_micros) AS BIGINT) AS sum_value_micros,
          |       CAST(min(ts_us) AS BIGINT) AS min_ts_us,
          |       CAST(max(ts_us) AS BIGINT) AS max_ts_us
          |FROM src, band
          |WHERE ts_us BETWEEN lo AND hi
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // q109: COST-BASED join reordering over MANIFEST tables — q87's CBO
    // story without the ANALYZE scan: the per-column NDV/null statistics
    // the optimizer needs were harvested AT COMMIT TIME (one O(batch)
    // aggregation in ManifestLog.stage, the production at-ingest stats
    // discipline) and reach Catalyst through the DSv2 Statistics
    // interface (sources/ManifestScan.estimateStatistics → row counts +
    // columnStats), so CostBasedJoinReorder moves the
    // mktsegment-filtered customer ⋈ orders join INNERMOST out of the
    // same worst-order SQL as q87 — on a 100 TB manifest table that is
    // join reordering from ONE metadata read, no table scan ever
    // ANALYZE'd. The reorder never changes results → the oracle is the
    // plain join; PlanShapeSpec pins the flip (selective join innermost
    // with CBO on, text order without).
    GraftQuery(
      "q109_manifest_cbo_reorder",
      "commit-time manifest stats drive CBO join reorder through the DSv2 scan (oracle)",
      (spark, dir) => {
        val (cB, oB, lB) = cboManifestTables(spark, dir)
        val s = spark.newSession()
        s.conf.set("spark.sql.cbo.enabled", "true")
        s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        def reg(base: String, view: String): Unit =
          s.read.format("graft-manifest").load(base).createOrReplaceTempView(view)
        reg(lB, "q109_li"); reg(oB, "q109_ord"); reg(cB, "q109_cust")
        s.sql(
          """SELECT o_orderpriority, count(*) AS cnt,
            |       sum(l_qty) AS sum_qty
            |FROM q109_li JOIN q109_ord ON l_orderkey = o_orderkey
            |             JOIN q109_cust ON o_custkey = c_custkey
            |WHERE c_mktsegment = 'BUILDING'
            |GROUP BY o_orderpriority
            |ORDER BY o_orderpriority""".stripMargin)
      },
      Some(
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
          |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |              JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // q110: FILTER → FILE PRUNING through the DSv2 connector — the
    // round-13 verdict's "reports stats but scans every data file"
    // seam closed: a plain spark.read.format("graft-manifest") with a
    // date-band filter now plans only the manifest entries whose
    // footer-harvested [min,max] intersects the band (ManifestScan's
    // SupportsPushDownFilters → keepEntry), from ONE metadata read and
    // ZERO parquet footer opens — where q96 called pruneRange by hand,
    // the connector user writes .filter() and gets the same skip. The
    // q95 residual discipline applies: every pushed filter is also
    // re-evaluated row-level, so pruning can never change results (edge
    // files hold out-of-band rows the residual drops). At 10⁶ files
    // this is the difference between one metadata read and 10⁶ footer
    // opens at plan time. ManifestScanSpec pins soundness (pruned scan
    // ≡ unpruned), effectiveness (most partitions skipped), and the
    // residual row-level filter.
    GraftQuery(
      "q110_manifest_dsv2_pruned_read",
      "date-band rollup through the DSv2 manifest scan: pushed filters prune files plan-time",
      (spark, dir) => {
        val base = ordersByDate(spark, dir)
        spark.read.format("graft-manifest").load(base)
          .filter(col("odate") >= "1995-01-01" && col("odate") <= "1995-06-30")
          .groupBy(substring(col("odate"), 1, 7).as("month"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("rev_cents"),
            countDistinct(col("priority")).as("n_prio"))
          .orderBy(col("month"))
      },
      Some(
        """WITH feed AS (
          |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS odate,
          |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
          |         o_orderpriority AS priority
          |  FROM orders)
          |SELECT substr(odate, 1, 7) AS month,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(cents) AS BIGINT) AS rev_cents,
          |       CAST(count(DISTINCT priority) AS BIGINT) AS n_prio
          |FROM feed
          |WHERE odate >= '1995-01-01' AND odate <= '1995-06-30'
          |GROUP BY 1
          |ORDER BY 1""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // q111: MERGE-ON-READ through the DSv2 connector — the other
    // round-13 verdict seam: ManifestScan used to reject
    // tombstone-carrying versions, so a reader of a q101/q104 table had
    // to fall back to ManifestLog.snapshot. Now the tombstone keys
    // (O(deleted keys) by the MoR write contract) load once on the
    // driver and ship to the per-file readers grouped by commit seq;
    // each reader drops rows a STRICTLY-newer tombstone names (the same
    // Iceberg sequence scoping ManifestLog.snapshot applies, so
    // same-commit re-inserts survive — spec-pinned). The table builds
    // once per JVM (v0 data + v1 tombstone band) and is read-only
    // after; the benched path is the connector MoR read itself. Oracle:
    // base minus the tombstoned band.
    GraftQuery(
      "q111_manifest_dsv2_mor_read",
      "tombstone-carrying snapshot read through the DSv2 scan (seq-scoped merge-on-read)",
      (spark, dir) => {
        val base = morScanTable(spark, dir)
        spark.read.format("graft-manifest").load(base)
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
          .orderBy(col("status"))
      },
      Some(
        """WITH base AS (
          |  SELECT o_orderkey AS k,
          |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
          |         o_orderstatus AS status
          |  FROM orders),
          |b AS (SELECT min(k) AS mn, max(k) AS mx FROM base),
          |band AS (SELECT mn + (mx - mn) // 5 AS lo,
          |                mn + (mx - mn) // 5 + (mx - mn) // 30 AS hi
          |         FROM b)
          |SELECT status,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(cents) AS BIGINT) AS sum_cents,
          |       CAST(min(k) AS BIGINT) AS min_k,
          |       CAST(max(k) AS BIGINT) AS max_k
          |FROM base, band
          |WHERE NOT (k BETWEEN lo AND hi)
          |GROUP BY status
          |ORDER BY status""".stripMargin)
    )
  )

  /** q111's merge-on-read table: v0 = the (k, cents, status) orders
    * projection (sorted, 16 files, footer stats), v1 = ONE tombstone
    * file deleting a closed-form key band (one fifth into the key
    * space, width 1/30 of it). Built once per (JVM, dataset) and
    * READ-ONLY after — unlike q97/q101's bases there is no per-run
    * reset, so the entry benches exactly the connector's MoR read. */
  private[graft] def morScanTable(spark: SparkSession, dir: String): String =
    TempLayouts.cached(
      "manifest_orders_morscan#" + new java.io.File(dir).getCanonicalPath,
      "graft_manifest_morscan_") { base =>
      val src = Tables(spark, dir).orders.select(
        col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderstatus").as("status"))
      ManifestLog.commitAppend(spark, base, src,
        statsCols = Seq("k"), sortCol = Some("k"), files = 16): Unit
      val Array(mn, mx) = src.agg(min(col("k")), max(col("k"))).collect()
        .flatMap(r => Array(r.getLong(0), r.getLong(1)))
      val lo = mn + (mx - mn) / 5L
      val hi = lo + (mx - mn) / 30L
      ManifestLog.commitDelete(spark, base,
        src.filter(col("k").between(lo, hi)).select(col("k")).distinct(),
        statsCols = Seq("k")): Unit
    }

  /** q109's three manifest tables (customer/orders/lineitem star
    * projections), committed ONCE per (JVM, dataset) with footer stats
    * AND per-file NDV on the join/filter columns — the inputs
    * [[graft.sources.ManifestScan]] surfaces to the CBO. Returns
    * (customerBase, ordersBase, lineitemBase). Read-only after build. */
  def cboManifestTables(spark: SparkSession, dir: String): (String, String, String) = {
    val canon = new java.io.File(dir).getCanonicalPath
    val c = TempLayouts.cached(s"manifest_cbo_cust#$canon", "graft_manifest_cboc_") { base =>
      ManifestLog.commitAppend(spark, base,
        Tables(spark, dir).customer.select(col("c_custkey"), col("c_mktsegment")),
        statsCols = Seq("c_custkey"), sortCol = Some("c_custkey"), files = 4,
        ndvCols = Seq("c_custkey", "c_mktsegment")): Unit
    }
    val o = TempLayouts.cached(s"manifest_cbo_ord#$canon", "graft_manifest_cboo_") { base =>
      ManifestLog.commitAppend(spark, base,
        Tables(spark, dir).orders.select(
          col("o_orderkey"), col("o_custkey"), col("o_orderpriority")),
        statsCols = Seq("o_orderkey"), sortCol = Some("o_orderkey"), files = 8,
        ndvCols = Seq("o_orderkey", "o_custkey", "o_orderpriority")): Unit
    }
    val l = TempLayouts.cached(s"manifest_cbo_li#$canon", "graft_manifest_cbol_") { base =>
      ManifestLog.commitAppend(spark, base,
        Tables(spark, dir).lineitem.select(
          col("l_orderkey"),
          floor(col("l_quantity")).cast("long").as("l_qty")),
        statsCols = Seq("l_orderkey"), sortCol = Some("l_orderkey"), files = 16,
        ndvCols = Seq("l_orderkey")): Unit
    }
    (c, o, l)
  }

  /** q103's silver table: the bronze JSONL feed (written through the
    * DSv2 sink) read back through the DSv2 scan and committed to the
    * manifest format sorted by event time with stats — the
    * bronze→silver leg of a medallion pipeline, built once per
    * (JVM, dataset). */
  private def eventsSilver(spark: SparkSession, dir: String): String = {
    val canon = new java.io.File(dir).getCanonicalPath
    val bronze = TempLayouts.cached(s"q103_bronze#$canon", "graft_q103_bronze_") { o =>
      Tables(spark, dir).events
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"),
          floor(col("value") * 1e6).cast("long").as("value_micros"))
        .write.format("graft.sources.JsonlSource").mode("overwrite").save(o)
    }
    TempLayouts.cached(s"q103_silver#$canon", "graft_q103_silver_") { base =>
      val feed = spark.read.format("graft.sources.JsonlSource")
        .schema("event_id LONG, user_id LONG, event_type STRING, " +
          "ts_us LONG, value_micros LONG")
        .load(bronze)
      ManifestLog.commitAppend(spark, base, feed,
        statsCols = Seq("ts_us"), sortCol = Some("ts_us"), files = 12): Unit
    }
  }

  /** Execute the q97 CoW merge against `base`'s latest version and read
    * back the new snapshot. Split out so ManifestLogSpec drives the same
    * path the catalog entry runs. Returns the merged snapshot frame.
    *
    * The update/insert batch is closed-form from the table itself (a 5%
    * key band one third into the key space): updates bump cents by 100
    * and set status 'X'; inserts re-land the band's rows at k + 2·max(k)
    * with status 'N' (collision-free by construction). */
  /** q104's hybrid MERGE against version 0 of a `(k, cents, status)`
    * table: update rows in a closed-form key band (half-way into the
    * key space, width 1/12 of it) to (cents + 200, status 'M'), with
    * the per-file strategy chosen from MANIFEST STATS ONLY:
    *
    *   coverage(file) = |[min_k,max_k] ∩ band| / |[min_k,max_k]|
    *   coverage ≥ 0.5 → rewrite the file (CoW, q97's leg)
    *   coverage <  0.5 → tombstone its band keys + append the updated
    *                     versions (MoR, q101's leg, seq-scoped)
    *
    * Returns (snapshot of the merged version, #rewritten, #tombstoned
    * files) — the spec asserts the structural split, the entry only the
    * state. Resets the shared base to version 0 first (bench-loop
    * hygiene, as [[mergedSnapshot]]). */
  def hybridMergeSnapshot(spark: SparkSession, base: String): (DataFrame, Int, Int) = {
    ManifestLog.resetToVersion(base, 0L)
    val m = ManifestLog.manifest(base, 0L)
    val snap = ManifestLog.read(spark, base, m)
    val Array(mn, mx) = snap.agg(min(col("k")), max(col("k"))).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    val lo = mn + (mx - mn) / 2
    val hi = lo + (mx - mn) / 12
    val (affected, untouched) = ManifestLog.pruneRange(m, "k", lo.toString, hi.toString)
    // the stats-only strategy decision: how much of the file's key range
    // the band covers (a file without usable stats lands in `untouched`
    // only if pruneRange proved it irrelevant; if kept it has stats here
    // by construction of the commit path, but default to MoR — the
    // cheap, always-correct leg — if they were ever absent)
    def coverage(e: ManifestLog.ManifestEntry): Double =
      e.stats.get("k") match {
        case Some(ManifestLog.ColStat(_, Some(mnS), Some(mxS), _)) =>
          val fMn = mnS.toLong; val fMx = mxS.toLong
          val span = math.max(1L, fMx - fMn)
          val overlap = math.min(hi, fMx) - math.max(lo, fMn)
          math.max(0.0, overlap.toDouble) / span.toDouble
        case _ => 0.0
      }
    val (hot, cold) = affected.partition(coverage(_) >= 0.5)
    def updated(df: DataFrame): DataFrame =
      df.filter(col("k").between(lo, hi))
        .select(col("k"), (col("cents") + 200).as("cents"), lit("M").as("status"))
    // CoW leg: hot files rewritten in full (stale versions out, updated in)
    val rewritten =
      if (hot.isEmpty) Seq.empty[ManifestLog.ManifestEntry]
      else {
        val hotDf = ManifestLog.read(spark, base, hot)
        ManifestLog.stage(spark, base, "v1-rw",
          hotDf.filter(!col("k").between(lo, hi)).unionByName(updated(hotDf)),
          Seq("k"), Some("k"), files = math.max(1, hot.size))
          .map(_.copy(seq = 1L))
      }
    // MoR leg: cold files untouched on disk — their band keys tombstone
    // (seq 1 > data seq 0) and the updated versions append at seq 1, so
    // the tombstone never swallows the re-inserts
    val (tomb, inserted) =
      if (cold.isEmpty)
        (Seq.empty[ManifestLog.ManifestEntry], Seq.empty[ManifestLog.ManifestEntry])
      else {
        val coldDf = ManifestLog.read(spark, base, cold)
        val t = ManifestLog.stage(spark, base, "v1-del",
            coldDf.filter(col("k").between(lo, hi)).select(col("k")).distinct(),
            Seq("k"))
          .map(_.copy(kind = "delete", seq = 1L))
        val ins = ManifestLog.stage(spark, base, "v1-ins", updated(coldDf),
            Seq("k"), Some("k"))
          .map(_.copy(seq = 1L))
        (t, ins)
      }
    val v = ManifestLog.commitEntries(base,
      untouched ++ cold ++ rewritten ++ inserted ++ tomb)
    (ManifestLog.snapshot(spark, base, v), hot.size, cold.size)
  }

  def mergedSnapshot(spark: SparkSession, base: String): DataFrame = {
    // always merge against VERSION 0 (the original table): re-running the
    // entry replays the same logical batch, so its output is fixed while
    // each run still exercises the full CoW path into a fresh version.
    // Roll superseded run artifacts off disk first — the previous run's
    // rewritten/inserted files were consumed when its result materialized,
    // so a bench loop stays O(1) in versions and data files.
    ManifestLog.resetToVersion(base, 0L)
    val head = ManifestLog.latest(base).get
    val m = ManifestLog.manifest(base, 0L)
    val snap = ManifestLog.read(spark, base, m)
    // one 2-value driver scalar (the q09/IvfIndex bounded-collect class):
    // the band bounds parameterize the manifest prune below
    val Array(mn, mx) = snap.agg(min(col("k")), max(col("k"))).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    val lo = mn + (mx - mn) / 3
    val hi = lo + (mx - mn) / 20
    // pruneRange keeps files that MIGHT match — for a merge those are the
    // AFFECTED files; the pruned-away remainder is reused by reference
    val (affected, keep) = ManifestLog.pruneRange(m, "k", lo.toString, hi.toString)
    val upd = snap.filter(col("k").between(lo, hi))
      .select(col("k"), (col("cents") + 100).as("cents"), lit("X").as("status"))
    val ins = snap.filter(col("k").between(lo, hi))
      .select((col("k") + lit(2L * mx)).as("k"), col("cents"), lit("N").as("status"))
    val rewritten = ManifestLog.read(spark, base, affected)
      .join(upd.select("k"), Seq("k"), "left_anti")
      .unionByName(upd)
    val tag = s"v${head + 1L}"
    val newEntries =
      ManifestLog.stage(spark, base, s"$tag-rw", rewritten, Seq("k"), Some("k"),
        files = math.max(1, affected.size)) ++
        ManifestLog.stage(spark, base, s"$tag-ins", ins, Seq("k"), Some("k"), files = 1)
    val v1 = ManifestLog.commitEntries(base, keep ++ newEntries)
    ManifestLog.snapshot(spark, base, v1)
  }
}
