package graft

import org.apache.spark.sql.functions._

import graft.io.{ManifestLog, ManifestQueries, TempLayouts}

/** The DSv2 manifest scan's round-14 halves: filter→file pruning
  * (SupportsPushDownFilters folding comparisons into manifest-entry
  * skipping — one metadata read, zero footer opens) and merge-on-read
  * snapshots (tombstone keys applied per-file under sequence scoping,
  * exactly as [[ManifestLog.snapshot]]).
  */
class ManifestScanSpec extends SparkSpecBase {
  import testImplicits._

  /** A fresh 8-file sorted manifest table over k = 0..799 with footer
    * stats on k — each file owns a contiguous 100-key slice. */
  private def sortedTable(): String = {
    val base = TempLayouts.scratch("graft_mscan_spec_")
    val df = spark.range(800).select(
      col("id").as("k"), (col("id") * 3).as("v"),
      concat(lit("s"), pmod(col("id"), lit(4))).as("tag"))
    ManifestLog.commitAppend(spark, base, df,
      statsCols = Seq("k"), sortCol = Some("k"), files = 8): Unit
    base
  }

  private def scanDescr(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pushed comparisons prune manifest files plan-time; results identical to unpruned") {
    val base = sortedTable()
    val pruned = spark.read.format("graft-manifest").load(base)
      .filter(col("k") >= 250L && col("k") <= 349L)
    val plan = scanDescr(pruned)
    // pushdown visible, and most files skipped from the manifest alone
    assert(plan.contains("GreaterThanOrEqual(k,250)") &&
      plan.contains("LessThanOrEqual(k,349)"), plan)
    val m = """\((\d+) files, (\d+) pruned""".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"no prune narration in:\n$plan")
    val (kept, skipped) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(kept + skipped == 8 && kept <= 3 && skipped >= 5,
      s"expected ≤3 of 8 files kept, got $kept kept / $skipped pruned")
    // soundness: identical to the unfiltered-scan-then-filter answer
    val expect = ManifestLog.snapshot(spark, base, 0L)
      .filter(col("k").between(250L, 349L))
      .agg(count(lit(1)), sum(col("v"))).collect().head
    val got = pruned.agg(count(lit(1)), sum(col("v"))).collect().head
    assert(got == expect, s"$got vs $expect")
    // residual discipline: the row-level filter still applies — the kept
    // edge files hold out-of-band rows that must not leak
    assert(pruned.count() == 100L)
  }

  test("equality and string-ordered pushdown prune; no-stats columns prune nothing") {
    val base = sortedTable()
    val eq = spark.read.format("graft-manifest").load(base).filter(col("k") === 777L)
    val m = """\((\d+) files, (\d+) pruned""".r.findFirstMatchIn(scanDescr(eq))
    assert(m.get.group(1).toInt == 1 && m.get.group(2).toInt == 7, scanDescr(eq))
    assert(eq.select(col("v")).collect().map(_.getLong(0)).toSeq == Seq(2331L))
    // `tag` carries no manifest stats → conservative: nothing pruned,
    // answer still exact via the residual
    val noStats = spark.read.format("graft-manifest").load(base)
      .filter(col("tag") === "s2")
    val m2 = """\((\d+) files, (\d+) pruned""".r.findFirstMatchIn(scanDescr(noStats))
    assert(m2.get.group(1).toInt == 8 && m2.get.group(2).toInt == 0, scanDescr(noStats))
    assert(noStats.count() == 200L)
  }

  test("MoR snapshot reads through the connector: tombstones apply under seq scoping") {
    val base = TempLayouts.scratch("graft_mscan_mor_")
    ManifestLog.commitAppend(spark, base,
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "s"),
      Seq("k"), Some("k")): Unit
    // v1: tombstone k ∈ {2, 3}; v2: re-insert k=3 with a NEW value —
    // the seq-3-data outranks the seq-2 tombstone, so it must survive
    ManifestLog.commitDelete(spark, base, Seq(2L, 3L).toDF("k")): Unit
    ManifestLog.commitAppend(spark, base, Seq((3L, "c2")).toDF("k", "s"), Seq("k")): Unit
    val viaConnector = spark.read.format("graft-manifest").load(base)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("s"))).toSet
    val viaSnapshot = ManifestLog.snapshot(spark, base, ManifestLog.latest(base).get)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("s"))).toSet
    assert(viaConnector == Set((1L, "a"), (4L, "d"), (3L, "c2")), viaConnector)
    assert(viaConnector == viaSnapshot)
    // column pruning that drops the tombstone key column still deletes:
    // the key joins the parse schema, never the output
    val sOnly = spark.read.format("graft-manifest").load(base)
      .select(col("s")).collect().map(_.getString(0)).toSet
    assert(sOnly == Set("a", "d", "c2"), sOnly)
    // historical versions read as committed
    assert(spark.read.format("graft-manifest").option("version", 0L).load(base)
      .count() == 4L)
    assert(spark.read.format("graft-manifest").option("version", 1L).load(base)
      .count() == 2L)
  }

  test("q111's table: connector MoR read equals ManifestLog.snapshot and the closed-form band") {
    val dir = sf0001
    val base = ManifestQueries.morScanTable(spark, dir)
    val v = ManifestLog.latest(base).get
    val viaSnapshot = ManifestLog.snapshot(spark, base, v)
      .agg(count(lit(1)), sum(col("cents"))).collect().head
    val viaConnector = spark.read.format("graft-manifest").load(base)
      .agg(count(lit(1)), sum(col("cents"))).collect().head
    assert(viaConnector == viaSnapshot, s"$viaConnector vs $viaSnapshot")
    // the tombstone really deleted something
    val v0Rows = ManifestLog.read(spark, base, ManifestLog.manifest(base, 0L)).count()
    assert(viaConnector.getLong(0) < v0Rows)
  }

  test("pushdown composes with MoR: pruned files AND tombstoned rows both drop") {
    val base = sortedTable()
    // tombstone a band that overlaps the filter band
    ManifestLog.commitDelete(spark, base,
      spark.range(300, 320).select(col("id").as("k"))): Unit
    val df = spark.read.format("graft-manifest").load(base)
      .filter(col("k") >= 250L && col("k") <= 349L)
    val plan = scanDescr(df)
    val m = """\((\d+) files, (\d+) pruned, (\d+) tombstones""".r.findFirstMatchIn(plan)
    assert(m.isDefined && m.get.group(3).toInt == 1, plan)
    assert(m.get.group(1).toInt <= 3, plan)
    assert(df.count() == 80L)
    assert(df.agg(sum(col("k"))).collect().head.getLong(0) ==
      (250L to 349L).sum - (300L to 319L).sum)
  }
}
