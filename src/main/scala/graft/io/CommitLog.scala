package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transactional-table stand-in: a versioned-directory commit
  * log with atomic multi-partition commits and snapshot isolation — the
  * ONE shared module behind every "commit a new table state" surface in
  * the engine (q44's foreachBatch upsert, q52's compaction swap, q68's
  * time travel), which previously each hand-rolled the same discipline.
  *
  * Layout under a table root `base`:
  * {{{
  *   base/v<id>/...            data files (any layout the writer chose,
  *                             including hive partition dirs)
  *   base/_commits/<id>        zero-byte marker, created AFTER the data
  *                             write completes
  * }}}
  *
  * The commit protocol is the same one every log-structured table format
  * (public Delta/Iceberg papers) builds on:
  *  1. data lands ENTIRELY in the new version dir — across however many
  *     partition directories the writer produces — while the version is
  *     invisible to readers;
  *  2. one marker-file creation ([[java.nio.file.Files.createFile]], an
  *     atomic filesystem operation) publishes it.
  * A crash anywhere before step 2 leaves a half-written dir that no
  * reader ever resolves (discovery consults ONLY the marker directory);
  * re-running the same version id overwrites the orphan and re-publishes
  * — the idempotent-replay contract q44's restart recovery relies on.
  *
  * Snapshot isolation: committed version dirs are NEVER mutated — a new
  * state is always a NEW version id — so a reader that resolved version
  * N keeps reading exactly N's files no matter how many commits land
  * after it (CommitLogSpec's two-reader test pins this), and historical
  * versions stay readable for time travel / reproducible reports (q68).
  *
  * At 100 TB: the markers are O(1)-sized and the discovery listing is
  * O(versions) — never O(files); a real format adds manifest reuse so
  * snapshots share unchanged data files, which this stand-in trades away
  * (each version is self-contained) to stay a pure-Spark library with
  * no side metadata service. The part under test — pointer-move
  * publication instead of in-place mutation — is identical.
  */
object CommitLog {

  private def commitsDir(base: String) = new java.io.File(base, "_commits")

  /** Version ids with a published marker, newest first. */
  def committedVersions(base: String): Seq[Long] =
    Option(commitsDir(base).listFiles()).getOrElse(Array.empty[java.io.File])
      .flatMap(f => f.getName.toLongOption)
      .toSeq.sorted.reverse

  def latestCommitted(base: String): Option[Long] =
    committedVersions(base).headOption

  /** Newest committed version strictly below `id` — the merge-input
    * lookup of an idempotent upsert loop (a batch replayed after a crash
    * re-derives the same predecessor from DISK, never from JVM state). */
  def committedBefore(base: String, id: Long): Option[Long] =
    committedVersions(base).find(_ < id)

  /** Path of a version's data dir (valid for committed versions). */
  def versionPath(base: String, id: Long): String =
    s"$base/v$id"

  /** Commit version `id`: run the caller's writer against the (private)
    * version dir, then publish atomically. The writer chooses layout —
    * partitionBy, repartition, options — the log owns only versioning.
    * Re-committing an existing id overwrites its data and keeps the
    * marker (idempotent replay); the data overwrite is safe because an
    * id is re-written only by the SAME logical batch producing the same
    * content (the foreachBatch contract). */
  def commit(base: String, id: Long)(write: String => Unit): Long = {
    write(versionPath(base, id))
    val cd = commitsDir(base)
    cd.mkdirs()
    val marker = new java.io.File(cd, id.toString).toPath
    if (!java.nio.file.Files.exists(marker))
      java.nio.file.Files.createFile(marker)
    id
  }

  /** Commit as the next version id (latest + 1, or 0 on an empty log). */
  def commitNext(base: String)(write: String => Unit): Long =
    commit(base, latestCommitted(base).map(_ + 1L).getOrElse(0L))(write)

  // --- optimistic concurrency -------------------------------------------

  private def claimsDir(base: String) = new java.io.File(base, "_claims")

  private def claimedVersions(base: String): Seq[Long] =
    Option(claimsDir(base).listFiles()).getOrElse(Array.empty[java.io.File])
      .flatMap(f => f.getName.toLongOption).toSeq

  /** Optimistic multi-writer commit — the concurrent-ingest story of a
    * real table format, in the same two-file-system-primitive budget:
    *  1. CLAIM the head version id with an exclusive marker-file create
    *     in `base/_claims/` ([[java.nio.file.Files.createFile]] throws
    *     for the loser — the atomic arbiter);
    *  2. the claim winner alone runs its writer and publishes through
    *     [[commit]]; losers retry against the new head.
    * Claims and commits are separate directories on purpose: a claim
    * reserves an id BEFORE any data exists, so readers (which consult
    * only `_commits/`) never see a version mid-write, and a writer that
    * crashes between claim and publish leaves a permanently-skipped id
    * — a hole in the sequence, not a torn table ([[committedBefore]]
    * and [[latestCommitted]] are hole-tolerant by construction).
    *
    * Conflict semantics are version-level last-claim-wins: two writers
    * racing produce two consecutive versions in arbitration order.
    * Content-level conflict validation (abort if a concurrent commit
    * touched the same rows) is a format-policy layer above this
    * primitive, same as in the public table-format designs. */
  def commitNextAtomic(base: String, maxAttempts: Int = 64)
      (write: String => Unit): Long = {
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      val head = (claimedVersions(base) ++ committedVersions(base))
        .maxOption.map(_ + 1L).getOrElse(0L)
      val cd = claimsDir(base)
      cd.mkdirs()
      val claimed =
        try { java.nio.file.Files.createFile(new java.io.File(cd, head.toString).toPath); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      if (claimed) return commit(base, head)(write)
      // lost the race — re-resolve the head and try again
    }
    throw new IllegalStateException(
      s"commitNextAtomic: gave up after $maxAttempts contended attempts on $base")
  }

  /** Read one committed snapshot. The returned frame's scan is bound to
    * this version's directory — later commits never change what it
    * reads (snapshot isolation). */
  def snapshot(spark: SparkSession, base: String, id: Long): DataFrame = {
    require(committedVersions(base).contains(id),
      s"version $id is not committed under $base")
    spark.read.parquet(versionPath(base, id))
  }

  def snapshotLatest(spark: SparkSession, base: String): Option[DataFrame] =
    latestCommitted(base).map(snapshot(spark, base, _))
}
