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
  private def checkpointsDir(base: String) = new java.io.File(base, "_checkpoints")

  private def markerVersions(base: String): Seq[Long] =
    Option(commitsDir(base).listFiles()).getOrElse(Array.empty[java.io.File])
      .flatMap(f => f.getName.toLongOption).toSeq

  /** The newest metadata checkpoint: (head id, every version id it
    * summarizes). Stray `.tmp` files (a checkpoint writer that crashed
    * before its atomic rename) parse to no id and are ignored. */
  private def latestCheckpoint(base: String): Option[(Long, Seq[Long])] =
    Option(checkpointsDir(base).listFiles()).getOrElse(Array.empty[java.io.File])
      .flatMap(f => f.getName.toLongOption.map(_ -> f))
      .sortBy(-_._1).headOption
      .map { case (id, f) =>
        val ids = java.nio.file.Files.readAllLines(f.toPath)
          .toArray(Array.empty[String]).toSeq
          .flatMap(_.trim.toLongOption)
        (id, ids)
      }

  /** Version ids with a published marker OR listed in the newest
    * metadata checkpoint, newest first. With periodic [[checkpoint]] +
    * [[vacuumMarkers]] this listing is O(1 + Δ) — one checkpoint file
    * plus only the markers newer than it — instead of O(#versions)
    * marker files for the table's whole history (the reason every
    * log-structured format checkpoints its log). */
  def committedVersions(base: String): Seq[Long] =
    (markerVersions(base) ++
      latestCheckpoint(base).map(_._2).getOrElse(Seq.empty))
      .distinct.sorted.reverse

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

  // --- metadata checkpointing -------------------------------------------

  /** Summarize the full committed-version history into ONE checkpoint
    * file, so discovery stops being O(#versions): after a checkpoint at
    * head H, [[vacuumMarkers]] may delete every marker ≤ H and readers
    * resolve from the checkpoint plus only the Δ markers committed
    * since — the log-compaction move of every production table format
    * (public Delta/Iceberg designs), in one file and one atomic rename.
    *
    * Write protocol mirrors [[commit]]'s publish-last discipline: the
    * id list lands in `_checkpoints/<H>.tmp` (invisible — discovery
    * ignores non-numeric names), then one ATOMIC_MOVE rename publishes
    * `_checkpoints/<H>`. A crash before the rename leaves a `.tmp`
    * stray that never resolves. Checkpoints are themselves versioned by
    * head id; discovery reads only the newest, so an old checkpoint is
    * dead weight, not a hazard. Returns the checkpointed head, or None
    * on an empty log. */
  def checkpoint(base: String): Option[Long] =
    committedVersions(base).maxOption.map { head =>
      val cd = checkpointsDir(base)
      cd.mkdirs()
      val tmp = new java.io.File(cd, s"$head.tmp").toPath
      java.nio.file.Files.write(tmp,
        committedVersions(base).sorted.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, new java.io.File(cd, head.toString).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      head
    }

  /** Delete every marker the newest checkpoint already summarizes. Safe
    * at any time: discovery is the UNION of checkpoint and markers, so
    * a vacuum racing a reader can only remove redundancy. Removability
    * is membership in the checkpoint's PARSED id list — never an
    * `id <= head` range test — because a version can legitimately gain
    * its marker with an id BELOW the checkpoint head after the
    * checkpoint was written (the idempotent-replay path of
    * [[commit]](base, oldId), or a crashed [[commitNextAtomic]]
    * claimant replaying into its hole); a range vacuum would delete
    * that marker while the checkpoint never listed it, making a
    * committed version permanently undiscoverable. Data dirs are
    * untouched — vacuum compacts metadata, not history; every
    * checkpointed version stays readable ([[snapshot]]). Returns the
    * number of markers removed. */
  def vacuumMarkers(base: String): Int =
    latestCheckpoint(base) match {
      case None => 0
      case Some((_, summarized)) =>
        val ids = summarized.toSet
        val removable = Option(commitsDir(base).listFiles())
          .getOrElse(Array.empty[java.io.File])
          .filter(_.getName.toLongOption.exists(ids.contains))
        removable.foreach(f => java.nio.file.Files.deleteIfExists(f.toPath))
        removable.length
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
