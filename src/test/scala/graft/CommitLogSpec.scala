package graft

import org.apache.spark.sql.functions._

import graft.io.CommitLog

/** The commit-log contract behind q44/q52/q68: atomic publication,
  * snapshot isolation across concurrent commits, idempotent replay,
  * and marker-gated discovery. */
class CommitLogSpec extends SparkSpecBase {
  import testImplicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_commitlog_").toString

  test("two-reader isolation: a reader resolved on v0 keeps reading v0 while v1 commits") {
    val base = freshTable()
    try {
      CommitLog.commitNext(base) { p =>
        Seq((1L, "a"), (2L, "b")).toDF("k", "s").write.parquet(p)
      }
      // reader A binds to version 0 BEFORE the next commit...
      val readerA = CommitLog.snapshot(spark, base, 0L)
      val before = readerA.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      // ...v1 lands with different content (multi-partition layout)...
      CommitLog.commitNext(base) { p =>
        Seq((1L, "a2"), (3L, "c")).toDF("k", "s")
          .write.partitionBy("k").parquet(p)
      }
      // ...reader A re-evaluates and still sees exactly v0's rows,
      // while a reader resolving NOW gets v1
      val after = readerA.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(after.toSeq === before.toSeq)
      assert(after.toSeq === Seq((1L, "a"), (2L, "b")))
      // (k travels as a hive partition dir in v1, so it reads back via
      // partition-type inference — normalize with an explicit cast)
      val latest = CommitLog.snapshotLatest(spark, base).get
        .select(col("k").cast("long").as("k"), col("s")).orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(latest.toSeq === Seq((1L, "a2"), (3L, "c")))
      // time travel: v0 remains explicitly addressable
      assert(CommitLog.committedVersions(base) === Seq(1L, 0L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("atomicity: a version is invisible until its marker lands; a crashed write never surfaces") {
    val base = freshTable()
    try {
      CommitLog.commitNext(base) { p =>
        Seq((1L, 10L)).toDF("k", "v").write.parquet(p)
      }
      // simulate a crash mid-commit: data dir written, marker never
      // created (the writer function throws after the data lands)
      intercept[RuntimeException] {
        CommitLog.commit(base, 7L) { p =>
          Seq((9L, 90L)).toDF("k", "v").write.parquet(p)
          throw new RuntimeException("crash between data write and marker")
        }
      }
      assert(new java.io.File(CommitLog.versionPath(base, 7L)).isDirectory,
        "orphan data dir should exist (the crash came after the write)")
      assert(CommitLog.committedVersions(base) === Seq(0L),
        "the half-committed version must stay invisible")
      assert(CommitLog.latestCommitted(base) === Some(0L))
      intercept[IllegalArgumentException] {
        CommitLog.snapshot(spark, base, 7L)
      }
      // replaying the same version id completes the commit idempotently
      CommitLog.commit(base, 7L) { p =>
        Seq((9L, 90L)).toDF("k", "v").write.mode("overwrite").parquet(p)
      }
      assert(CommitLog.committedVersions(base) === Seq(7L, 0L))
      assert(CommitLog.snapshot(spark, base, 7L).collect().map(_.getLong(0)).toSeq === Seq(9L))
      // commitNext continues from the highest committed id
      val id = CommitLog.commitNext(base) { p =>
        Seq((5L, 50L)).toDF("k", "v").write.parquet(p)
      }
      assert(id === 8L)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("optimistic concurrency: racing writers get distinct versions, none torn") {
    val base = freshTable()
    try {
      CommitLog.commitNext(base) { p =>
        Seq((0L, "seed")).toDF("k", "who").write.parquet(p)
      }
      // 8 writers race commitNextAtomic concurrently; the claim file is
      // the arbiter, so every writer must land a DISTINCT version and
      // every committed version must hold exactly its writer's rows
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      val ids = Await.result(Future.sequence((1 to 8).map { w =>
        Future {
          CommitLog.commitNextAtomic(base) { p =>
            Seq((w.toLong, s"writer$w")).toDF("k", "who").write.parquet(p)
          }
        }
      }), 120.seconds)
      assert(ids.distinct.length === 8, s"version collision: $ids")
      assert(!ids.contains(0L), "a racer stole the seed version")
      // log integrity: seed + 8 racer versions, each readable and intact
      val committed = CommitLog.committedVersions(base)
      assert(committed.length === 9)
      ids.foreach { id =>
        val rows = CommitLog.snapshot(spark, base, id)
          .collect().map(r => (r.getLong(0), r.getString(1)))
        assert(rows.length === 1 && rows.head._2 === s"writer${rows.head._1}",
          s"version $id torn or mixed: ${rows.toSeq}")
      }
      // a crashed claim (claim exists, no data/marker) leaves a hole the
      // readers tolerate
      java.nio.file.Files.createFile(
        new java.io.File(new java.io.File(base, "_claims"), "99").toPath)
      val next = CommitLog.commitNextAtomic(base) { p =>
        Seq((100L, "after-hole")).toDF("k", "who").write.parquet(p)
      }
      assert(next === 100L, s"head must skip past the crashed claim, got $next")
      assert(CommitLog.latestCommitted(base) === Some(100L))
      assert(CommitLog.committedBefore(base, 100L) === Some(ids.max))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("committedBefore resolves the newest predecessor from disk (the q44 merge lookup)") {
    val base = freshTable()
    try {
      for (i <- Seq(0L, 2L, 5L))
        CommitLog.commit(base, i) { p =>
          Seq((i, i)).toDF("k", "v").write.parquet(p)
        }
      assert(CommitLog.committedBefore(base, 0L) === None)
      assert(CommitLog.committedBefore(base, 2L) === Some(0L))
      assert(CommitLog.committedBefore(base, 3L) === Some(2L))
      assert(CommitLog.committedBefore(base, 99L) === Some(5L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("checkpoint + vacuum: discovery unchanged, marker count drops to the delta") {
    val base = freshTable()
    try {
      def markerCount: Int =
        Option(new java.io.File(base, "_commits").listFiles())
          .map(_.length).getOrElse(0)
      (0 to 4).foreach { i =>
        CommitLog.commitNext(base) { p =>
          Seq((i.toLong, s"v$i")).toDF("k", "s").write.parquet(p)
        }
      }
      val before = CommitLog.committedVersions(base)
      assert(before === Seq(4L, 3L, 2L, 1L, 0L) && markerCount === 5)
      // checkpoint the history, drop the summarized markers
      assert(CommitLog.checkpoint(base) === Some(4L))
      assert(CommitLog.vacuumMarkers(base) === 5 && markerCount === 0)
      // every discovery surface resolves exactly as before the vacuum
      assert(CommitLog.committedVersions(base) === before)
      assert(CommitLog.latestCommitted(base) === Some(4L))
      assert(CommitLog.committedBefore(base, 3L) === Some(2L))
      // checkpointed history stays readable (vacuum compacts metadata,
      // never data)
      assert(CommitLog.snapshot(spark, base, 1L).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "v1")))
      // new commits after the vacuum are the O(Δ) marker tail...
      (5 to 6).foreach { i =>
        CommitLog.commitNext(base) { p =>
          Seq((i.toLong, s"v$i")).toDF("k", "s").write.parquet(p)
        }
      }
      assert(markerCount === 2)
      assert(CommitLog.committedVersions(base) ===
        Seq(6L, 5L, 4L, 3L, 2L, 1L, 0L))
      // ...and a second checkpoint folds checkpoint + delta together
      assert(CommitLog.checkpoint(base) === Some(6L))
      assert(CommitLog.vacuumMarkers(base) === 2)
      assert(CommitLog.committedVersions(base) ===
        Seq(6L, 5L, 4L, 3L, 2L, 1L, 0L))
      assert(CommitLog.snapshotLatest(spark, base).get.collect()
        .map(_.getString(1)).toSeq === Seq("v6"))
      // a crashed checkpoint writer (stray .tmp) is invisible
      val cd = new java.io.File(base, "_checkpoints"); cd.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(cd, "999.tmp").toPath, "999".getBytes("UTF-8"))
      assert(CommitLog.latestCommitted(base) === Some(6L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("vacuum never eats a marker the checkpoint does not list (replay into a hole)") {
    // The hazard: commitNextAtomic claimants can crash between claim and
    // publish, leaving an id HOLE below the head; the crashed batch may
    // later replay via commit(base, oldId) — AFTER a checkpoint at a
    // higher head was already written. A range-based vacuum (id <= head)
    // would delete that replayed marker even though the checkpoint never
    // summarized it, making a committed version permanently
    // undiscoverable. Vacuum must test MEMBERSHIP in the checkpoint's
    // parsed id list instead.
    val base = freshTable()
    try {
      import java.io.File
      Seq(0L, 1L, 3L).foreach { i =>                 // hole at id 2
        CommitLog.commit(base, i) { p =>
          Seq((i, s"v$i")).toDF("k", "s").write.parquet(p)
        }
      }
      assert(CommitLog.checkpoint(base) === Some(3L)) // summarizes {0,1,3}
      // the crashed claimant replays into its hole, below the head
      CommitLog.commit(base, 2L) { p =>
        Seq((2L, "v2")).toDF("k", "s").write.parquet(p)
      }
      assert(CommitLog.vacuumMarkers(base) === 3)     // only {0,1,3} markers
      // the replayed version stays discoverable and readable
      assert(CommitLog.committedVersions(base) === Seq(3L, 2L, 1L, 0L))
      assert(CommitLog.snapshot(spark, base, 2L).collect()
        .map(_.getString(1)).toSeq === Seq("v2"))
      def markers: Set[String] =
        Option(new File(base, "_commits").listFiles())
          .getOrElse(Array.empty[File]).map(_.getName).toSet
      assert(markers === Set("2"))
      // the next checkpoint folds the replay in; only then is it vacuumable
      assert(CommitLog.checkpoint(base) === Some(3L))
      assert(CommitLog.vacuumMarkers(base) === 1 && markers.isEmpty)
      assert(CommitLog.committedVersions(base) === Seq(3L, 2L, 1L, 0L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
