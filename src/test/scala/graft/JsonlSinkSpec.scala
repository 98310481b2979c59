package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.io.TempLayouts
import graft.sources.{JsonlBatchWrite, JsonlCommitMessage, JsonlWriterFactory}

/** The DSv2 JSONL sink: end-to-end round-trips through the connector's
  * write path, append/overwrite semantics, and the two-phase commit
  * protocol driven directly (task abort, job abort, staging invisibility).
  */
class JsonlSinkSpec extends SparkSpecBase {
  import testImplicits._

  private val schema = "k LONG, s STRING, d DOUBLE, f BOOLEAN"

  private def sampleDf = Seq(
    (1L, "a", 1.5, true), (2L, "b", -0.25, false), (3L, "c", 2.0, true))
    .toDF("k", "s", "d", "f")

  test("sink round-trip: write through the connector, read back identical") {
    val dir = TempLayouts.scratch("graft_jsonl_sink_")
    sampleDf.write.format("graft-jsonl").mode("overwrite").save(dir)
    val back = spark.read.format("graft-jsonl").schema(schema).load(dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
      .sorted.toSeq
    assert(back == Seq((1L, "a", 1.5, true), (2L, "b", -0.25, false), (3L, "c", 2.0, true)))
    // no staging residue and no underscore-invisible data loss
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.startsWith("_staging")), names.mkString(","))
  }

  test("append accumulates, overwrite truncates") {
    val dir = TempLayouts.scratch("graft_jsonl_sink_mode_")
    sampleDf.write.format("graft-jsonl").mode("append").save(dir)
    sampleDf.write.format("graft-jsonl").mode("append").save(dir)
    val rd = () => spark.read.format("graft-jsonl").schema(schema).load(dir)
    assert(rd().count() == 6)
    sampleDf.filter(col("k") === 1).write.format("graft-jsonl").mode("overwrite").save(dir)
    assert(rd().collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("null fields are omitted on write and read back as NULL") {
    val dir = TempLayouts.scratch("graft_jsonl_sink_null_")
    Seq((1L, Option("x")), (2L, None)).toDF("k", "s")
      .write.format("graft-jsonl").mode("overwrite").save(dir)
    val rows = spark.read.format("graft-jsonl").schema("k LONG, s STRING").load(dir)
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getString(1) == "x" && rows(1).isNullAt(1))
    // the k=2 line must not mention s at all (omission, not literal null)
    val raw = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".jsonl"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toList)
    assert(raw.exists(l => l.contains("\"k\":2") && !l.contains("\"s\"")), raw.mkString("|"))
  }

  test("commit protocol: task abort discards its file; job abort leaves the table unchanged") {
    val dir = TempLayouts.scratch("graft_jsonl_sink_proto_")
    sampleDf.write.format("graft-jsonl").mode("overwrite").save(dir)
    val before = spark.read.format("graft-jsonl").schema(schema).load(dir)
      .collect().map(_.getLong(0)).sorted.toSeq

    val st = StructType.fromDDL(schema)
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val factory = new JsonlWriterFactory(dir, "q-test", st, conf)
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters.createToCatalystConverter(st)
    def toRow(r: org.apache.spark.sql.Row) =
      conv(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]

    // task 0 commits its staged file, task 1 aborts
    val w0 = factory.createWriter(0, 100L)
    w0.write(toRow(org.apache.spark.sql.Row(9L, "z", 0.0, false)))
    val m0 = w0.commit()
    val w1 = factory.createWriter(1, 101L)
    w1.write(toRow(org.apache.spark.sql.Row(8L, "y", 0.0, false)))
    w1.abort()
    val staged = new java.io.File(dir, "_staging-q-test").listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSeq // drop local-FS .crc sidecars
    assert(staged == Seq("part-0-100.jsonl"), s"task abort left $staged")

    // JOB abort: even the committed task's file never publishes
    val bw = new JsonlBatchWrite(dir, st, "q-test", false, conf)
    bw.abort(Array(m0))
    assert(!new java.io.File(dir, "_staging-q-test").exists())
    val after = spark.read.format("graft-jsonl").schema(schema).load(dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before, "job abort mutated the table")
  }

  test("commit protocol: driver publish makes exactly the committed tasks visible") {
    val dir = TempLayouts.scratch("graft_jsonl_sink_pub_")
    val st = StructType.fromDDL(schema)
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val factory = new JsonlWriterFactory(dir, "q-pub", st, conf)
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters.createToCatalystConverter(st)
    def toRow(r: org.apache.spark.sql.Row) =
      conv(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val msgs = (0 until 3).map { p =>
      val w = factory.createWriter(p, 200L + p)
      w.write(toRow(org.apache.spark.sql.Row(p.toLong, s"p$p", 0.0, true)))
      w.commit()
    }
    // mid-write: nothing visible (staging dir is underscore-invisible)
    intercept[IllegalArgumentException] {
      // no data files at all yet → our reader refuses to infer
      spark.read.format("graft-jsonl").load(dir).collect()
    }
    new JsonlBatchWrite(dir, st, "q-pub", false, conf)
      .commit(msgs.toArray[org.apache.spark.sql.connector.write.WriterCommitMessage])
    val ks = spark.read.format("graft-jsonl").schema(schema).load(dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ks == Seq(0L, 1L, 2L))
    assert(msgs.collect { case m: JsonlCommitMessage => m.rows }.sum == 3L)
  }
}
