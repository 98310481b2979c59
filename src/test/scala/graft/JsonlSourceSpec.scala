package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native DSv2 JSONL connector ([[graft.sources.JsonlSource]]):
  * split-ownership correctness down to pathological split sizes, pushdown
  * surfaces visible in the executed plan, exact parity with the built-in
  * reader, permissive conversion, inference, and CBO statistics.
  */
class JsonlSourceSpec extends SparkSpecBase {

  private def writeFixture(lines: Seq[String], trailingNewline: Boolean = true): String = {
    val dir = graft.io.TempLayouts.scratch("graft_jsonl_fix_")
    val body = lines.mkString("\n") + (if (trailingNewline) "\n" else "")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "data.jsonl"),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    dir
  }

  private val abSchema = "a LONG, b STRING"

  private def readWith(dir: String, schema: String, split: Long): DataFrame =
    spark.read.format("graft.sources.JsonlSource")
      .schema(schema).option("maxSplitBytes", split).load(dir)

  // 40 records with varied line lengths (so tiny splits land mid-record,
  // at record starts, and exactly on newlines somewhere in the sweep),
  // plus a blank line and a CRLF line.
  private lazy val sweepLines: Seq[String] =
    (0 until 40).map { i =>
      s"""{"a": $i, "b": "${"x" * (i % 7)}"}"""
    }.updated(11, "").updated(23, s"""{"a": 23, "b": "crlf"}\r""")

  test("split ownership: every split size yields the same multiset, no loss, no dup") {
    val dir = writeFixture(sweepLines)
    val whole = readWith(dir, abSchema, 1L << 20)
    assert(whole.rdd.getNumPartitions == 1)
    val expect = (0 until 40).filter(_ != 11).map(_.toLong).toSet
    assert(whole.select("a").collect().map(_.getLong(0)).toSet == expect)
    for (split <- Seq(3L, 7L, 16L, 33L, 64L, 301L)) {
      val df = readWith(dir, abSchema, split)
      assert(df.rdd.getNumPartitions > 1, s"split=$split planned one partition")
      val got = df.collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.length == 39, s"split=$split lost/duplicated rows: ${got.length}")
      assert(got.map(_._1).toSet == expect, s"split=$split wrong ids")
      assert(got.find(_._1 == 23L).exists(_._2 == "crlf"), "CRLF line mishandled")
    }
  }

  test("multi-byte UTF-8 survives byte-range splits landing mid-character") {
    // 0x0A can never occur inside a UTF-8 continuation sequence, so byte
    // splitting is sound — prove it with 2/3/4-byte code points and
    // splits small enough to land inside them
    val lines = (0 until 12).map(i => s"""{"a": $i, "b": "é中🙂-$i"}""")
    val dir = writeFixture(lines)
    for (split <- Seq(5L, 11L, 23L)) {
      val got = readWith(dir, abSchema, split)
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == (0 until 12).map(i => (i.toLong, s"é中🙂-$i")),
        s"split=$split corrupted multi-byte text")
    }
  }

  test("final record without trailing newline is owned by exactly one split") {
    val dir = writeFixture(sweepLines, trailingNewline = false)
    for (split <- Seq(5L, 50L, 1L << 20)) {
      val n = readWith(dir, abSchema, split).count()
      assert(n == 39, s"split=$split: $n")
    }
  }

  test("short name graft-jsonl resolves through DataSourceRegister") {
    val dir = writeFixture(Seq("""{"a": 1, "b": "x"}"""))
    val df = spark.read.format("graft-jsonl").schema(abSchema).load(dir)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("schema inference: first-seen key order, LUB typing, nulls carry no evidence") {
    val dir = writeFixture(Seq(
      """{"l": 5, "d": 1.5, "s": "x", "f": true, "m": 7, "n": null}""",
      """{"l": 9, "d": 2, "s": "y", "f": false, "m": 1.25, "n": null, "late": 3}"""))
    val inferred = spark.read.format("graft-jsonl").load(dir).schema
    // "n" is all-null — it carries no type evidence, so inference drops it
    assert(inferred.fieldNames.toSeq == Seq("l", "d", "s", "f", "m", "late"))
    val types = inferred.fields.map(f => f.name -> f.dataType.catalogString).toMap
    assert(types("l") == "bigint" && types("d") == "double" && types("s") == "string")
    assert(types("f") == "boolean")
    assert(types("m") == "double", "long∨double must widen to double")
    assert(types("late") == "bigint")
  }

  test("permissive conversion: missing key, JSON null, kind mismatch, broken line → null row") {
    val dir = writeFixture(Seq(
      """{"a": 1, "b": "ok"}""",
      """{"a": "oops", "b": 2}""", // both kinds mismatched
      """{"b": null}""", // a missing, b null
      """{"a": 4, "b": "fine"""")) // unparseable JSON → all-null row
    val rows = readWith(dir, abSchema, 1L << 20)
      .select(col("a"), col("b")).collect()
    assert(rows.length == 4)
    assert(rows.count(r => r.isNullAt(0) && r.isNullAt(1)) == 3)
    assert(rows.exists(r => !r.isNullAt(0) && r.getLong(0) == 1L && r.getString(1) == "ok"))
  }

  test("column pruning and filter pushdown are visible in the executed plan") {
    val dir = writeFixture(sweepLines)
    val df = readWith(dir, abSchema, 1L << 20)
      .filter(col("a") > 30 && col("b") === "x")
      .select(col("a"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-jsonl PushedFilters:"), plan)
    assert(plan.contains("GreaterThan(a,30)") && plan.contains("EqualTo(b,x)"), plan)
    assert(plan.contains("ReadSchema: struct<a:bigint>"), s"pruning failed:\n$plan")
    // fully absorbed: no residual Filter node above the scan
    assert(!plan.contains("Filter ("), s"expected no residual filter:\n$plan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
      (31 until 40).filter(_ % 7 == 1).map(_.toLong).sorted.toSeq)
  }

  test("filter on a pruned-away column still evaluates (parse set ⊇ filter refs)") {
    val dir = writeFixture(sweepLines)
    val got = readWith(dir, abSchema, 64L)
      .filter(col("b") === "xx")
      .select(col("a"))
      .collect().map(_.getLong(0)).sorted.toSeq
    // i%7==2 minus the blank-replaced 11 (not ≡2 anyway) and the CRLF-
    // replaced 23 whose b became "crlf"
    assert(got == Seq(2L, 9L, 16L, 30L, 37L))
  }

  test("Not stays residual (3VL), result still exact") {
    val dir = writeFixture(Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2, "b": "y"}""",
      """{"a": 3}"""))
    val df = readWith(dir, abSchema, 1L << 20).filter(not(col("b") === "x"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter "), s"Not must remain a residual Filter:\n$plan")
    assert(!plan.contains("PushedFilters: [Not"), plan)
    // SQL 3VL: NOT(null = 'x') is unknown → row 3 dropped
    assert(df.collect().map(_.getLong(0)).toSeq.sorted == Seq(2L))
  }

  test("limit pushdown: per-split cap visible in plan, global limit exact") {
    val dir = writeFixture(sweepLines)
    val df = readWith(dir, abSchema, 64L).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: LIMIT 5"), plan)
    assert(df.count() == 5)
  }

  test("parity with the built-in json reader on a real table slice") {
    val t = graft.io.Tables(spark, sf0001)
    val dir = graft.io.TempLayouts.scratch("graft_jsonl_parity_")
    t.orders
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
      .write.mode("overwrite").json(dir)
    val schema = "o_orderkey LONG, o_custkey LONG, odate STRING"
    val builtin = spark.read.schema(schema).json(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val ours = spark.read.format("graft-jsonl").schema(schema)
      .option("maxSplitBytes", 4096).load(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(ours == builtin)
    graft.io.TempLayouts.discard(dir)
  }

  test("runtime filtering: a broadcast-join subquery reaches the DSv2 scan as a runtime filter") {
    val t = graft.io.Tables(spark, sf0001)
    val dir = graft.io.TempLayouts.scratch("graft_jsonl_dpp_")
    t.orders.select(col("o_orderkey"), col("o_custkey"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .write.format("graft-jsonl").mode("overwrite").save(dir)
    val fact = spark.read.format("graft-jsonl")
      .schema("o_orderkey LONG, o_custkey LONG, cents LONG").load(dir)
    val dim = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val joined = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val row = joined.collect().head
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruning"),
      s"runtime filter did not reach the scan:\n${plan.take(4000)}")
    // values agree with the parquet-side computation
    val expect = t.orders.join(
        t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey"),
        col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)), sum(floor(col("o_totalprice") * 100).cast("long")))
      .collect().head
    assert(row.getLong(0) == expect.getLong(0) && row.getLong(1) == expect.getLong(1))
  }

  test("statistics: CBO sees byte size scaled by the pruned-column fraction") {
    val dir = writeFixture(sweepLines)
    val fileBytes = new java.io.File(dir, "data.jsonl").length()
    val full = readWith(dir, abSchema, 1L << 20)
    val pruned = full.select("a")
    val sFull = full.queryExecution.optimizedPlan.stats.sizeInBytes
    val sPruned = pruned.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(sFull == BigInt(fileBytes), s"full-scan stats $sFull != file bytes $fileBytes")
    assert(sPruned < sFull && sPruned > 0, s"pruned stats not scaled: $sPruned vs $sFull")
  }

  test("q95 catalog entry: pushdown reaches the DSv2 scan in the production plan") {
    val df = graft.queries.Catalog.queries("q95_dsv2_jsonl_pushdown")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-jsonl PushedFilters:"), plan)
    assert(plan.contains("GreaterThanOrEqual(odate,1996-01-01)") &&
      plan.contains("LessThanOrEqual(odate,1996-12-31)") &&
      plan.contains("In(o_orderpriority"), s"predicates not absorbed:\n$plan")
    assert(plan.contains("price_cents:bigint"), s"read schema missing:\n$plan")
    assert(df.collect().nonEmpty)
  }
}
