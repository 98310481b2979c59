package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.SkewJoin

/** Salted-join equivalence: the salted plan must be row-for-row identical
  * to the plain join, for both inner and left semantics. */
class SkewJoinSpec extends SparkSpecBase {
  import testImplicits._

  lazy val t = Tables(spark, sf0001)

  test("salted inner join equals the plain inner join (skewed key included)") {
    // l_returnflag is genuinely skewed (3 values over 60k rows) — the
    // shape salting exists for.
    val dim = t.lineitem.select(col("l_returnflag")).distinct()
      .withColumn("flag_tag", concat(lit("tag-"), col("l_returnflag")))
    val plain = t.lineitem.join(dim, Seq("l_returnflag"))
      .groupBy(col("flag_tag")).count()
    val salted = SkewJoin.salted(t.lineitem, dim, Seq("l_returnflag"), r = 8)
      .groupBy(col("flag_tag")).count()
    val p = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s = salted.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p.nonEmpty && s === p)
  }

  test("salted left join preserves unmatched probe rows") {
    val probe = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "b"))
      .toDF("id", "k")
    val build = Seq(("a", 10L), ("b", 20L)).toDF("k", "v")
    val plain = probe.join(build, Seq("k"), "left")
      .select("id", "k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1)
    val salted = SkewJoin.salted(probe, build, Seq("k"), r = 4, joinType = "left")
      .select("id", "k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1)
    assert(salted.toSeq === plain.toSeq)
    assert(salted.exists(_._3 == -1L), "expected an unmatched probe row")
  }

  test("salting spreads a single hot key across reducers") {
    // All rows share ONE key: unsalted, one reducer gets everything;
    // salted with r=8, the (key, salt) space has 8 distinct values.
    val hot = spark.range(1000).select(lit("hot").as("k"), col("id"))
    val build = Seq(("hot", 1L)).toDF("k", "v")
    val salted = SkewJoin.salted(hot, build, Seq("k"), r = 8)
    assert(salted.count() === 1000)
    // distinct salts actually used (observed via the probe-side salt expr)
    val saltsUsed = hot
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(8L)))
      .select("_salt").distinct().count()
    assert(saltsUsed === 8)
  }

  test("AQE skew-join split fires on the unsalted control (the runtime half of the skew story)") {
    // SkewJoin.salted is the PLAN-TIME fix for a hot key that must meet
    // a single build row; AQE's skew split is the RUNTIME fix for
    // oversized post-shuffle partitions. q37 evidences the former; this
    // evidences the latter on an unsalted control with thresholds
    // scaled to test data, proving the engine's AQE config actually
    // engages (not just that the flag is set). The aggregate keeps the
    // payload column alive so column pruning can't shrink the hot
    // partition below the detection threshold.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2k")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1k")
    ss.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1")
    val probe = ss.range(200000).select(
      when(col("id") < 190000L, lit(0L)).otherwise(col("id")).as("k"),
      concat(lit("pad-pad-pad-pad-pad-pad-"), col("id").cast("string")).as("payload"))
    val build = ss.range(12000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val joined = probe.join(build, Seq("k"))
      .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
    // collect() on THIS Dataset (not head(), which runs a separate limit
    // query) so this QueryExecution's adaptive plan finalizes
    val row = joined.collect().head
    // hot key 0 (190k rows) matches build row 0; ids >= 190000 have no
    // build match — survivors are exactly the hot key's fan-in
    assert(row.getAs[Long]("n") === 190000L)
    val plan = joined.queryExecution.executedPlan.toString
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.substring(0, cut) else plan
    assert(finalPlan.contains("skew=true"),
      s"join not marked skew=true in the final plan:\n$finalPlan")
    assert(finalPlan.contains("AQEShuffleRead skewed"),
      s"AQE skew reader did not engage:\n$finalPlan")
  }

  test("q37 plans a salted ShuffledHashJoin (no broadcast hiding the skew)") {
    val plan = graft.queries.Catalog.queries("q37_skew_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected a shuffle join (shuffle_hash hint):\n$plan")
    assert(plan.contains("_salt"),
      s"join keys do not include the salt column:\n$plan")
    assert(!plan.contains("BroadcastHashJoin [skew_key"),
      s"skewed join was broadcast — the demo would be vacuous:\n$plan")
  }
}
