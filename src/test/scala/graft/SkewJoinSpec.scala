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
