package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.GroupedTopK

/** Bounded-heap grouped top-k aggregate: equivalence to the window-rank
  * formulation and the no-window-sort plan shape claim. */
class GroupedTopKSpec extends SparkSpecBase {
  import testImplicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  lazy val scored = {
    // Deterministic synthetic groups with ties: 6 groups × 200 ids,
    // score = (id * 37) % 50 so many ids share a score within a group.
    spark.range(1200).select(
      (col("id") % 6).as("g"),
      col("id"),
      ((col("id") * 37) % 50).cast("double").as("score"))
  }

  test("aggregator equals the row_number()<=k window formulation (ties included)") {
    val k = 7
    val topk = GroupedTopK.topK(k)
    val got = scored.groupBy(col("g"))
      .agg(topk(col("score"), col("id")).as("topk"))
      .select(col("g"), posexplode(col("topk")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("col").getField("id").as("id"),
        col("col").getField("score").as("score"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    val expect = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("g"), col("rk"), col("id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === expect.toSeq)
  }

  test("groups smaller than k return all members, still ordered") {
    val small = Seq((0L, 1L, 5.0), (0L, 2L, 9.0), (1L, 3L, 1.0))
      .toDF("g", "id", "score")
    val topk = GroupedTopK.topK(10)
    val got = small.groupBy(col("g"))
      .agg(topk(col("score"), col("id")).as("topk"))
      .select(col("g"), posexplode(col("topk")))
      .select(col("g"), col("col").getField("id").as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet === Set((0L, 2L), (0L, 1L), (1L, 3L)))
  }

  test("q26 plan aggregates without a window sort") {
    val df = graft.queries.Catalog.queries("q26_grouped_topk_agg")(spark, sf0001)
    val plan = planOf(df).toString
    assert(!plan.contains("Window"), "grouped top-k must not fall back to WindowExec")
    assert(plan.contains("ObjectHashAggregate"),
      "expected the typed aggregator's ObjectHashAggregate in the plan")
  }
}
