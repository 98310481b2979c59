package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.Writers

/** Sink-layout tests: partition pruning and bucketed shuffle-free joins
  * actually materialize in the plans. */
class WritersSpec extends SparkSpecBase {
  import testImplicits._

  test("quarter-partitioned wide table prunes partitions for sliced reads") {
    val dir = Files.createTempDirectory("graft_wide").toString
    val wide = Seq(
      ("Q1", "US", "AAA", "BUY"), ("Q2", "DE", "BBB", "SELL"),
      ("Q3", "FR", "CCC", "BUY"), ("Q4", "JP", "DDD", "SELL"))
      .toDF("quarter", "country_name", "symbol", "transaction_type")
    Writers.wideTablePartitioned(wide, dir)

    val back = spark.read.parquet(dir)
    assert(back.count() === 4)
    val sliced = back.filter(col("quarter") === "Q2")
    val plan = sliced.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(quarter"),
      s"no partition pruning:\n$plan")
    assert(sliced.collect().map(_.getAs[String]("symbol")).toSeq === Seq("BBB"))
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    spark.sql("DROP TABLE IF EXISTS graft_fact_b")
    spark.sql("DROP TABLE IF EXISTS graft_dim_b")
    // a killed prior JVM can leave the managed locations behind without
    // catalog entries — clear them so CTAS doesn't refuse
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("graft_fact_b", "graft_dim_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, t))
    }
    val fact = (1L to 1000L).map(i => (i % 50, s"v$i")).toDF("k", "v")
    val dim = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "d")
    Writers.bucketedTable(fact, "graft_fact_b", "k", 8)
    Writers.bucketedTable(dim, "graft_dim_b", "k", 8)

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_fact_b")
        .join(spark.table("graft_dim_b"), Seq("k"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(j.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
