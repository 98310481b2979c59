package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Scratch profiling main — not part of the driver contract.
  * Current scratch: phase attribution for the iterative graph entries
  * (g01 shape): edge build vs per-round cost. */
object DebugTiming {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = GraftSession.local("debug")
    val t = Tables(spark, dir)
    (1 to reps).foreach { rep =>
      System.err.println(s"[debug] === rep $rep ===")
      val edges = time("edge build A (current)") {
        val pairs = t.orders
          .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        val e = pairs.unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
        val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val ed = e.join(deg, "src")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        ed.count()
        ed
      }
      val edgesB = time("edge build B (pairs persisted once)") {
        val pairs0 = t.orders
          .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val e = pairs0.unionByName(pairs0.select(col("dst").as("src"), col("src").as("dst")))
        val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val ed = e.join(deg, "src")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        ed.count()
        pairs0.unpersist()
        ed
      }
      edgesB.unpersist()
      val nodes = time("nodes distinct") {
        edges.select(col("src").as("node")).distinct().localCheckpoint(true)
      }
      val n = time("node count")(nodes.count())
      val r0 = GraphOpsProbe.scale / n
      val base = 15L * r0 / 100L
      var ranks = time("rank init ckpt") {
        nodes.select(col("node"), lit(r0).as("r")).localCheckpoint(true)
      }
      (1 to 5).foreach { i =>
        ranks = time(s"round $i (shuffle join)") {
          edges
            .join(ranks, col("src") === col("node"))
            .select(col("dst"), expr("r div deg").as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("t"))
            .select(col("dst").as("node"),
              (lit(base) + expr("85 * t div 100")).as("r"))
            .localCheckpoint(true)
        }
      }
      (1 to 5).foreach { i =>
        ranks = time(s"round $i (broadcast ranks)") {
          edges
            .join(broadcast(ranks), col("src") === col("node"))
            .select(col("dst"), expr("r div deg").as("c"))
            .groupBy(col("dst")).agg(sum(col("c")).as("t"))
            .select(col("dst").as("node"),
              (lit(base) + expr("85 * t div 100")).as("r"))
            .localCheckpoint(true)
        }
      }
      time("final sort+noop") {
        noop(ranks
          .select(col("node").as("node_id"),
            when(col("node") % 2 === 1, "supplier").otherwise("customer").as("kind"),
            col("r").as("rank_scaled"))
          .orderBy(col("node_id")))
      }
      edges.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

private object GraphOpsProbe { val scale = 1000000000000L }
