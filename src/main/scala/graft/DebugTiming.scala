package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.CoreQueries.quarterLabel

/** Scratch profiling main — not part of the driver contract. */
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
    val dir = "/root/testdata/sf0.1"
    val spark = time("session") { GraftSession.local("debug") }
    val t = Tables(spark, dir)
    time("warmup") { noop(t.lineitem.select("l_orderkey")) }

    val joined = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        quarterLabel(col("o_orderdate")).as("quarter"),
        col("r_name").as("region"), col("n_name").as("nation"),
        col("p_type"), col("l_returnflag"))
    (1 to 2).foreach(i => time(s"q08 join only $i") { noop(joined) })
    (1 to 2).foreach(i => time(s"q08 join+sort $i") {
      noop(joined.orderBy(col("l_orderkey"), col("l_linenumber"), col("quarter"),
        col("region"), col("nation"), col("p_type"), col("l_returnflag")))
    })
    val scalars = graft.queries.Catalog.queries("q19_scalar_funcs")
    (1 to 2).foreach(i => time(s"q19 full $i") { noop(scalars(spark, dir)) })
    val d02 = graft.queries.Catalog.queries("d02_dedup_minhash_lsh")
    (1 to 2).foreach(i => time(s"d02 full $i") { noop(d02(spark, dir)) })
    time("q19 no reparse") {
      noop(t.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        quarterLabel(col("l_shipdate")).as("ship_quarter"))
        .orderBy(col("l_orderkey"), col("l_linenumber")))
    }
    spark.stop()
  }
}
