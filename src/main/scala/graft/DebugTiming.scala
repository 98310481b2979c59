package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — not part of the driver contract. */
object DebugTiming {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = time("session") { GraftSession.local("debug") }
    val qs = graft.queries.Catalog.queries
    // warmup
    time("warmup q16") { qs("q16_distinct")(spark, dir).write.mode("overwrite").format("noop").save() }
    Seq("q15_left_join_fill", "q17_set_except", "q18_set_union", "q21_events_json").foreach { n =>
      (1 to 2).foreach { i =>
        time(s"$n run$i") { qs(n)(spark, dir).write.mode("overwrite").format("noop").save() }
      }
    }
    qs("q17_set_except")(spark, dir).explain("formatted")
    spark.stop()
  }
}
