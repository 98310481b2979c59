package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: run named catalog queries N times in one
  * warm JVM and print each iteration's wall time — the measurement loop
  * for optimizing a single query without paying a full Bench run.
  *
  *   runMain graft.Profile <sfDir> <name>[,<name>...] [iters]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    // Fail on mistyped query names BEFORE paying SparkSession startup.
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(
        s"[profile] unknown queries: ${unknown.mkString(", ")}\n" +
          s"[profile] known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val cpus = GraftSession.cpus
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[profile] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
        InternalCaches.releaseAll()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
