package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** JVM-cached warehouse layouts derived from the raw tables — the
  * "write the layout once, prune every query" serving pattern. Same
  * billing shape as the persistent IVF index (SimilarityOps s07/s08):
  * the first request for a dataset pays the one-time partitioned write;
  * every query after that pays only the partition-pruned scan. Layout
  * dirs are per-(JVM, dataset) temp directories, removed on exit.
  */
object WarehouseLayout {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    cache.values().forEach(p => deleteRecursively(new java.io.File(p)))))

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** lineitem re-laid-out hive-partitioned by ship-quarter label
    * (`ship_quarter=1995Q2/…`) — the time-sliced dashboard's serving
    * layout. ~28 quarters in this data: directory count stays tiny while
    * a one-quarter query reads ~1/28th of the bytes; at 100 TB the same
    * layout bounds a quarter slice to its own files no matter how large
    * the fact table grows. */
  def lineitemByShipQuarter(spark: SparkSession, dir: String): String =
    cache.computeIfAbsent(new java.io.File(dir).getCanonicalPath + "#lineitem", _ => {
      val out = java.nio.file.Files.createTempDirectory("graft_warehouse_li_").toString
      val li = Tables(spark, dir).lineitem.withColumn("ship_quarter",
        concat(year(col("l_shipdate")).cast("string"),
          graft.ops.CoreQueries.quarterLabel(col("l_shipdate"))))
      Writers.partitionedParquet(li, out, "ship_quarter")
      out
    })

  /** lineitem range-partitioned AND sorted by ship DATE within each
    * file — the sort-on-write clustering that makes parquet min/max
    * row-group statistics selective: a date-slice predicate skips whole
    * row groups (and, via the range partitioning, whole FILES) instead
    * of reading and discarding. The hive-partitioned quarter layout
    * above prunes at directory granularity; this one prunes INSIDE the
    * files — the two compose at 100 TB (partition by coarse time, sort
    * by fine time within). The sort/filter key is a materialized DATE
    * column: Spark still writes TimestampType as parquet INT96 by
    * default, and INT96 carries no usable min/max statistics — a
    * timestamp-sorted layout silently loses ALL skipping (measured: the
    * one-week slice read every row); DATE is INT32 with exact stats and
    * full predicate pushdown. WritersSpec quantifies the effect by
    * comparing scan-output rows against a shuffled (stats-useless)
    * layout of the same rows. */
  def lineitemSortedByShipdate(spark: SparkSession, dir: String): String =
    cache.computeIfAbsent(new java.io.File(dir).getCanonicalPath + "#li_sorted", _ => {
      val out = java.nio.file.Files.createTempDirectory("graft_warehouse_ls_").toString
      Tables(spark, dir).lineitem
        .withColumn("ship_date", to_date(col("l_shipdate")))
        .repartitionByRange(8, col("ship_date"))
        .sortWithinPartitions(col("ship_date"))
        .write.mode("overwrite").parquet(out)
      out
    })
}
