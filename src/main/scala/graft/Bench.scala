package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up one-time JVM costs (codegen compiler, parquet reader,
    // broadcast machinery, shuffle system) so they don't land on the
    // alphabetically-first measured query.
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val pt = spark.read.parquet(s"$sfDir/part.parquet")
      li.join(org.apache.spark.sql.functions.broadcast(pt),
          li("l_partkey") === pt("p_partkey"))
        .groupBy("l_returnflag").count()
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => () }
    // noop sink forces full evaluation of every operator in the plan
    // (a bare count() would let Catalyst prune projections and sorts).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
