package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

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
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("debug")
    val t = Tables(spark, dir)
    val toks = regexp_extract_all(col("text"), lit("\\S+"), lit(0))
    val snippets = t.documents.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(
          slice(toks, lit(1), ceil(size(toks) * lit(0.6)).cast("int")), " ")
          .as("text"))
    val corpus = t.documents.select(col("doc_id"), col("text"))
      .unionByName(snippets)
    println("corpus " + corpus.count())
    val gramSets = corpus.select(col("doc_id"),
      call_function("word_ngram_hashes", col("text"), lit(5)).as("gs")).persist()
    gramSets.select(col("doc_id"), size(col("gs")).as("n")).orderBy("doc_id").show(5)
    val grams = gramSets.select(col("doc_id"), explode(col("gs")).as("g"))
    println("gram rows " + grams.count())
    val dfc = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    dfc.groupBy(col("df")).count().orderBy("df").show(10)
    val rare = grams.join(dfc.filter(col("df").between(2, 50)), Seq("g"))
    println("rare rows " + rare.count())
    val cand = rare.select(col("g"), col("doc_id").as("contained_id"))
      .join(rare.select(col("g"), col("doc_id").as("container_id")), Seq("g"))
      .filter(col("contained_id") =!= col("container_id"))
      .select(col("contained_id"), col("container_id")).distinct()
    println("cand " + cand.count())
    val out = cand
      .join(gramSets.select(col("doc_id").as("contained_id"), col("gs").as("gs_a")), Seq("contained_id"))
      .join(gramSets.select(col("doc_id").as("container_id"), col("gs").as("gs_b")), Seq("container_id"))
      .select(col("contained_id"), col("container_id"),
        size(col("gs_a")).cast("long").as("n_grams"),
        size(array_intersect(col("gs_a"), col("gs_b"))).cast("long").as("n_shared"))
    out.orderBy(col("n_shared").desc).show(5)
    println("pass " + out.filter(col("n_shared") * 5 >= col("n_grams") * 4).count())
    spark.stop()
  }
}
