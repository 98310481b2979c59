package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.similarity.SimilarityOps

/** Scratch measurement main (not part of the driver contract): recall@5
  * of the cell-blocked kNN join (s12) against the exact join (s11)
  * across the (nCells, nprobe) grid — the evidence behind the catalog
  * default (VERDICT r7 #3: ship a configuration measured ≥ 0.8).
  *
  * Usage: RecallProbe [sfDir ...]; defaults to sf0.001 and sf0.01.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val spark = GraftSession.local("recall-probe")
    import spark.implicits._
    for (dir <- dirs) {
      val emb = Tables(spark, dir).embeddings
      val exact = SimilarityOps.knnJoinExact(emb, k = 5)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      println(s"== $dir  (truth pairs: ${exact.size})")
      for (nCells <- Seq(8, 16, 32); nprobe <- Seq(1, 2, 4, 6, 8, 12, 16) if nprobe <= nCells) {
        val t0 = System.nanoTime()
        val got = SimilarityOps
          .knnJoinCells(emb, k = 5, nCells = nCells, refine = 2, nprobe = nprobe)
          .select("qid", "vec_id").as[(Long, Long)].collect().toSet
        val sec = (System.nanoTime() - t0) / 1e9
        graft.InternalCaches.releaseAll()
        val recall = got.count(exact.contains).toDouble / exact.size
        println(f"nCells=$nCells%2d nprobe=$nprobe%2d recall@5=$recall%.3f  ${sec}%.2fs")
      }
    }
    spark.stop()
  }
}
