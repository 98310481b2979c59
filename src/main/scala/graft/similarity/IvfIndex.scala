package graft.similarity

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Persistent IVF index: build ONCE into cell-partitioned parquet, then
  * serve any number of queries with partition-pruned scans.
  *
  * [[SimilarityOps.ivfTopK]] demonstrates the algorithm in a single
  * plan; a production index is a layout, not a query: vectors are
  * shuffled to their coarse cell exactly once at build time and land in
  * `cell_id=<n>/` parquet partitions. A probe then reads ONLY the
  * `nprobe` partitions nearest the query — at 100 TB the scan cost per
  * query is `nprobe/nCells` of the corpus, enforced by partition
  * pruning at plan time (`PartitionFilters` in the scan), not by a
  * runtime filter.
  *
  * The centroid matrix (k×d) is the index metadata: tiny, stored beside
  * the cells, collected to the driver at query time to pick probe cells
  * (equivalent to a broadcast variable, not a data collect).
  */
object IvfIndex {

  private def cellsPath(path: String) = s"$path/cells"
  private def centroidsPath(path: String) = s"$path/centroids"

  /** Assign every vector to its nearest centroid and persist the layout.
    * `refine > 0` runs that many k-means rounds first
    * ([[SimilarityOps.kmeansCentroids]]). One shuffle of the corpus
    * (the partitionBy write), one tiny centroid write. */
  def build(emb: DataFrame, path: String, nCells: Int, refine: Int = 0): Unit = {
    val centroids =
      (if (refine > 0) SimilarityOps.kmeansCentroids(emb, nCells, refine)
       else emb.filter(col("vec_id") < nCells)
         .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb")))
    SimilarityOps.assignCells(emb, centroids)
      .select(col("vec_id"), col("embedding"), col("cell_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell_id")
      .parquet(cellsPath(path))
    centroids.write.mode(SaveMode.Overwrite).parquet(centroidsPath(path))
  }

  /** Exact-rerank top-k over the persisted index: pick the `nprobe`
    * cells nearest the query from the (driver-held) centroid matrix,
    * scan only those partitions, re-rank with exact cosine. */
  def topK(spark: SparkSession, path: String, queryVec: Array[Float],
      k: Int, nprobe: Int): DataFrame = {
    val centroids = spark.read.parquet(centroidsPath(path))
      .collect()
      .map(r => (r.getAs[Long]("cell_id"),
        r.getSeq[Float](r.fieldIndex("c_emb")).toArray))
    // Bit-identical to the CosineSimilarity expression AND the DuckDB
    // cosSql replay: each float is widened to double BEFORE the multiply
    // (a float×float product rounds to float32 first and can differ in
    // the last ulp — enough to flip a probe-cell choice under ties).
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val xi = a(i).toDouble; val yi = b(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val probeCells = centroids
      .map { case (id, c) => (id, cos(c, queryVec)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(nprobe).map(_._1)
    val q = array(queryVec.map(v => lit(v)): _*)
    spark.read.parquet(cellsPath(path))
      .filter(col("cell_id").isin(probeCells: _*))
      .select(col("vec_id"),
        (round(cosineSimilarity(col("embedding"), q) * 10000))
          .cast("long").as("sim_e4"))
      .orderBy(col("sim_e4").desc, col("vec_id"))
      .limit(k)
  }
}
