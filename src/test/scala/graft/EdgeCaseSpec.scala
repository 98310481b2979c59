package graft

import org.apache.spark.sql.functions._

import graft.io.Tables

/** Degenerate-input behavior of the composed operators: empty sides,
  * no-op parameters, and exactness in the exhaustive-parameter limit. */
class EdgeCaseSpec extends SparkSpecBase {
  import testImplicits._

  test("as-of join with an empty right side keeps every left row, null payload") {
    import java.sql.Timestamp
    val left = Seq((1L, 10L, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "k", "t")
    val right = Seq.empty[(Long, Long, Timestamp)].toDF("rid", "k", "t")
    val got = graft.ops.AsofJoin.leftAsof(left, right, "k", "t", Seq("rid"))
      .collect()
    assert(got.length === 1)
    assert(got(0).isNullAt(got(0).fieldIndex("rid")))
  }

  test("salted join with r=1 degenerates to the plain join") {
    val probe = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val build = Seq(("a", 10L)).toDF("k", "v")
    val plain = probe.join(build, Seq("k")).collect().map(_.toSeq).toSet
    val salted = graft.ops.SkewJoin.salted(probe, build, Seq("k"), r = 1)
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
  }

  test("minhash near-dup pipeline returns empty (not an error) on a dup-free corpus") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "red orange yellow green blue indigo violet again"))
      .toDF("doc_id", "text")
    val dups = graft.dedup.DedupOps.minhashNearDups(corpus, threshold = 0.5)
    assert(dups.count() === 0)
  }

  test("IVF index probe with nprobe = nCells is EXACT (equals brute force)") {
    val emb = Tables(spark, sf0001).embeddings
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_exact").toString
    graft.similarity.IvfIndex.build(emb, dir, nCells = 8)
    val qVec = emb.filter(col("vec_id") === 3L).head().getSeq[Float](1).toArray
    // probing every cell removes the approximation entirely; the only
    // difference from bruteForceTopK is that the index includes vec 3
    val viaIndex = graft.similarity.IvfIndex.topK(spark, dir, qVec, k = 11, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaIndex.head === ((3L, 10000L)))
    val exact = graft.similarity.SimilarityOps.bruteForceTopK(emb, 3L, 10)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sim_e4")))
    assert(viaIndex.drop(1).toSeq === exact.toSeq)
  }

  test("chunk geometry: exactly-at-boundary token counts produce no empty chunk") {
    // n = 50 → 1 chunk; n = 51 → 2 chunks (second holds tokens 41..51);
    // n = 90 → 2 chunks (41..90 has exactly 50)
    val df = Seq(
      (1L, (1 to 50).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 51).map(i => s"t$i").mkString(" ")),
      (3L, (1 to 90).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("edge_docs")
    val chunked = df
      .withColumn("toks", regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
      .withColumn("n", size(col("toks")))
      .withColumn("nc",
        when(col("n") <= 50, lit(1L))
          .otherwise(floor((col("n") - 50 + 39) / lit(40.0)).cast("long") + 1L))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), col("nc") - 1),
          i => slice(col("toks"), (i * 40 + 1).cast("int"), lit(50)))))
      .select(col("doc_id"), col("pos"), size(col("col")).as("chunk_len"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(chunked.count(_._1 == 1L) === 1)
    assert(chunked.count(_._1 == 2L) === 2)
    assert(chunked.count(_._1 == 3L) === 2)
    assert(chunked.forall(_._3 > 0), s"empty chunk emitted: ${chunked.toSeq}")
    assert(chunked.filter(_._1 == 3L).map(_._3).toSeq === Seq(50, 50))
  }
}
