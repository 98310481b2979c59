package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.io.Tables
import graft.similarity.SimilarityOps

/** ANN-operator tests: exact baseline vs a driver-side reference
  * implementation, and recall bounds for the approximate paths. */
class SimilaritySpec extends SparkSpecBase {

  lazy val emb = Tables(spark, sf0001).embeddings

  test("cosine similarity matches a scalar reference implementation") {
    import testImplicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosineSimilarity(col("a"), col("b")))
      .head().getDouble(0)
    val expect = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - expect) < 1e-12)
  }

  test("native cosine_similarity expression is bit-identical to the HOF formulation") {
    val both = emb.limit(100).select(
      VectorFunctions.cosineSimilarity(col("embedding"), col("embedding")).as("native"),
      VectorFunctions.cosineSimilarityHof(col("embedding"), col("embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    val cross = emb.limit(50).crossJoin(
        emb.limit(50).select(col("embedding").as("e2")))
      .select(
        VectorFunctions.cosineSimilarity(col("embedding"), col("e2")).as("native"),
        VectorFunctions.cosineSimilarityHof(col("embedding"), col("e2")).as("hof"))
    assert(cross.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("native hamming_distance matches a HOF formulation") {
    import testImplicits._
    val df = Seq(
      (Seq(1, 0, 1, 1), Seq(1, 1, 0, 1)),
      (Seq(0, 0), Seq(0, 0))).toDF("a", "b")
    val got = df.select(VectorFunctions.hammingDistance(col("a"), col("b")))
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(2L, 0L))
  }

  test("brute-force top-k matches a collected exact computation") {
    val all = emb.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    val q = all.find(_._1 == 0L).get._2.map(_.toDouble)
    def cos(v: Array[Float]): Double = {
      val vd = v.map(_.toDouble)
      val dot = vd.zip(q).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(vd.map(x => x * x).sum) * math.sqrt(q.map(x => x * x).sum))
    }
    val expect = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, math.round(cos(v) * 10000)) }
      .sortBy { case (id, s) => (-s, id) }.take(10)
    val got = SimilarityOps.bruteForceTopK(emb, 0L, 10)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sim_e4")))
    assert(got.toSeq === expect.toSeq)
  }

  test("LSH top-k achieves recall ≥ 0.5 vs exact on this data") {
    val exact = SimilarityOps.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val approx = SimilarityOps.lshTopK(emb, 0L, 10, maxHamming = 7)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(approx.nonEmpty)
    assert(exact.intersect(approx).size >= 5,
      s"LSH recall ${exact.intersect(approx).size}/10")
  }

  test("IVF top-k achieves recall ≥ 0.5 vs exact on this data") {
    val exact = SimilarityOps.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val approx = SimilarityOps.ivfTopK(emb, 0L, 10, nCells = 16, nprobe = 4)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(approx.nonEmpty)
    assert(exact.intersect(approx).size >= 5,
      s"IVF recall ${exact.intersect(approx).size}/10")
  }

  test("batch top-k: per-query slices equal the single-query exact results") {
    val qids = SimilarityOps.BatchQueryIds
    val batch = SimilarityOps.bruteForceTopKBatch(emb, qids, k = 10).collect()
    assert(batch.length === qids.length * 10)
    qids.foreach { q =>
      val single = SimilarityOps.bruteForceTopK(emb, q, 10)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sim_e4")))
      val slice = batch.filter(_.getAs[Long]("qid") == q)
        .sortBy(_.getAs[Long]("rk"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sim_e4")))
      assert(slice.toSeq === single.toSeq, s"batch slice for qid=$q diverges")
    }
  }

  test("batch LSH top-k: mean recall ≥ 0.5 vs batch exact") {
    val qids = SimilarityOps.BatchQueryIds
    val exact = SimilarityOps.bruteForceTopKBatch(emb, qids, k = 10).collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val approx = SimilarityOps.lshTopKBatch(emb, qids, k = 10).collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    assert(approx.nonEmpty)
    val recalls = qids.map(q =>
      exact(q).intersect(approx.getOrElse(q, Set.empty)).size / 10.0)
    assert(recalls.sum / recalls.size >= 0.5,
      s"batch LSH mean recall ${recalls.sum / recalls.size} (per-query $recalls)")
  }

  test("persistent IVF index: partition-pruned probes with recall vs exact") {
    import graft.similarity.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    IvfIndex.build(emb, dir, nCells = 16)
    val qVec = emb.filter(col("vec_id") === 0L)
      .head().getSeq[Float](1).toArray
    val res = IvfIndex.topK(spark, dir, qVec, k = 11, nprobe = 4)
    // the probe scan must prune partitions at plan time, not filter rows
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell_id"),
      s"probe does not prune cell partitions:\n$plan")
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1)))
    // the query vector IS vec 0: the index must return it as the top hit
    assert(got.head === ((0L, 10000L)))
    val exact = SimilarityOps.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val approx = got.map(_._1).filterNot(_ == 0L).toSet
    assert(exact.intersect(approx).size >= 5,
      s"IVF-index recall ${exact.intersect(approx).size}/10")
  }

  test("repeated s07 builds leave exactly one live index dir per dataset (no /tmp leak)") {
    def liveIndexDirs(): Set[String] = {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      tmp.listFiles().filter(f => f.isDirectory
        && f.getName.startsWith("graft_ivf_index_")).map(_.getName).toSet
    }
    val before = liveIndexDirs()
    val s07 = graft.queries.Catalog.queries("s07_similarity_ivf_build")
    val r1 = s07(spark, sf0001).collect()
    val afterFirst = liveIndexDirs() -- before
    val r2 = s07(spark, sf0001).collect()
    val r3 = s07(spark, sf0001).collect()
    val afterThird = liveIndexDirs() -- before
    // each rebuild swaps in a fresh dir and deletes the one it replaced
    assert(afterFirst.size === 1, s"first build left $afterFirst")
    assert(afterThird.size === 1, s"three builds left $afterThird")
    assert(afterFirst.intersect(afterThird).isEmpty, "rebuild did not swap dirs")
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq)
    assert(r2.map(_.toString).toSeq === r3.map(_.toString).toSeq)
  }

  test("s09: quantization codes equal a driver recompute; dequantization error ≤ half a step") {
    import graft.io.Tables
    val got = graft.queries.Catalog.queries("s09_embedding_quantize")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r).toMap
    val vecs = Tables(spark, sf0001).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    assert(vecs.length === got.size)
    vecs.foreach { case (id, v) =>
      val r = got(id)
      val vmin = v.min.toDouble
      val vmax = v.max.toDouble
      assert(r.getAs[Double]("vmin") === vmin)
      assert(r.getAs[Double]("vmax") === vmax)
      val codes = v.map(x =>
        if (vmax == vmin) 0L
        else math.round((x.toDouble - vmin) * 255 / (vmax - vmin)))
      assert(r.getAs[Long]("code_sum") === codes.sum, s"vec $id")
      assert(r.getAs[Long]("code_min") === codes.min && codes.min >= 0L)
      assert(r.getAs[Long]("code_max") === codes.max && codes.max <= 255L)
      // the SQ8 guarantee: reconstruction error bounded by half a step
      val step = (vmax - vmin) / 255
      v.zip(codes).foreach { case (x, c) =>
        assert(math.abs((vmin + c * step) - x.toDouble) <= step / 2 + 1e-12)
      }
    }
  }

  test("k-means-refined IVF does not regress recall vs seed centroids") {
    val exact = SimilarityOps.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val seeded = SimilarityOps.ivfTopK(emb, 0L, 10, nCells = 16, nprobe = 4)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val refined = SimilarityOps.ivfTopK(emb, 0L, 10, nCells = 16, nprobe = 4,
        refine = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(refined.nonEmpty)
    assert(exact.intersect(refined).size >= exact.intersect(seeded).size - 2,
      s"refined recall ${exact.intersect(refined).size} far below seeded ${exact.intersect(seeded).size}")
  }

  test("PQ: every vector encodes to exactly M in-range codes") {
    val m = 4
    val books = SimilarityOps.pqCodebooks(emb, m = m, k = 16, iters = 2)
    val codes = SimilarityOps.pqEncode(emb, books, m = m).collect()
    val n = emb.count()
    assert(codes.length === n * m, s"expected $n×$m code rows, got ${codes.length}")
    assert(codes.forall { r =>
      val c = r.getAs[Long]("code"); c >= 0L && c < 16L
    }, "code outside [0, 16)")
    val perVec = codes.groupBy(_.getAs[Long]("vec_id"))
    assert(perVec.forall(_._2.map(_.getAs[Int]("sub")).toSet === (0 until m).toSet),
      "missing subspace codes")
    graft.InternalCaches.releaseAll()
  }

  test("PQ ADC batch: well-formed top-k with non-trivial recall vs exact") {
    val qids = SimilarityOps.BatchQueryIds
    val exact = SimilarityOps.bruteForceTopKBatch(emb, qids, k = 10).collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val pq = SimilarityOps.pqTopKBatch(emb, qids, k = 10).collect()
    assert(pq.length === qids.length * 10)
    val byQ = pq.groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq === (1L to 10L))
      // ADC scores are sorted: rank order must be non-increasing score
      val scores = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("neg_d2"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // 4-byte codes of 64-dim vectors lose a lot — require the ADC scan
    // to beat random selection by a wide margin, not match exact search:
    // random top-10 of ~500 would hit 10/500 ≈ 0.02 mean recall.
    val recalls = qids.map(q => exact(q)
      .intersect(byQ(q).map(_.getAs[Long]("vec_id")).toSet).size / 10.0)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"PQ mean recall $mean (per-query $recalls)")
    graft.InternalCaches.releaseAll()
  }

  test("s15 residual IVF-PQ: recall >= the non-residual s14 on the same probe budget") {
    // by_residual=true is the accuracy-grade FAISS variant: with the
    // same nprobe (same candidate sets — probing is pure IVF), the PQ
    // codes describe within-cell displacement instead of re-describing
    // cell position, so ADC ranking inside the candidates must be at
    // least as faithful to true distance. Deterministic corpus + fully
    // integer pipeline → this is a fixed measurement, not a flake.
    val qids = SimilarityOps.BatchQueryIds
    val exact = SimilarityOps.bruteForceTopKBatch(emb, qids, k = 10).collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val byQ = df.collect().groupBy(_.getAs[Long]("qid"))
        .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
      val rs = qids.map(q => exact(q).intersect(byQ(q)).size / 10.0)
      rs.sum / rs.size
    }
    val plain = recallOf(SimilarityOps.ivfPqTopKBatch(emb, qids, k = 10))
    val residual = recallOf(SimilarityOps.ivfPqResidualTopKBatch(emb, qids, k = 10))
    assert(residual >= plain,
      s"residual PQ recall $residual regressed below non-residual $plain")
    // and it must remain non-trivial in absolute terms (random ≈ 0.02)
    assert(residual >= 0.2, s"residual PQ mean recall $residual")
    graft.InternalCaches.releaseAll()
  }

  test("s16 exact rerank: recall >= plain s14 ADC on the same probe budget") {
    // the refine stage re-scores the top-32 ADC candidates with exact
    // integer L2: within the candidate set the final order IS brute-force
    // order, so any ADC quantization error inside the top-10/32 boundary
    // is repaired — recall vs exact can only improve over s14 at the
    // same nprobe. Deterministic corpus → fixed measurement.
    val qids = SimilarityOps.BatchQueryIds
    val exact = SimilarityOps.bruteForceTopKBatch(emb, qids, k = 10).collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val byQ = df.collect().groupBy(_.getAs[Long]("qid"))
        .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
      val rs = qids.map(q => exact(q).intersect(byQ(q)).size / 10.0)
      rs.sum / rs.size
    }
    val plain = recallOf(SimilarityOps.ivfPqTopKBatch(emb, qids, k = 10))
    val reranked = recallOf(SimilarityOps.ivfPqRerankTopKBatch(emb, qids, k = 10))
    assert(reranked >= plain,
      s"reranked recall $reranked regressed below ADC-only $plain")
    assert(reranked >= 0.2, s"reranked mean recall $reranked")
    graft.InternalCaches.releaseAll()
  }

  test("s20 JL projection: mean recall@10 >= 0.8 at the measured r=32/C=128 knee") {
    // deterministic corpus + deterministic md5 planes -> fixed
    // measurement (the scaladoc grid: 0.82 at sf0.001). This corpus is
    // the transform's worst case (near-uniform unit vectors, d=64);
    // the bound asserts the chosen config stays on the measured knee.
    val qids = SimilarityOps.BatchQueryIds
    val exact = SimilarityOps.bruteForceTopKBatch(emb, qids, k = 10).collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val jl = SimilarityOps.jlProjectTopKBatch(emb, qids, k = 10).collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val rs = qids.map(q => exact(q).intersect(jl(q)).size / 10.0)
    assert(rs.sum / rs.size >= 0.8,
      s"JL mean recall ${rs.sum / rs.size} (per-query $rs)")
    // and the re-rank property: every EMITTED similarity is the exact
    // e4 cosine, so hits agree with the exact ranking's scores
    val exactSims = SimilarityOps.bruteForceTopKBatch(emb, qids, k = 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")) ->
        r.getAs[Long]("sim_e4")).toMap
    val jlSims = SimilarityOps.jlProjectTopKBatch(emb, qids, k = 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")) ->
        r.getAs[Long]("sim_e4")).toMap
    val shared = exactSims.keySet.intersect(jlSims.keySet)
    assert(shared.nonEmpty && shared.forall(k => exactSims(k) == jlSims(k)),
      "re-ranked sims diverged from exact cosine")
  }

  test("s21 JL+IVF composition: cell pruning trades bounded recall for half the probes") {
    // deterministic corpus + planes + seed centroids -> fixed
    // measurement: 0.78 at nprobe 8/16 vs s20's 0.82 scanning every
    // projected vector. The composed index can only lose what pruning
    // removes (same transform, same re-rank), so s21 <= s20 must hold,
    // and the floor pins the probe budget on the measured knee.
    val qids = SimilarityOps.BatchQueryIds
    val exact = SimilarityOps.bruteForceTopKBatch(emb, qids, k = 10).collect()
      .groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val byQ = df.collect().groupBy(_.getAs[Long]("qid"))
        .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
      val rs = qids.map(q => exact(q).intersect(byQ(q)).size / 10.0)
      rs.sum / rs.size
    }
    val jlFull = recallOf(SimilarityOps.jlProjectTopKBatch(emb, qids, k = 10))
    val jlIvf = recallOf(SimilarityOps.jlIvfTopKBatch(emb, qids, k = 10))
    assert(jlIvf <= jlFull,
      s"cell-pruned recall $jlIvf exceeds full reduced-space scan $jlFull")
    assert(jlIvf >= 0.7, s"JL+IVF mean recall $jlIvf below the measured knee")
  }

  test("s17 incremental add: appended vectors probe-visible, layout complete, no rebuild") {
    val res = graft.queries.Catalog.queries("s17_similarity_ivf_add")(spark, sf0001)
      .collect()
    // the query vector is itself an ADDED one — rank 1, exact self-match,
    // served from an appended cell file
    assert(res.head.getAs[Long]("vec_id") === 0L, res.mkString(", "))
    assert(res.head.getAs[Long]("sim_e4") === 10000L, res.mkString(", "))
    // merged layout holds every vector exactly once (base + added)
    val key = "s17_index#" + new java.io.File(sf0001).getCanonicalPath
    val path = graft.io.TempLayouts.cached(key, "graft_ivf_incr_")(_ =>
      fail("index rebuilt on reuse"))
    val cells = spark.read.parquet(s"$path/cells")
    val n = emb.count()
    assert(cells.count() === n)
    assert(cells.select("vec_id").distinct().count() === n)
    val added = cells.filter(col("vec_id") % 5 === 0).count()
    assert(added === emb.filter(col("vec_id") % 5 === 0).count())
    // the centroid matrix is untouched by the add: exactly the base
    // seeds (vec_id < 16, vec_id % 5 != 0). Frozen-assignment
    // correctness itself is proven end-to-end by the DuckDB oracle
    // (the probe replay assigns ALL vectors against these centroids).
    val centroidIds = spark.read.parquet(s"$path/centroids")
      .select("cell_id").collect().map(_.getLong(0)).sorted
    assert(centroidIds.toSeq ===
      (0L until 16L).filter(_ % 5 != 0).toSeq)
  }

  test("d06 SemDeDup: every reported link is a true >=threshold pair; drop set is sound") {
    val thresholdE4 = 3500L
    val got = SimilarityOps.semanticDedup(emb, nCells = 16, refine = 2,
      simThresholdE4 = thresholdE4).collect()
      .map(r => (r.getAs[Long]("dropped_id"), r.getAs[Long]("kept_id"),
        r.getAs[Long]("sim_e4"), r.getAs[Long]("n_dup_links")))
    graft.InternalCaches.releaseAll()
    assert(got.nonEmpty, "planted-free corpus still has >=0.35 pairs; drop set must be non-empty")
    val all = emb.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getSeq[Float](r.fieldIndex("embedding")).toArray.map(_.toDouble)))
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // global ground truth: ids with ANY lower-id neighbor at >= threshold
    val ids = all.keys.toArray.sorted
    val globalDrops = (for {
      i <- ids.indices; j <- 0 until i
      if math.round(cos(all(ids(j)), all(ids(i))) * 10000) >= thresholdE4
    } yield ids(i)).toSet
    got.foreach { case (dropped, kept, simE4, links) =>
      assert(kept < dropped, s"keep-first violated: $kept >= $dropped")
      assert(simE4 >= thresholdE4, s"reported link below threshold: $simE4")
      // the reported evidence link re-checks against exact cosine
      assert(math.round(cos(all(kept), all(dropped)) * 10000) === simE4,
        s"evidence link ($kept,$dropped) does not match exact cosine")
      assert(links >= 1L)
    }
    // cell blocking only ever SHRINKS the pair set: drops ⊆ global drops
    val dropSet = got.map(_._1).toSet
    assert(dropSet.subsetOf(globalDrops),
      s"phantom drops: ${dropSet.diff(globalDrops)}")
  }

  test("s12 cell-blocked kNN join: similarities exact, recall vs s11 non-trivial") {
    val exact = SimilarityOps.knnJoinExact(emb, k = 5).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val blocked = SimilarityOps.knnJoinCells(emb, k = 5, nCells = 16, refine = 2)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"), r.getAs[Long]("sim_e4")))
    graft.InternalCaches.releaseAll()
    val all = emb.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getSeq[Float](r.fieldIndex("embedding")).toArray.map(_.toDouble)))
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // soundness: blocking can only MISS neighbors, never misscore one —
    // every reported similarity must equal the exact cosine
    blocked.foreach { case (q, v, simE4) =>
      assert(math.round(cos(all(q), all(v)) * 10000) === simE4,
        s"($q,$v) reported $simE4 != exact cosine")
      assert(q !== v)
    }
    // every anchor that landed in a >1-vector cell reports neighbors
    val byQ = blocked.map(t => (t._1, t._2)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    // recall floor at the SHIPPED default (nprobe = KnnJoinNprobe of 16
    // cells): the retrieval-grade bar from the measured curve — 0.83 on
    // this corpus, asserted at 0.8 (see knnJoinCells scaladoc; this
    // near-uniform corpus is the worst case for partition-based ANN)
    val recalls = exact.keys.toSeq.map { q =>
      byQ.get(q).map(n => (n & exact(q)).size.toDouble / exact(q).size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(f"s12 mean recall@5 = $mean%.3f (nprobe=${SimilarityOps.KnnJoinNprobe}, 16 cells)")
    assert(mean >= 0.8,
      s"mean recall $mean below the retrieval-grade default's measured floor")
  }

  test("s13: MIPS top-k equals an exact driver-side dot-product recompute and differs from cosine order") {
    val emb = graft.io.Tables(spark, sf0001).embeddings
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // replicate the planted item norm: scale item id's vector by
    // (4 + id mod 7)/4 in double; queries stay raw
    def dotE4(id: Long, item: Array[Float], q: Array[Float]): Long = {
      val f = (4L + id % 7L).toDouble / 4.0
      var s = 0.0; var i = 0
      while (i < item.length) { s += item(i).toDouble * f * q(i).toDouble; i += 1 }
      math.round(s * 10000)
    }
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val expected = qids.flatMap { q =>
      emb.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, dotE4(id, v, emb(q))) }
        .sortBy { case (id, d) => (-d, id) }.take(10).zipWithIndex
        .map { case ((id, d), i) => (q, i + 1L, id, d) }
    }
    val got = graft.queries.Catalog.queries("s13_similarity_mips_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // the corpus has varying norms, so MIPS order must differ from
    // cosine order for at least one query — otherwise s13 adds nothing
    val cosine = graft.queries.Catalog.queries("s05_similarity_batch_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val mipsIds = got.map(g => (g._1, g._2, g._3))
    assert(mipsIds !== cosine, "MIPS top-k identical to cosine top-k — norms carry no signal here")
  }

  test("s14: IVF-PQ is deterministic, score-ordered, and finds real neighbors through both quantizers") {
    def run() = graft.queries.Catalog.queries("s14_similarity_ivfpq_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val got = run()
    graft.InternalCaches.releaseAll()
    assert(run() === got, "IVF-PQ not deterministic across runs")
    graft.InternalCaches.releaseAll()
    assert(got.map(_._1).distinct.sorted === Seq(0L, 1L, 2L, 3L, 4L))
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.size === 10)
      // ADC scores are negated squared distances: descending down the list
      assert(sorted.map(_._4).zip(sorted.map(_._4).tail).forall { case (a, b) => a >= b })
    }
    // through BOTH lossy quantizers (coarse cells + 4×16 PQ), the index
    // must still find a real share of the exact top-10 — the point of
    // composing the structures instead of stacking noise
    val exact = graft.queries.Catalog.queries("s05_similarity_batch_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = got.map(g => (g._1, g._3)).count(exact.contains).toDouble / exact.size
    info(f"s14 recall@10 vs exact = $recall%.3f (nprobe=4/16 cells, 4x16 PQ)")
    assert(recall >= 0.3, s"IVF-PQ recall $recall collapsed")
  }

  test("s18 range search: equals the exact radius set restricted to probed cells (full driver replay)") {
    val emb = Tables(spark, sf0001).embeddings.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val vecs = emb.toMap
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1048576.0).toLong + 2097152L)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      ad.zip(bd).map { case (x, y) => x * y }.sum /
        (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val cents = (0L until 16L).map(i => i -> quant(vecs(i)))
    val cell = emb.map { case (id, v) =>
      val q = quant(v)
      id -> cents.map { case (c, cv) => (d2(q, cv), c) }.min._2
    }.toMap
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val probed = qids.map { qid =>
      val q = quant(vecs(qid))
      qid -> cents.map { case (c, cv) => (d2(q, cv), c) }.sorted.take(4).map(_._2).toSet
    }.toMap
    val expect = (for {
      qid <- qids
      (id, v) <- emb
      if id != qid && probed(qid).contains(cell(id))
      s = math.round(cos(v, vecs(qid)) * 10000)
      if s >= 3000L
    } yield (qid, id, s)).toSet
    val got = graft.queries.Catalog.queries("s18_similarity_range_search")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect,
      s"range set mismatch: extra=${got -- expect}, missing=${expect -- got}")
    assert(got.nonEmpty, "radius should capture at least one neighbor at sf0.001")
  }

  test("s19 MMR: equals an exact driver-side greedy replay over the real corpus") {
    val vecs = graft.io.Tables(spark, sf0001).embeddings
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def e4(a: Array[Float], b: Array[Float]): Long = math.round(cos(a, b) * 10000)
    val expected = Seq(0L, 1L, 2L, 3L, 4L).flatMap { q =>
      val cand = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, e4(v, vecs(q))) }
        .sortBy { case (id, r) => (-r, id) }.take(16)
      val rel = cand.toMap
      var selected = Vector.empty[(Long, Long)] // (id, mmr_score)
      (1 to 5).foreach { _ =>
        val remaining = cand.filterNot { case (id, _) => selected.exists(_._1 == id) }
        val pick = remaining.map { case (id, r) =>
          val ms = if (selected.isEmpty) 0L
          else selected.map(s => e4(vecs(id), vecs(s._1))).max
          (id, 7L * r - 3L * ms)
        }.minBy { case (id, sc) => (-sc, id) }
        selected :+= pick
      }
      selected.zipWithIndex.map { case ((id, sc), i) => (q, i + 1L, id, rel(id), sc) }
    }
    val got = graft.queries.Catalog.queries("s19_similarity_mmr")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    graft.InternalCaches.releaseAll()
    assert(got === expected)
  }

  test("s19 MMR: a planted near-duplicate of the top hit is deferred below a diverse candidate") {
    import testImplicits._
    def unit(v: Array[Double]): Array[Float] = {
      val m = math.sqrt(v.map(x => x * x).sum); v.map(x => (x / m).toFloat)
    }
    // query along e1; c1 at 18°, c2 a near-clone of c1, c3 equally
    // relevant but rotated into a DIFFERENT plane (sim(c3,c1)≈cos²θ),
    // c4/c5 fillers. Pure top-3 by relevance = (1, 2, 3); MMR must
    // defer the clone: 7·Δrel ≈ 7·(9510−9455) ≪ 3·Δsim ≈ 3·(9999−7986).
    val rows = Seq(
      (0L, unit(Array(1.0, 0, 0, 0))),
      (1L, unit(Array(0.951, 0.309, 0, 0))),
      (2L, unit(Array(0.950, 0.312, 0, 0))),
      (3L, unit(Array(0.9455, 0, 0.3256, 0))),
      (4L, unit(Array(0.5, 0, 0, 0.866))),
      (5L, unit(Array(0.0, 0, 1.0, 0))))
    val df = rows.toDF("vec_id", "embedding")
    val got = SimilarityOps.mmrTopKBatch(df, Seq(0L), nCand = 5, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.length === 3 && got.map(_._2).distinct.length === 3, got.toSeq.toString)
    assert(got(0) === ((1L, 1L)), s"rk1 must be the relevance argmax: ${got.toSeq}")
    assert(got(1) === ((2L, 3L)),
      s"rk2 must be the diverse candidate, not the near-duplicate: ${got.toSeq}")
  }

  test("s23: RRF fusion equals a driver-side recompute from the two channel rankings") {
    val t = Tables(spark, sf0001)
    val fetchK = 20
    // the two channel rankings, as the fusion engine consumes them
    val lex = graft.text.TextOps
      .bm25TopK(t.documents, graft.text.TextOps.bm25QueryTermsDf(spark), fetchK)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(1))).toMap
    val dense = SimilarityOps.bruteForceTopKBatch(t.embeddings, Seq(0L, 1L, 2L), fetchK)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(1))).toMap
    def contrib(rk: Option[Long]): Long =
      rk.map(r => math.floor(1000000.0 / (60 + r)).toLong).getOrElse(0L)
    val expected = (lex.keySet ++ dense.keySet).toSeq
      .map { case (q, d) =>
        (q, d, contrib(lex.get((q, d))) + contrib(dense.get((q, d)))) }
      .groupBy(_._1)
      .flatMap { case (q, cands) =>
        cands.sortBy { case (_, d, s) => (-s, d) }.take(10).zipWithIndex
          .map { case ((_, d, s), i) => (q, i + 1L, d, s) } }
      .toSeq.sorted
    val got = graft.queries.Catalog
      .queries("s23_similarity_hybrid_rrf")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got === expected)
    // the fusion is genuinely two-channel on this corpus: some fused
    // top-10 doc must come from each channel alone (a fusion that
    // degenerates to one channel would pass the equality above even if
    // the other channel's join were broken)
    val fusedDocs = got.map(r => (r._1, r._3)).toSet
    assert(fusedDocs.exists(k => dense.contains(k) && !lex.contains(k)),
      "no dense-only doc reached the fused top-10")
    assert(fusedDocs.exists(k => lex.contains(k) && !dense.contains(k)),
      "no lexical-only doc reached the fused top-10")
  }

  test("s25: recall is monotone in nprobe and exactly 1.0 when every cell is probed") {
    def report(nprobe: Int): Map[Long, Long] =
      SimilarityOps.ivfRecallReport(emb, SimilarityOps.BatchQueryIds,
          k = 10, nCells = 16, nprobe = nprobe)
        .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("n_hit")).toMap
    val r1 = report(1); val r4 = report(4); val rAll = report(16)
    SimilarityOps.BatchQueryIds.foreach { q =>
      assert(r1(q) <= r4(q), s"query $q: recall not monotone in nprobe")
      assert(r4(q) <= rAll(q), s"query $q: recall not monotone in nprobe")
      // probing all 16 cells scans the whole corpus — the IVF ranking
      // collapses to the exact ranking and recall is exactly 1.0
      assert(rAll(q) === 10L, s"query $q: full probe must recover exact")
    }
  }

  test("s24: tombstoned vectors never surface; compaction is probe-equivalent") {
    import graft.similarity.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_delspec").toString
    IvfIndex.build(emb, dir, nCells = 16)
    val qVec = emb.filter(col("vec_id") === 3L).head().getSeq[Float](1).toArray
    // before any delete: the query vector IS vec 3 — top hit is itself
    val before = IvfIndex.topK(spark, dir, qVec, k = 10, nprobe = 4).collect()
    assert(before.head.getLong(0) === 3L && before.head.getLong(1) === 10000L)
    IvfIndex.delete(emb.filter(col("vec_id") % 7 === 3).select("vec_id"), dir)
    val after = IvfIndex.topK(spark, dir, qVec, k = 10, nprobe = 4).collect()
    assert(after.nonEmpty)
    assert(after.forall(_.getLong(0) % 7 != 3), "a tombstoned vector surfaced")
    // merge-on-read ≡ the same probe over an index built WITHOUT them:
    // physical compaction must not change a single result row
    val compacted = java.nio.file.Files.createTempDirectory("graft_ivf_delspec_c").toString
    IvfIndex.compactTo(spark, dir, compacted)
    val viaCompact = IvfIndex.topK(spark, compacted, qVec, k = 10, nprobe = 4).collect()
    assert(viaCompact.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      after.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // compaction folded the tombstones in: the compacted cells physically
    // lack the deleted ids (not just hide them)
    val cells = spark.read.parquet(s"$compacted/cells")
    assert(cells.filter(col("vec_id") % 7 === 3).count() === 0L)
    // second delete batch appends (delete is incremental like add)
    IvfIndex.delete(emb.filter(col("vec_id") === after.head.getLong(0)).select("vec_id"), dir)
    val after2 = IvfIndex.topK(spark, dir, qVec, k = 10, nprobe = 4).collect()
    assert(after2.forall(_.getLong(0) !== after.head.getLong(0)),
      "second delete batch was not merged on read")
  }
}
