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

  test("text quality/TF-IDF/LM ops on a degenerate corpus (single-token + repeated-token docs)") {
    // Clone sf0.001 into a temp dir (Tables eagerly reads every footer)
    // with a pathological documents table: a 1-token doc (exercises the
    // empty-bigram guard the real corpora never hit — min 10 words
    // there) and a single-repeated-token doc. Re-writing events also
    // flips it from TIMESTAMP(NANOS) to micros, exercising the
    // TimestampType pass-through in Tables.normalizeEventTs.
    val dirPath = java.nio.file.Files.createTempDirectory("graft_edge_corpus")
    val dir = dirPath.toString
    val src = Tables(spark, sf0001)
    try {
    Seq(
      "lineitem" -> src.lineitem, "orders" -> src.orders,
      "customer" -> src.customer, "part" -> src.part,
      "supplier" -> src.supplier, "nation" -> src.nation,
      "region" -> src.region, "events" -> src.events,
      "embeddings" -> src.embeddings
    ).foreach { case (n, df) => df.write.parquet(s"$dir/$n.parquet") }
    Seq(
      (1L, "x", "en", "syn", 1L),
      (2L, "spark spark spark spark", "en", "syn", 23L),
      (3L, "alpha beta gamma delta", "en", "syn", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val t08 = graft.queries.Catalog.queries("t08_quality_gopher")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(t08(1L).getAs[Long]("n_words") === 1L)
    assert(t08(1L).getAs[Long]("top_bigram_cnt") === 0L) // no bigrams, no crash
    assert(t08(2L).getAs[Long]("top_token_cnt") === 4L)
    assert(t08(2L).getAs[Long]("top_bigram_cnt") === 3L) // "spark spark" x3
    assert(t08(3L).getAs[Long]("n_distinct") === 4L)
    assert(t08.values.forall(_.getAs[String]("verdict") === "drop")) // all < 20 words

    val t09 = graft.queries.Catalog.queries("t09_tfidf_terms")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every term here is unique to its doc (df=1, idf=ln 3); doc 1's only
    // term is x; per-doc output is capped at 3 rows even for doc 3's 4 terms
    assert(t09.filter(_._1 == 1L).toSeq === Seq((1L, 1L, "x")))
    assert(t09.count(_._1 == 3L) === 3)

    val t12 = graft.queries.Catalog.queries("t12_unigram_logprob")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_logp_e6")))
      .toMap
    // corpus = 9 tokens: x:1, spark:4, alpha..delta:1 each
    assert(t12(1L) === ((1L, math.round(math.log(1.0 / 9.0) * 1e6))))
    assert(t12(2L) === ((4L, 4L * math.round(math.log(4.0 / 9.0) * 1e6))))
    } finally {
      // the cloned dataset is a full sf0.001 copy — don't leak it per run
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("g02 triangle counting on a triangle-free graph returns empty (not an error)") {
    // a path graph has wedges but no closures — the wedge join must
    // produce candidates and the closure join must kill them all
    val edges = (0L until 10L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("u", "v")
    assert(graft.ops.GraphOps.trianglesFromEdges(edges).count() === 0L)
    graft.InternalCaches.releaseAll()
  }

  test("s11 kNN join with k larger than the corpus returns all neighbors, ranked") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.similarity.SimilarityOps.knnJoinExact(emb, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every anchor gets exactly n-1 = 2 neighbors despite k=10
    assert(got.groupBy(_._1).forall(_._2.length === 2))
    // ranks are dense 1..2 per anchor
    assert(got.groupBy(_._1).values.forall(_.map(_._2).sorted.toSeq === Seq(1L, 2L)))
  }

  test("g03 pointer doubling: an all-roots forest passes through unchanged at any round count") {
    // every link is a fixed point (root → root, 0): composition must be
    // the identity, one row per node, zero depths
    val links0 = (1L to 20L).map(n => (n, n, 0L)).toDF("node", "anc", "d")
    val got = graft.ops.GraphOps.resolvePointers(links0, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === (1L to 20L).map(n => (n, n, 0L)))
  }

  test("g03 pointer doubling: rounds beyond convergence are idempotent") {
    // depth-3 chain resolves in 2 rounds (2^2 = 4 >= 3); extra rounds
    // must not change the fixed point (resolved links self-compose)
    val links0 = Seq((0L, 0L, 0L), (1L, 0L, 1L), (2L, 1L, 1L), (3L, 2L, 1L))
      .toDF("node", "anc", "d")
    def run(rounds: Int) = graft.ops.GraphOps.resolvePointers(links0, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val want = Seq((0L, 0L, 0L), (1L, 0L, 1L), (2L, 0L, 2L), (3L, 0L, 3L))
    assert(run(2) === want)
    assert(run(6) === want)
  }

  test("q51 nesting a single-item order yields size-1 arrays and consistent stats") {
    // the smallest real order in sf0.001 must have n_items >= 1 and
    // first_ln equal to its min linenumber; total==max for 1-item orders
    val rows = graft.queries.Catalog.queries("q51_nested_order_items")(spark, sf0001)
      .collect()
    val singles = rows.filter(_.getAs[Long]("n_items") == 1L)
    assert(singles.nonEmpty, "sf0.001 should contain single-item orders")
    singles.foreach { r =>
      assert(r.getAs[Long]("revenue_cents") === r.getAs[Long]("max_item_cents"))
    }
  }

  test("g05 with a hub cap below every supplier degree returns empty, not an error") {
    // every supplier trades with >= 2 customers at sf0.001, so cap 1
    // excludes the whole witness dimension — the correct answer is an
    // empty prediction set, and the plan must not fail on it
    val out = graft.ops.GraphOps
      .linkPrediction(Tables(spark, sf0001), hubCap = 1L)
      .collect()
    graft.InternalCaches.releaseAll()
    assert(out.isEmpty)
  }

  test("audio content-hash decode rejects corrupt and foreign payloads, never throws") {
    import graft.multimodal.MultimodalOps.{AudioRecord, WavCodec}
    val good = WavCodec.encodeWav(3L)
    assert(WavCodec.decodeContentHash(AudioRecord(3L, good)).isDefined)
    // truncated mid-header, mid-data, empty, and non-RIFF payloads
    Seq(
      good.take(10),
      good.take(60),
      Array.emptyByteArray,
      "not a wav at all".getBytes("US-ASCII")
    ).foreach { p =>
      assert(WavCodec.decodeContentHash(AudioRecord(9L, p)).isEmpty,
        s"corrupt payload of ${p.length} bytes decoded")
    }
    // a declared-but-overlong chunk length must be rejected, not read OOB
    val lying = good.clone()
    java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue) // data chunk claims 2 GB
    assert(WavCodec.decodeContentHash(AudioRecord(9L, lying)).isEmpty)
  }

  test("MIPS batch with k larger than the corpus returns every item, ranked") {
    import graft.similarity.SimilarityOps
    val emb = Tables(spark, sf0001).embeddings.filter(col("vec_id") < 8L)
    val queries = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val out = SimilarityOps
      .mipsTopKBatch(SimilarityOps.mipsItemsScaled(emb), queries, k = 100)
      .collect()
    assert(out.length === 7, "expected all 7 non-self items")
    assert(out.map(_.getAs[Long]("rk")).toSeq === (1L to 7L))
  }

  test("BM25: unknown terms contribute nothing; an all-unknown query emits no rows") {
    val docs = Seq((1L, "spark joins data"), (2L, "spark spark streams"))
      .toDF("doc_id", "text")
    val queries = Seq((0L, "spark"), (0L, "zzz_not_in_corpus"), (1L, "qqq_unknown"))
      .toDF("query_id", "term")
    val out = graft.text.TextOps.bm25TopK(docs, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // query 1 has no corpus term → absent entirely (not an error, no null row)
    assert(!out.exists(_._1 == 1L), out.mkString(", "))
    // query 0 ranks both docs on 'spark' alone; the unknown term changes nothing
    val q0 = out.filter(_._1 == 0L)
    assert(q0.map(_._3).toSet === Set(1L, 2L))
    assert(q0.forall(_._4 > 0L), q0.mkString(", "))
  }

  test("BM25 on an empty corpus returns empty, not an error") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val queries = Seq((0L, "spark")).toDF("query_id", "term")
    assert(graft.text.TextOps.bm25TopK(docs, queries, k = 5).count() === 0L)
  }

  test("incremental dedup with an empty index: only new/dup_batch verdicts") {
    val index = Seq.empty[(String, Long)].toDF("fingerprint", "idx_canonical")
    val incoming = Seq((10L, "fpA"), (11L, "fpA"), (12L, "fpB"))
      .toDF("doc_id", "fingerprint")
    val out = graft.dedup.DedupOps.incrementalDedupVerdicts(index, incoming)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((10L, "new", 10L), (11L, "dup_batch", 10L),
      (12L, "new", 12L)))
  }

  test("incremental dedup with an empty batch returns empty, not an error") {
    val index = Seq(("fpA", 1L)).toDF("fingerprint", "idx_canonical")
    val incoming = Seq.empty[(Long, String)].toDF("doc_id", "fingerprint")
    assert(graft.dedup.DedupOps.incrementalDedupVerdicts(index, incoming)
      .count() === 0L)
  }
}
