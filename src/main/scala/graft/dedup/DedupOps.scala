package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.io.Tables
import graft.functions.TextFunctions._
import graft.queries.GraftQuery

/** Deduplication operators for the training-data pipeline: exact
  * (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.
  * (Embedding-cosine near-dup lives in graft.similarity.)
  *
  * The driver's `documents` table has no natural duplicates, so the fuzzy
  * dedup queries run over a deterministic derived corpus: each document
  * unioned with a perturbed copy (id + 100000). Whitespace perturbation
  * demonstrates exact/normalized dedup; last-3-words truncation
  * demonstrates near-dup detection. This keeps outputs non-empty and
  * verifiable while exercising exactly the plan shape a real corpus needs.
  *
  * Scale design (100 TB corpus): every stage is shuffle-bounded by
  * (band, signature) or (block, bits) keys — never an all-pairs product.
  * Bucket-size capping drops degenerate buckets (a stop-word-like
  * signature at scale would otherwise create a quadratic bucket); the cap
  * turns worst-case O(n²) into O(n·cap). Candidate verification re-joins
  * the shingle sets only for candidate pairs.
  */
object DedupOps {

  /** MinHash parameters: k hashes in b bands of r rows (k = b·r). */
  private val NumHashes = 32
  private val Bands = 8
  private val RowsPerBand = 4
  /** Max docs per LSH bucket before it is dropped as degenerate. */
  private val MaxBucket = 64

  /** Deterministic universal-hash coefficients (fixed seed — part of the
    * engine's spec, like Spark's own seed-42 murmur default). The 31-bit
    * domain keeps a·h+b < 2^62: no long overflow under ANSI mode. */
  private val MersennePrime = (1L << 31) - 1
  private val (permA, permB) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(NumHashes)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(NumHashes)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  /** documents ∪ whitespace-perturbed copies — equal after normalization. */
  def exactDupCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select(
        (col("doc_id") + lit(100000L)).as("doc_id"),
        concat(regexp_replace(col("text"), " ", "  "), lit(" ")).as("text")))

  /** documents ∪ last-3-words-truncated copies — near-dups (word-shingle
    * Jaccard ≈ 0.9), not exact dups. */
  def nearDupCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select(
        (col("doc_id") + lit(100000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\s+\\S+){3}$", "").as("text")))

  /** doc_id + distinct word-5-shingle set. */
  private def shingled(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("toks", tokens(col("text")))
      .withColumn("shingles", wordShingles("toks", 5))
      .select(col("doc_id"), col("shingles"))

  /** MinHash signature: one xxhash64 per shingle, then k affine
    * permutations (a·h+b mod 2⁶¹−1) folded with array_min — O(k·|S|)
    * integer ops per row, no per-permutation string hashing. */
  private def withSignature(sh: DataFrame): DataFrame = {
    val hs = transform(col("shingles"), s => pmod(xxhash64(s), lit(MersennePrime)))
    val sig = array((0 until NumHashes).map { j =>
      array_min(transform(col("hashes"),
        h => pmod(h * lit(permA(j)) + lit(permB(j)), lit(MersennePrime))))
    }: _*)
    sh.withColumn("hashes", hs).withColumn("minhash", sig).drop("hashes")
  }

  /** Explode the signature into (band, band_sig) LSH keys. */
  private def banded(sig: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map(i =>
      hash(lit(i), slice(col("minhash"), i * RowsPerBand + 1, RowsPerBand)))
    sig.select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_sig")
  }

  /** Candidate pairs from LSH buckets, with degenerate buckets dropped. */
  private def candidatePairs(buckets: DataFrame): DataFrame = {
    val smallBuckets = buckets
      .groupBy(col("band"), col("band_sig"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= MaxBucket)
      .select(col("band"), col("band_sig"))
    val pruned = buckets.join(smallBuckets, Seq("band", "band_sig"), "left_semi")
    val a = pruned.select(col("band"), col("band_sig"), col("doc_id").as("doc_a"))
    val b = pruned.select(col("band"), col("band_sig"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup pipeline over a (doc_id, text) corpus:
    * candidates from band buckets, verified with exact shingle Jaccard.
    *
    * The shingle and signature frames are persisted: both are consumed
    * by two downstream branches (banding + verification), and the
    * persist is also an optimizer barrier — without it CollapseProject
    * inlines the shingle expression into all 32 minhash lambdas and the
    * 8 band hashes, multiplying both per-row compute and plan size. */
  def minhashNearDups(corpus: DataFrame, threshold: Double): DataFrame = {
    val sh = shingled(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    val sig = withSignature(sh).persist(StorageLevel.MEMORY_AND_DISK)
    val cand = candidatePairs(banded(sig))
    val shA = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    cand
      .join(shA, Seq("doc_a"))
      .join(shB, Seq("doc_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash over word tokens: per-bit ±1 sums of token hashes,
    * thresholded to a bit vector. Computed with built-in higher-order
    * expressions (no UDF). */
  def withSimhashBits(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("toks", tokens(col("text")))
      .withColumn("th", expr("transform(array_distinct(toks), t -> xxhash64(t))"))
      .withColumn("sums", expr(
        """aggregate(th, array_repeat(0L, 64),
          |  (acc, h) -> zip_with(acc,
          |     transform(sequence(0, 63), b -> IF((shiftright(h, b) & 1) = 1, 1L, -1L)),
          |     (x, y) -> x + y))""".stripMargin))
      .withColumn("bits", expr("transform(sums, s -> IF(s >= 0, 1, 0))"))
      .select(col("doc_id"), col("bits"))

  /** SimHash near-dups: LSH on 4×16-bit blocks (a pair within Hamming
    * distance ≤ maxHamming must share ≥1 exact block when maxHamming < 4·1;
    * with 4 blocks this is exact for distance ≤ 3 and high-recall above),
    * then exact Hamming verification. */
  def simhashNearDups(corpus: DataFrame, maxHamming: Int): DataFrame = {
    val sig = withSimhashBits(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    val blocks = sig.select(col("doc_id"), col("bits"),
        posexplode(expr(
          "transform(sequence(0, 3), k -> hash(k, slice(bits, k * 16 + 1, 16)))")))
      .withColumnRenamed("pos", "block")
      .withColumnRenamed("col", "block_sig")
    val a = blocks.select(col("block"), col("block_sig"),
      col("doc_id").as("doc_a"), col("bits").as("bits_a"))
    val b = blocks.select(col("block"), col("block_sig"),
      col("doc_id").as("doc_b"), col("bits").as("bits_b"))
    a.join(b, Seq("block", "block_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("bits_a"), col("bits_b"))
      .distinct()
      .withColumn("hamming",
        graft.functions.VectorFunctions.hammingDistance(col("bits_a"), col("bits_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // d01: exact dedup = hash-groupBy on the normalized content
    // fingerprint (one shuffle on the fingerprint key; at 100 TB this is
    // the cheapest possible exact-dedup plan — no pairwise work).
    GraftQuery(
      "d01_dedup_exact",
      "exact dedup groups by normalized-content fingerprint (corpus = docs ∪ whitespace-perturbed)",
      (spark, dir) => {
        val t = Tables(spark, dir)
        exactDupCorpus(t.documents)
          .select(col("doc_id"), contentFingerprint(col("text")).as("fingerprint"))
          .groupBy(col("fingerprint"))
          .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("dup_cnt"))
          .select(col("canonical_id"), col("dup_cnt"), col("fingerprint"))
          .orderBy(col("canonical_id"))
      },
      Some(
        """WITH corpus AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 100000 AS doc_id, replace(text, ' ', '  ') || ' ' AS text FROM documents),
          |fp AS (
          |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
          |  FROM corpus)
          |SELECT min(doc_id) AS canonical_id, count(*) AS dup_cnt, fingerprint
          |FROM fp
          |GROUP BY fingerprint
          |ORDER BY canonical_id""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // d02: MinHash+LSH near-dup detection (shingle→minhash→band→
    // bucket-join→verify). Hash-family-specific → rows-only check; the
    // ScalaTest asserts every planted near-dup pair (i, i+100000) is
    // recovered and no false positive survives verification.
    GraftQuery(
      "d02_dedup_minhash_lsh",
      "MinHash+LSH near-dup pairs with exact-Jaccard verification (rows-only)",
      (spark, dir) => {
        val t = Tables(spark, dir)
        minhashNearDups(nearDupCorpus(t.documents), threshold = 0.5)
      },
      None
    ),

    // ------------------------------------------------------------------
    // d03: exact n-gram Jaccard similarity, blocked by the `source`
    // column (the blocking key bounds the pairwise work; at scale the
    // blocking key is what you have — LSH, source, URL host...).
    // Jaccard is a ratio of two exact ints → bit-identical double in
    // both engines → fully oracle-checked.
    GraftQuery(
      "d03_dedup_ngram_jaccard",
      "top-20 most-similar doc pairs by char-8-gram Jaccard within source blocks",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val g = t.documents
          .withColumn("grams", charShingles("text", 8))
          .select(col("doc_id"), col("source"), col("grams"))
        val a = g.select(col("source"), col("doc_id").as("doc_a"), col("grams").as("g_a"))
        val b = g.select(col("source"), col("doc_id").as("doc_b"), col("grams").as("g_b"))
        a.join(b, Seq("source"))
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            jaccard(col("g_a"), col("g_b")).as("jaccard"))
          .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
          .limit(20)
      },
      Some(
        """WITH g AS (
          |  SELECT doc_id, source,
          |         list_distinct([text[i:i+7] FOR i IN range(1, greatest(length(text)-6, 2))]) AS grams
          |  FROM documents)
          |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |       CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          |         / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) AS jaccard
          |FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
          |ORDER BY jaccard DESC, doc_a, doc_b
          |LIMIT 20""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // d04: SimHash near-dup pairs (rows-only — hash-family-specific).
    GraftQuery(
      "d04_dedup_simhash",
      "SimHash(64-bit) near-dup pairs via 16-bit-block LSH (rows-only)",
      (spark, dir) => {
        val t = Tables(spark, dir)
        simhashNearDups(nearDupCorpus(t.documents), maxHamming = 3)
      },
      None
    )
  )
}
