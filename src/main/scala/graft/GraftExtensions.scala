package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{BpeDecode, BpeEncodeIds, CharNgramHashes, CosineSimilarity, HammingDistance, Md5Prefix64, MinHashSignature, PlaneProjectE4, SimHash64, SortedIntersectSize, SquaredDistanceLong, TokenChunks, TopRepeatCountsExpr, WinnowSketch, WinnowSketchMd5, WordNgramHashes, WordNgramMd5Hashes}

/** Engine extension point, registered via `spark.sql.extensions`
  * (set in [[GraftSession.tune]]). Injects the native vector
  * expressions so they are usable both from the Column API
  * (`call_function`) and from SQL text. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getCanonicalName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "cosine_similarity(a, b) - cosine similarity of two float arrays in double precision"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("hamming_distance"),
      info("hamming_distance",
        "hamming_distance(a, b) - number of differing positions of two int arrays"),
      (args: Seq[Expression]) => HammingDistance(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("squared_distance_long"),
      info("squared_distance_long",
        "squared_distance_long(a, b) - integer squared L2 distance of two bigint arrays"),
      (args: Seq[Expression]) => SquaredDistanceLong(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("plane_project_e4"),
      info("plane_project_e4",
        "plane_project_e4(emb, plane_bits) - signed +/-1-plane JL projection to e4-quantized bigint coordinates"),
      (args: Seq[Expression]) => PlaneProjectE4(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      info("sorted_intersect_size",
        "sorted_intersect_size(a, b) - intersection size of two sorted distinct long arrays"),
      (args: Seq[Expression]) => SortedIntersectSize(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64",
        "simhash64(hashes) - 64-bit SimHash of a token-hash array"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(hashes, k) - k-permutation MinHash signature of a shingle-hash array"),
      (args: Seq[Expression]) => MinHashSignature(args(0),
        args(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("top_repeat_counts"),
      info("top_repeat_counts",
        "top_repeat_counts(tokens) - max occurrence count of any token and any adjacent bigram"),
      (args: Seq[Expression]) => TopRepeatCountsExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("word_ngram_hashes"),
      info("word_ngram_hashes",
        "word_ngram_hashes(text, n) - sorted distinct rotate-xor hashes of whitespace-token n-grams"),
      (args: Seq[Expression]) => WordNgramHashes(args(0),
        args(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("char_ngram_hashes"),
      info("char_ngram_hashes",
        "char_ngram_hashes(text, n) - sorted distinct xxhash64 values of character n-grams"),
      (args: Seq[Expression]) => CharNgramHashes(args(0),
        args(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("winnow_sketch"),
      info("winnow_sketch",
        "winnow_sketch(text, n, k) - k smallest xxhash64 values over char n-grams"),
      (args: Seq[Expression]) => WinnowSketch(args(0),
        args(1).eval().asInstanceOf[Int], args(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("winnow_sketch_md5"),
      info("winnow_sketch_md5",
        "winnow_sketch_md5(text, n, k) - k smallest 16-hex-char md5 prefixes over char n-grams (engine-portable hash family)"),
      (args: Seq[Expression]) => WinnowSketchMd5(args(0),
        args(1).eval().asInstanceOf[Int], args(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("word_ngram_md5_hashes"),
      info("word_ngram_md5_hashes",
        "word_ngram_md5_hashes(text, n) - sorted distinct md5-prefix hashes of space-joined token n-grams (engine-portable hash family)"),
      (args: Seq[Expression]) => WordNgramMd5Hashes(args(0),
        args(1).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix64"),
      info("md5_prefix64",
        "md5_prefix64(text) - first 8 bytes of md5 as a big-endian 64-bit value (engine-portable hash family)"),
      (args: Seq[Expression]) => Md5Prefix64(args(0))))
    // token_chunks is a native Generator (UDTF) — the analyzer's
    // ExtractGenerator hoists it from a SELECT list into a Generate
    // node, same as explode; also usable as LATERAL VIEW in SQL.
    ext.injectFunction((
      FunctionIdentifier("token_chunks"),
      info("token_chunks",
        "token_chunks(text, chunk_tok, stride) - (chunk_idx, chunk_text) rows of fixed-token windows with overlap"),
      (args: Seq[Expression]) => TokenChunks(args(0),
        args(1).eval().asInstanceOf[Int], args(2).eval().asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("bpe_encode"),
      info("bpe_encode",
        "bpe_encode(text, merges) - byte-level BPE token ids for a packed array<long> merge list"),
      (args: Seq[Expression]) => BpeEncodeIds(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("bpe_decode"),
      info("bpe_decode",
        "bpe_decode(ids, merges) - UTF-8 decode of BPE token ids for a packed array<long> merge list"),
      (args: Seq[Expression]) => BpeDecode(args(0), args(1))))
    // Spark's runtime-filter bloom pair, internal-only in the builtin
    // registry (used by InjectRuntimeFilter) — exposed here so EXPLICIT
    // bloom-prefilter plans can be written where the optimizer's
    // heuristic would not inject one (t26: a broadcast ~KB bloom prunes
    // the corpus-scale side map-side BEFORE any shuffle; the exact
    // verify join downstream keeps the result exact).
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "bloom_filter_agg(xxhash64(x), n_items, n_bits) - binary bloom filter over the input hashes"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args(0), args(1), args(2))))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      info("might_contain",
        "might_contain(bloom, xxhash64(x)) - probabilistic membership probe (no false negatives)"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(args(0), args(1))))

    // Summary navigation (graft.plans.SummaryRewrite): answer a
    // fact-table aggregate from a registered materialized summary —
    // a logical optimizer rule, the extension surface for
    // whole-plan rewrites (expressions above only add functions).
    ext.injectOptimizerRule(_ => graft.plans.SummaryRewrite)

    // Native as-of join (graft.plans.AsofJoinNode → AsofJoinExec): the
    // whole-operator surface — a custom logical node planned by a
    // custom strategy into a custom merge-scan executor (q78; the
    // composed window formulation q23 stays as the oracle twin).
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
