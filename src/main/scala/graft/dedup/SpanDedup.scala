package graft.dedup

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.GraftQuery

/** Exact duplicated-SPAN detection — the substring-level complement of
  * the document-level dedup family (d01–d07). Document dedup misses the
  * dominant real-world failure mode: boilerplate (headers, license
  * blocks, templated paragraphs) repeated VERBATIM inside otherwise
  * unique documents. Training-data pipelines remove those spans, not the
  * documents (Lee et al., "Deduplicating Training Data Makes Language
  * Models Better", ACL 2022 — their suffix-array ExactSubstr step).
  *
  * The distributed formulation replaces the suffix array with k-char
  * gram inversion, which shards naturally: a span of length ≥ k is
  * shared verbatim between two documents iff every one of its k-grams
  * is shared, so marking each position whose k-gram occurs in ≥ 2
  * distinct documents finds exactly the characters lying in cross-doc
  * duplicated runs of length ≥ k. Pipeline: (1) explode each doc into
  * per-position k-grams, hashed to md5 immediately so the shuffle
  * carries 32-hex keys instead of raw text; (2) one partial-agg
  * count-distinct shuffle finds grams seen in ≥ 2 docs; (3) join marks
  * duplicated start positions; (4) a per-document interval-union window
  * (running max of covered end → island ids → per-island min/max)
  * merges overlapping starts into maximal spans.
  *
  * Scale: work is O(total chars) rows through ONE wide shuffle (the
  * gram group-by); the window stage is per-document (partitioned by
  * doc_id, never global). At 100 TB the gram table is the cost center —
  * exactly why the hash happens before the exchange — and hot grams
  * (a license line in a billion docs) collapse map-side in the partial
  * count-distinct. All-integer outputs (counts, span chars, permille
  * ratio) → the DuckDB oracle replays every stage bit-for-bit.
  */
object SpanDedup {

  /** Minimum verbatim run length (chars) that counts as duplication —
    * short enough to catch templated sentences in this corpus' ~300-char
    * docs, long enough that chance collisions are impossible to express
    * twice independently. */
  val K = 30

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "d08_dup_span_detect",
      "cross-document verbatim span detection via k-gram inversion + interval union",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val k = K
        val docs = t.documents
          .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("len"))
        val grams = graft.InternalCaches.track {
          // ~300 grams + md5s per input row: rebalance the small doc
          // table first so the fan-out stage uses every core, not the
          // scan's input-split count (see graft.ops.FanOut)
          graft.ops.FanOut(docs.filter(col("len") >= k))
            .select(col("doc_id"),
              explode(sequence(lit(1L), col("len") - lit(k - 1).cast("long"))).as("pos"),
              col("text"))
            .select(col("doc_id"), col("pos"),
              md5(expr(s"substring(text, pos, $k)")).as("h"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        }
        val dup = grams.groupBy(col("h"))
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2)
          .select(col("h"))
        // `dup` is CORPUS-sized (every gram of every shared span), so it
        // must never broadcast: the static size estimate of the
        // agg+filter undershot the 64 MB threshold and Spark planned a
        // broadcast build that collected the multi-GB gram set to the
        // driver at the 500k-doc sweep tier (found by VecScale round
        // 14). MERGE forces the spill-safe sort-merge semi join; both
        // sides arrive hash-clustered on h from the count-distinct
        // shuffle, so the extra exchange is on the (smaller) dup side
        // only.
        val starts = grams.join(dup.hint("merge"), Seq("h"), "left_semi")
          .select(col("doc_id"), col("pos"))
        val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
        val spans = starts
          .withColumn("e", col("pos") + lit(k.toLong - 1))
          .withColumn("prev_end", max(col("e")).over(wPrev))
          .withColumn("newi",
            when(col("prev_end").isNull || col("pos") > col("prev_end"), 1L)
              .otherwise(0L))
          .withColumn("island",
            sum(col("newi")).over(wOrd.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .groupBy(col("doc_id"), col("island"))
          .agg(min(col("pos")).as("s"), max(col("e")).as("e2"),
            count(lit(1)).as("nstart"))
        spans.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_spans"),
            sum(col("e2") - col("s") + 1).as("dup_chars"),
            sum(col("nstart")).as("n_dup_starts"))
          .join(docs.select(col("doc_id"), col("len").as("n_chars")), "doc_id")
          .select(col("doc_id"), col("n_chars"), col("n_dup_starts"),
            col("n_spans"), col("dup_chars"),
            expr("dup_chars * 1000 div n_chars").as("dup_permille"))
          .orderBy(col("doc_id"))
      },
      Some(
        s"""WITH docs AS (
          |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len FROM documents),
          |grams AS (
          |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
          |         md5(substr(text, CAST(pos AS INT), $K)) AS h
          |  FROM (SELECT doc_id, text,
          |               unnest(range(1, CAST(len AS INT) - ${K - 2})) AS pos
          |        FROM docs WHERE len >= $K)),
          |dup AS (SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
          |starts AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (h)),
          |sp AS (
          |  SELECT doc_id, pos, pos + ${K - 1} AS e,
          |         max(pos + ${K - 1}) OVER (PARTITION BY doc_id ORDER BY pos
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
          |  FROM starts),
          |isl AS (
          |  SELECT doc_id, pos, e,
          |         SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
          |           OVER (PARTITION BY doc_id ORDER BY pos
          |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          |  FROM sp),
          |agg1 AS (
          |  SELECT doc_id, island, min(pos) AS s, max(e) AS e2, count(*) AS nstart
          |  FROM isl GROUP BY 1, 2),
          |agg2 AS (
          |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
          |         CAST(sum(e2 - s + 1) AS BIGINT) AS dup_chars,
          |         CAST(sum(nstart) AS BIGINT) AS n_dup_starts
          |  FROM agg1 GROUP BY 1)
          |SELECT a.doc_id, d.len AS n_chars, a.n_dup_starts, a.n_spans, a.dup_chars,
          |       a.dup_chars * 1000 // d.len AS dup_permille
          |FROM agg2 a JOIN docs d USING (doc_id)
          |ORDER BY a.doc_id""".stripMargin)
    )
  )
}
