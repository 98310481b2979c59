package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.GraftQuery

/** Sequence packing — the "concat-and-chop" layout step of an LLM
  * training-data pipeline: documents are concatenated in a fixed corpus
  * order with an EOS separator and the token stream is chopped into
  * fixed-length training sequences. The engine's job is the OFFSET
  * arithmetic: for every document, which training sequences does it land
  * in? (Downstream loaders use exactly this map to materialize batches
  * and to attribute a training sequence back to its source documents.)
  *
  * Packing is per `source` shard — the way real pipelines run it, so a
  * shard can be re-packed or re-mixed without renumbering the world. The
  * cumulative offset is then a `Window.partitionBy(source)` running sum:
  * ONE hash shuffle on the shard key, and each shard's prefix sum is
  * independent — the 100 TB shape (a corpus-GLOBAL offset would instead
  * use the per-partition-count + broadcast-prefix technique of
  * q09/SurrogateKeys; per-shard numbering avoids needing it). Shard skew
  * bounds the straggler: a shard's cost is its own token count, and
  * shards are sized by the upstream sharder, not by the data.
  *
  * Every quantity is exact BIGINT arithmetic (token counts, running
  * sums, integer division by the sequence length), so the DuckDB oracle
  * replays the packing bit-for-bit — including `n_seqs`, the number of
  * training sequences a document straddles.
  */
object PackingOps {

  /** Training sequence length in whitespace tokens (the catalog's
    * documents average ~50 tokens, so a shard of 250 docs packs into
    * ~25 sequences — the same doc:seq ratio a 4k-token context over
    * ~400-token web docs gives at production scale). */
  val SeqLen = 512L

  val all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // t20: concat-and-chop sequence packing. Deterministic corpus order =
    // (source shard, doc_id); separator = 1 EOS token appended per doc.
    GraftQuery(
      "t20_sequence_pack",
      "pack documents into fixed-length training sequences via per-shard running token offsets",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.documents
          .select(col("doc_id"), col("source"),
            (regexp_count(col("text"), lit("\\S+")).cast("long") + lit(1L)).as("n_tok"))
          .withColumn("cum_end", sum(col("n_tok")).over(w))
          .select(col("doc_id"), col("source"), col("n_tok"),
            (col("cum_end") - col("n_tok")).as("tok_start"),
            expr(s"(cum_end - n_tok) div ${SeqLen}L").as("seq_first"),
            expr(s"(cum_end - 1L) div ${SeqLen}L").as("seq_last"))
          .withColumn("n_seqs", col("seq_last") - col("seq_first") + lit(1L))
          .orderBy(col("doc_id"))
      },
      Some(
        s"""WITH s AS (
          |  SELECT doc_id, source,
          |         CAST(len(regexp_extract_all(text, '\\S+')) + 1 AS BIGINT) AS n_tok
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, source, n_tok,
          |         CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
          |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_end
          |  FROM s)
          |SELECT doc_id, source, n_tok,
          |       cum_end - n_tok AS tok_start,
          |       (cum_end - n_tok) // $SeqLen AS seq_first,
          |       (cum_end - 1) // $SeqLen AS seq_last,
          |       (cum_end - 1) // $SeqLen - (cum_end - n_tok) // $SeqLen + 1 AS n_seqs
          |FROM c
          |ORDER BY doc_id""".stripMargin)
    )
  )
}
