package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark plan builder plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle SQL the driver
  * hash-compares against. `oracle = None` → driver records a weaker
  * rows-only check (used for hash-seeded / sketch / mapPartitions ops
  * whose exact output is engine-specific).
  */
final case class GraftQuery(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Bench-time plan when the VERIFIED plan carries oracle apparatus
      * the production query would never run (q22/q56: the exact
      * count-distinct twin that checks the sketch's error bound).
      * None (the norm) → [[run]] is both the verified and the benched
      * plan. The driver's correctness gate always runs [[run]];
      * [[graft.Bench]] times this when present, so the published
      * number measures what the entry exists to demonstrate
      * (round-13 verdict item 4). */
    benchRun: Option[(SparkSession, String) => DataFrame] = None
)

/** The full query catalog — SURVEY.md §2 inventory + the LLM-data-pipeline
  * extensions (dedup, similarity, text, multimodal, streaming analogs).
  */
object Catalog {
  def all: Seq[GraftQuery] =
    graft.ops.CoreQueries.all ++
      graft.ops.GraphOps.all ++
      graft.etl.EtlQueries.all ++
      graft.etl.IncrementalEtl.all ++
      graft.text.TextOps.all ++
      graft.text.Bpe.all ++
      graft.text.PackingOps.all ++
      graft.text.PipelineQueries.all ++
      graft.dedup.DedupOps.all ++
      graft.dedup.SpanDedup.all ++
      graft.dedup.EditJoin.all ++
      graft.similarity.SimilarityOps.all ++
      graft.multimodal.MultimodalOps.all ++
      graft.sources.SourceQueries.all ++
      graft.io.ManifestQueries.all ++
      graft.plans.SummaryQueries.all ++
      graft.plans.AsofQueries.all ++
      graft.streaming.EventStreams.catalog

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** The plans [[graft.Bench]] times: [[GraftQuery.benchRun]] where an
    * entry declares a production variant, else [[GraftQuery.run]].
    * Same key set as [[queries]] — only the PLAN differs, and only for
    * entries whose verified output embeds oracle apparatus. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.benchRun.getOrElse(q.run)).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
