package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Catalog

/** Catalog-wide discipline gates (no Spark session needed — these are
  * metadata checks over the registered catalog).
  *
  * The strongest correctness signal this engine has is the DuckDB
  * hash-compare; a catalog entry WITHOUT oracle SQL only gets the weak
  * rows>0 check. That floor must not silently grow: every no-oracle
  * entry needs an explicit allowlist row here naming WHY SQL cannot
  * express it — adding a query without an oracle fails this suite until
  * the author either writes the oracle or argues the exemption in code
  * review.
  */
class CatalogDisciplineSpec extends AnyFunSuite {

  /** Every declared-rows-only entry with the reason SQL can't replay it.
    * EMPTY since round 13: the last two residents (q22/q56, HLL sketch
    * estimates — engine-specific registers) flipped to full oracles by
    * verifying the estimator's ERROR-BOUND CONTRACT instead of its
    * binary (exact count + within-5% flag, replayed by DuckDB as
    * exact + literal true). The allowlist machinery stays: a future
    * genuinely-unreplayable entry must still argue its exemption here. */
  private val rowsOnlyAllowlist: Map[String, String] = Map.empty

  /** Entries whose oracle SQL is GENERATED at Verify-dump time from a
    * runtime-trained artifact (round 12: the BPE family embeds the
    * trained merge table as constants — see graft.text.Bpe). Static
    * catalog inspection, before any query has run, sees None for these;
    * after the queries run, the oracle is present and full. BpeSpec
    * asserts the post-training half (oracles materialize); here we only
    * tolerate the pre-training state. */
  private val generatedOracles: Set[String] = Set(
    "t17_bpe_tokenize", "t18_chunk_documents_bpe",
    "t19_token_budget_bpe", "t21_bpe_merge_table")

  test("every catalog entry has an oracle or an explicit rows-only exemption") {
    val noOracle = Catalog.all.filter(_.oracle.isEmpty).map(_.name).toSet
    val unexplained = noOracle -- rowsOnlyAllowlist.keySet -- generatedOracles
    assert(unexplained.isEmpty,
      s"catalog entries without oracle SQL and without an allowlist reason: " +
        s"${unexplained.toSeq.sorted.mkString(", ")} — write the DuckDB " +
        "oracle (preferred) or add an allowlist row with the reason")
    // and the allowlist must not hold stale rows (an entry that GAINED
    // an oracle should drop its exemption so the floor keeps shrinking).
    // generatedOracles rows are legitimately in EITHER state depending
    // on whether this JVM has trained the tokenizer yet (test-order
    // independence), so they are checked by BpeSpec instead.
    val stale = rowsOnlyAllowlist.keySet -- noOracle
    assert(stale.isEmpty,
      s"allowlist rows for entries that now have oracles (remove them): " +
        s"${stale.toSeq.sorted.mkString(", ")}")
    val ghost = (rowsOnlyAllowlist.keySet ++ generatedOracles) --
      Catalog.all.map(_.name).toSet
    assert(ghost.isEmpty, s"allowlist rows for entries that no longer exist: " +
      s"${ghost.toSeq.sorted.mkString(", ")}")
  }

  test("catalog names are unique and well-formed") {
    val names = Catalog.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate catalog names: ${dups.mkString(", ")}")
    val malformed = names.filterNot(_.matches("[a-z][a-z0-9_]*"))
    assert(malformed.isEmpty, s"non-snake-case names: ${malformed.mkString(", ")}")
  }

  test("every catalog entry carries a non-empty doc line") {
    val undocumented = Catalog.all.filter(_.doc.trim.isEmpty).map(_.name)
    assert(undocumented.isEmpty,
      s"undocumented catalog entries: ${undocumented.mkString(", ")}")
  }

  /** Entries allowed a bench-only plan variant, each naming the oracle
    * apparatus the verified plan carries that the production query
    * would not run. A benchRun on any other entry fails this suite —
    * the benched plan and the hash-verified plan must otherwise be the
    * SAME plan, or the bench stops being evidence about verified code. */
  private val benchVariantAllowlist: Map[String, String] = Map(
    "q22_approx_count_distinct" ->
      "exact countDistinct twin checks the HLL error bound; production runs the sketch alone",
    "q56_sketch_rollup" ->
      "exact per-month countDistinct twin checks the union-of-daily bound; production runs the rollup alone")

  test("bench-only plan variants are allowlisted and their verified twin keeps a full oracle") {
    val withVariant = Catalog.all.filter(_.benchRun.isDefined)
    val unexplained = withVariant.map(_.name).toSet -- benchVariantAllowlist.keySet
    assert(unexplained.isEmpty,
      s"entries with an unallowlisted benchRun: ${unexplained.toSeq.sorted.mkString(", ")}")
    val stale = benchVariantAllowlist.keySet -- withVariant.map(_.name).toSet
    assert(stale.isEmpty, s"stale benchVariant rows: ${stale.toSeq.sorted.mkString(", ")}")
    // a bench variant never weakens the correctness gate: the verified
    // plan must still carry its full oracle
    withVariant.foreach(q => assert(q.oracle.isDefined,
      s"${q.name}: benchRun without a full oracle on the verified plan"))
    // and the bench surface covers exactly the catalog (same key set)
    assert(Catalog.benchQueries.keySet == Catalog.queries.keySet)
  }
}
