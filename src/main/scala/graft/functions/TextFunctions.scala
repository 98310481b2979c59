package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators (dedup, language id,
  * quality scoring, fingerprinting). Everything is built from Spark SQL
  * built-ins (regexp/array/higher-order functions) so the projections stay
  * inside whole-stage codegen / vectorized evaluation — no Scala UDFs.
  */
object TextFunctions {

  /** Whitespace-collapse + lowercase normalization used before exact
    * (content-equality) dedup. */
  def normalizeText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Content fingerprint = md5 of the normalized text (stable across
    * engines — the oracle-able half of document fingerprinting). */
  def contentFingerprint(c: Column): Column = md5(normalizeText(c))

  /** Distinct character n-grams of `colName` (expr-based because
    * `substring` needs a lambda-variable start position). */
  def charShingles(colName: String, n: Int): Column =
    expr(
      s"array_distinct(transform(sequence(1, greatest(length($colName) - ${n - 1}, 1)), " +
        s"i -> substring($colName, i, $n)))")

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(c, "\\s+")

  /** Distinct k-word shingles over a precomputed token-array column. */
  def wordShingles(toksCol: String, k: Int): Column =
    expr(
      s"array_distinct(transform(sequence(1, greatest(size($toksCol) - ${k - 1}, 1)), " +
        s"i -> concat_ws(' ', slice($toksCol, i, $k))))")

  /** Exact Jaccard similarity of two array columns (double). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
