package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.GraftQuery

/** Edit-distance similarity join via deletion-neighborhood blocking
  * (FastSS: Bocek, Hunt, Stiller 2007 — public literature), plus the
  * entity-resolution pipeline that composes it with connected-component
  * clustering and golden-record selection.
  *
  * Blocking soundness (d = 1): two strings s, t with levenshtein ≤ 1
  * share at least one key in {s} ∪ {s minus one char}:
  *   - equal            → the identity key;
  *   - substitution @ i → del_i(s) = del_i(t);
  *   - insertion (|t| = |s|+1 @ i) → del_i(t) = s = identity key of s.
  * So an equi-join on the deletion keys has PERFECT recall at d = 1 and
  * the exact `levenshtein` predicate prunes false candidates — which is
  * what lets the quadratic DuckDB join serve as a full value-level
  * oracle. For d = 2 the same scheme iterates deletions (fan-out
  * O(L choose d)) — [[deletionKeys2]] / [[selfJoin2]], cataloged as
  * d11 on a planted subset.
  *
  * Why not PassJoin (segment pigeonhole, Li et al. ICDE 2011)? Its d+1
  * segments are structurally hot when a long constant prefix spans a
  * whole segment — on this corpus every name starts with `Customer#`,
  * so the first-half segment key collides across the ENTIRE table and
  * candidate generation degenerates to all-pairs. Deletion keys have no
  * structural hot key: a bucket's size is bounded by the number of
  * strings genuinely within distance 1 of each other (true duplicate
  * density), so candidate volume is output-bound, not corpus-bound.
  *
  * Scale shape (100 TB): fan-out is L+1 keys per row (one narrow
  * explode), then ONE shuffle equi-join on the key, one distinct on the
  * pair, and codegen'd `levenshtein` verification — never an all-pairs
  * product, no window, no driver state.
  */
object EditJoin {

  /** `{s} ∪ {s with one char deleted}` as an array column (per-row
    * dedup via array_union keeps repeated-char deletions single). */
  def deletionKeys(s: Column): Column =
    array_union(
      array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), length(s)))))

  /** Depth-2 deletion neighborhood: `{s} ∪ del¹(s) ∪ del²(s)` — every
    * string reachable by deleting at most two characters. FastSS's
    * general guarantee: lev(s,t) ≤ d ⇒ the depth-d neighborhoods
    * intersect, so an equi-join on these keys has perfect recall at
    * d = 2. Fan-out is O(L²/2) keys per row (~170 for an 18-char name)
    * — the quadratic moved from the PAIR space (table²) to the KEY
    * space (row × L²), which is the trade that scales: key count grows
    * linearly with the table. The inner `filter(j > i)` guards the
    * pair enumeration (a `sequence(i+1, L)` with i+1 > L would count
    * DOWN, fabricating keys).
    *
    * LENGTH CAP: O(L²/2) keys (each ~L chars, so O(L³) bytes) is the
    * right trade only for short strings — ≤ ~800 keys at the
    * [[LongStringCap]] of 40, but a 4 KB document id would emit 8M key
    * chars per row. [[selfJoin2]] therefore routes rows longer than the
    * cap through [[segRoleKeys]]/[[subRoleKeys]] (segment-pigeonhole
    * blocking, O(1) keys per row) and reserves this neighborhood for
    * the short class. */
  def deletionKeys2(s: Column): Column = {
    val idx = sequence(lit(1), length(s))
    val doubles = flatten(transform(idx, i =>
      transform(filter(idx, j => j > i), j =>
        concat(
          s.substr(lit(1), i - lit(1)),
          s.substr(i + lit(1), j - i - lit(1)),
          s.substr(j + lit(1), length(s))))))
    array_union(deletionKeys(s), doubles)
  }

  /** Strings LONGER than this use segment-pigeonhole blocking in
    * [[selfJoin2]]; at/below it, depth-2 deletion neighborhoods. 40 keeps
    * the deletion fan-out ≤ ~820 keys; beyond it the O(L²) key space
    * stops being the cheap side of the trade. */
  val LongStringCap = 40

  /** Edit threshold of the d = 2 join; segment count is d + 1. */
  private val D2 = 2

  /** Segment i (0-based, of [[D2]]+1 even-split segments) start and
    * length for a string of length `l` — first `l mod 3` segments get
    * the extra char. Both sides of the pigeonhole join must derive the
    * segmentation from the SAME length (the seg-role string's own), so
    * these are pure functions of `l`. */
  // exact integer l/3 ((l - l%3) is a multiple of 3, so the double
  // division is exact and the cast is safe)
  private def div3(l: Column): Column = ((l - l % 3) / 3).cast("int")
  private def segLen(l: Column, i: Int): Column =
    div3(l) + when(lit(i) < l % 3, 1).otherwise(0)
  private def segStart(l: Column, i: Int): Column =
    lit(1) + lit(i) * div3(l) + least(lit(i), l % 3)

  /** Pigeonhole seg-role keys: the [[D2]]+1 even-split segments of `s`,
    * keyed `(segment index, |s|, content)`. If lev(s,t) ≤ 2, at most 2
    * of the 3 segments are touched by the edit script, so at least one
    * appears VERBATIM in t — shifted by the net indel count before it,
    * i.e. by at most 2 positions. That preserved segment is what
    * [[subRoleKeys]] enumerates on the other side; `|s|` in the key
    * prunes partners outside the ±2 length band for free. O(1) keys
    * per row — the long-string replacement for the O(L²) deletion
    * neighborhood (PassJoin-style segment blocking, Li et al.
    * ICDE 2011; see the class doc for why it is NOT the default on
    * short constant-prefix corpora). */
  def segRoleKeys(s: Column): Column = {
    val l = length(s)
    array((0 to D2).map { i =>
      concat_ws("|", lit(i), l, s.substr(segStart(l, i), segLen(l, i)))
    }: _*)
  }

  /** Pigeonhole sub-role keys: every substring of `t` that could be a
    * preserved segment of a partner s with ||s|−|t|| ≤ 2 — for each
    * candidate partner length `l`, each segment index, each start
    * shift in ±2 (validity-filtered). ≤ 3·5·5 = 75 keys per row
    * regardless of length. */
  def subRoleKeys(t: Column): Column = {
    val tl = length(t)
    val perSeg = (0 to D2).map { i =>
      flatten(transform(sequence(tl - D2, tl + D2), l => {
        val len = segLen(l, i)
        transform(sequence(lit(-D2), lit(D2)), d => {
          val st = segStart(l, i) + d
          when(st >= 1 && len >= 1 && st + len - 1 <= tl,
            concat_ws("|", lit(i), l, t.substr(st, len)))
        })
      }))
    }
    array_distinct(filter(concat(perSeg: _*), k => k.isNotNull))
  }

  /** Long-string half of [[selfJoin2]]: segment-pigeonhole candidates,
    * exact levenshtein verify. One explode per role, ONE shuffle
    * equi-join on the key, distinct on the pair — same plan family as
    * the deletion scheme, but with O(1) keys per row so a 4 KB-string
    * corpus pays ~78 keys, not millions. Directional soundness: for a
    * pair (a, b), a's preserved segment appearing among b's substrings
    * is guaranteed by the pigeonhole on a's OWN segmentation, so
    * seg-role(a) ⋈ sub-role(b) with `a.id < b.id` already has perfect
    * recall — no symmetric second join needed. */
  private def selfJoinLong2(records: DataFrame): DataFrame = {
    val rows = graft.ops.FanOut(records)
    val seg = rows.select(col("id"), col("name"),
      explode(segRoleKeys(col("name"))).as("k"))
    val sub = rows.select(col("id"), col("name"),
      explode(subRoleKeys(col("name"))).as("k"))
    seg.as("a").join(sub.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      .withColumn("lev_dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev_dist") <= D2)
  }

  /** Explode a `(id, name)` frame into one row per deletion key —
    * rebalanced first so the L+1-way fan-out (and the join behind it)
    * inherits full parallelism, not the input's split count
    * (see [[graft.ops.FanOut]]). */
  private def keyed(records: DataFrame): DataFrame =
    graft.ops.FanOut(records)
      .select(col("id"), col("name"), explode(deletionKeys(col("name"))).as("k"))

  /** All pairs within levenshtein ≤ 2 (id_a < id_b), verified exactly.
    * Length-routed (see [[deletionKeys2]]'s cap note): rows at or below
    * [[LongStringCap]] use the depth-2 deletion neighborhood; longer
    * rows use [[selfJoinLong2]]'s segment pigeonhole. The classes
    * overlap on lengths {cap−1, cap} so cross-boundary pairs are never
    * lost: a lev ≤ 2 pair differs in length by ≤ 2, so either both
    * sides are ≤ cap (short scheme) or both are ≥ cap−1 (long scheme);
    * one side ≤ cap−2 with the other > cap is impossible. Doubly-found
    * boundary pairs collapse in the union's distinct. */
  def selfJoin2(records: DataFrame): DataFrame = {
    val short = graft.ops.FanOut(
        records.filter(length(col("name")) <= LongStringCap))
      .select(col("id"), col("name"),
        explode(deletionKeys2(col("name"))).as("k"))
    val shortPairs = short.as("a").join(short.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      .withColumn("lev_dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev_dist") <= D2)
    val longPairs = selfJoinLong2(
      records.filter(length(col("name")) >= LongStringCap - 1))
    shortPairs.unionByName(longPairs).distinct()
  }

  /** All pairs within levenshtein ≤ 1 of one table (id_a < id_b),
    * verified exactly. Input columns: `id` (numeric), `name`. */
  def selfJoin(records: DataFrame): DataFrame = {
    val kd = keyed(records)
    kd.as("a").join(kd.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      .withColumn("lev_dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev_dist") <= 1)
  }

  /** Bipartite variant: left records matched to right records within
    * levenshtein ≤ 1 (entity resolution: dirty feed → master). */
  def crossMatch(left: DataFrame, right: DataFrame): DataFrame =
    keyed(left).as("a").join(keyed(right).as("b"), col("a.k") === col("b.k"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
      .withColumn("lev_dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev_dist") <= 1)

  /** The dirty feed for d10: every third customer re-keyed (+100000)
    * with the first character typo'd `C` → `K`. The typo position is
    * deliberately OUTSIDE the digit suffix: a digit typo would sit
    * within distance 1 of ten masters, a leading-letter typo of exactly
    * one — so the planted feed exercises unique bipartite matching
    * (the spec asserts that uniqueness; the oracle depends on it). */
  private def crmFeed(customer: DataFrame): DataFrame =
    customer.filter(col("c_custkey") % 3 === 0)
      .select((col("c_custkey") + lit(100000L)).as("id"),
        concat(lit("K"), substring(col("c_name"), 2, 1000)).as("name"))

  def all: Seq[GraftQuery] = Seq(
    // ------------------------------------------------------------------
    // d09: the edit-distance similarity join as a standalone operator.
    // 19,500 true pairs at sf0.01 (names differing in one digit) — the
    // driver's quadratic DuckDB levenshtein join is the exact oracle,
    // while the Spark plan is the blocked formulation that survives a
    // table the quadratic never could.
    GraftQuery(
      "d09_edit_distance_join",
      "all customer-name pairs within levenshtein <= 1 via deletion-neighborhood blocking (FastSS), exact-verified",
      (spark, dir) => {
        val t = Tables(spark, dir)
        selfJoin(t.customer.select(col("c_custkey").as("id"), col("c_name").as("name")))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(
        """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
          |       a.c_name AS name_a, b.c_name AS name_b,
          |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev_dist
          |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
          |WHERE levenshtein(a.c_name, b.c_name) <= 1
          |ORDER BY id_a, id_b""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // d11: the same join at threshold 2 via the depth-2 deletion
    // neighborhood — closes the "documented, not cataloged" note on the
    // d ≥ 2 scheme. Restricted to a planted 300-id subset so the
    // quadratic DuckDB oracle stays cheap while distance-2 pairs (names
    // differing in two digit positions) are dense enough to exercise
    // both the double-deletion collision paths and the exact prune.
    GraftQuery(
      "d11_edit_distance_join_d2",
      "customer-name pairs within levenshtein <= 2 via depth-2 deletion neighborhoods (FastSS d=2), exact-verified",
      (spark, dir) => {
        val t = Tables(spark, dir)
        selfJoin2(t.customer.filter(col("c_custkey") <= 300)
            .select(col("c_custkey").as("id"), col("c_name").as("name")))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(
        """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
          |       a.c_name AS name_a, b.c_name AS name_b,
          |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev_dist
          |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
          |WHERE a.c_custkey <= 300 AND b.c_custkey <= 300
          |  AND levenshtein(a.c_name, b.c_name) <= 2
          |ORDER BY id_a, id_b""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // d10: entity resolution end to end — blocking join, duplicate
    // clustering, golden record. The dirty feed's unique bipartite
    // matching (see crmFeed) is what lets the oracle stay closure-free:
    // every cluster is one master plus its matched feed rows, so a
    // LEFT JOIN + count replays the result; EditJoinSpec asserts the
    // uniqueness the simplification rests on. The Spark side still runs
    // the GENERAL machine (distributed connected components over the
    // match edges ∪ singleton survivors) — the point of the entry is
    // that the general pipeline collapses to the simple answer when the
    // data is clean, and keeps working when it is not.
    GraftQuery(
      "d10_entity_resolution",
      "dirty customer feed resolved against the master list: deletion-key blocking -> levenshtein verify -> CC clusters -> golden records",
      (spark, dir) => {
        val t = Tables(spark, dir)
        val masters = t.customer.select(col("c_custkey").as("id"), col("c_name").as("name"))
        val crm = crmFeed(t.customer)
        val edges = crossMatch(crm, masters).select(col("id_a"), col("id_b"))
        val assign = ConnectedComponents.components(edges)
        val records = masters.unionByName(crm)
        val full = records.join(assign, records("id") === assign("node"), "left")
          .select(col("id"), col("name"), coalesce(col("component"), col("id")).as("cluster_id"))
        full.groupBy(col("cluster_id"))
          .agg(min_by(col("name"), col("id")).as("canonical_name"),
            count(lit(1)).as("n_records"))
          .orderBy(col("cluster_id"))
      },
      Some(
        """WITH m AS (SELECT c_custkey AS id, c_name AS name FROM customer),
          |crm AS (
          |  SELECT c_custkey + 100000 AS id, 'K' || substr(c_name, 2) AS name
          |  FROM customer WHERE c_custkey % 3 = 0),
          |e AS (
          |  SELECT c.id AS crm_id, m.id AS master_id
          |  FROM crm c JOIN m ON levenshtein(c.name, m.name) <= 1),
          |cnt AS (SELECT master_id, count(*) AS n_crm FROM e GROUP BY master_id)
          |SELECT m.id AS cluster_id, m.name AS canonical_name,
          |       CAST(1 + coalesce(cnt.n_crm, 0) AS BIGINT) AS n_records
          |FROM m LEFT JOIN cnt ON cnt.master_id = m.id
          |ORDER BY cluster_id""".stripMargin)
    )
  )
}
