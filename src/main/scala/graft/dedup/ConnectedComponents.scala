package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair graph — the
  * pairs→clusters step of fuzzy dedup (near-dup PAIRS are only half the
  * job; keeping one canonical doc per duplicate CLUSTER needs the
  * transitive closure: A~B and B~C must collapse {A,B,C} even when A~C
  * was never emitted).
  *
  * Algorithm: the alternating large-star / small-star method of Kiveris
  * et al., "Connected Components in MapReduce and Beyond" (SoCC 2014) —
  * the standard web-scale formulation. Each round is two
  * groupBy-min + join passes over the edge set; rounds provably converge
  * in O(log² n) to a star forest in which every node points at its
  * component's minimum id. No step ever materializes a neighborhood in
  * memory (the per-node min is a partial-aggregating `min`, not a
  * collect_list), so a 100 TB pair graph with a billion-edge skew hub
  * still aggregates map-side.
  *
  * Scale notes:
  *   - Per round: largeStar is one shuffle on the node key (groupBy min)
  *     plus one equi-join back; smallStar the same. Edge counts shrink
  *     monotonically after the first rounds as stars contract.
  *   - Each round is cut from the lineage with an eager
  *     `localCheckpoint`: iteration i+1 reads materialized round-i
  *     output instead of re-expanding i rounds of joins (the classic
  *     iterative-DataFrame plan blow-up). The convergence-check action
  *     doubles as the checkpoint materialization, so no extra pass.
  *     Checkpoint blocks are freed by Spark's ContextCleaner once a
  *     round's frame becomes unreachable (same policy as the k-means
  *     rounds in [[graft.similarity.SimilarityOps]]). On a real cluster
  *     a reliable `checkpoint` (HDFS) additionally survives executor
  *     loss — with `localCheckpoint` an executor death mid-run fails the
  *     job loudly and the caller retries; it never silently corrupts
  *     labels (cf. the same trade documented in
  *     [[graft.etl.SurrogateKeys]]).
  *   - Convergence is detected by an order-independent edge-set
  *     checksum (count + bit_xor of per-edge xxhash64): one tiny
  *     aggregate per round, no driver-side edge materialization ever.
  */
object ConnectedComponents {

  /** Star-forest fixpoint guard. The alternating algorithm needs
    * O(log² n) rounds; 30 covers n beyond any physical corpus. */
  private val MaxRounds = 30

  /** large-star(u): connect every neighbor v > u to
    * m = min(Γ(u) ∪ {u}). Operates on the symmetrized edge list. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("src").as("u"), col("dst").as("v"))
      .union(e.select(col("dst").as("u"), col("src").as("v")))
    val mins = sym.groupBy(col("u"))
      .agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(mins, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("src"), col("m").as("dst"))
    // no distinct here: smallStar's min-aggregate is duplicate-insensitive
    // and its final distinct restores set semantics — dropping the
    // intermediate dedup saves one full shuffle per round (duplicate
    // inflation is bounded by the pre-contraction degree)
  }

  /** small-star(u): orient each edge toward its larger endpoint, then
    * connect u and all its smaller neighbors to their minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val or = e.select(
        greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
    val mins = or.groupBy(col("u")).agg(min(col("v")).as("m"))
    or.join(mins, Seq("u"))
      .select(col("v").as("src"), col("m").as("dst"))
      .union(mins.select(col("u").as("src"), col("m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Order-independent fingerprint of an edge set. */
  private def checksum(e: DataFrame): (Long, Long) = {
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L)).as("x")).head()
    (row.getLong(0), row.getLong(1))
  }

  /** Component labels for every node that appears in `edges`.
    *
    * @param edges two numeric columns (first = src, second = dst);
    *              self-loops and duplicate/reversed pairs are tolerated.
    * @return columns (`node`, `component`) where `component` is the
    *         minimum node id in the node's connected component. Nodes
    *         with no edges are absent — the caller left-joins and
    *         coalesces to self for singleton semantics.
    */
  def components(edges: DataFrame): DataFrame = {
    val cols = edges.columns
    require(cols.length >= 2, s"edges needs (src, dst) columns, got ${cols.mkString(",")}")
    // LAZY localCheckpoint: the plan is truncated to a LogicalRDD at
    // creation (stopping the iterative plan blow-up), but materialization
    // happens on the round's ONE action — the convergence checksum — so
    // each round costs a single job instead of checkpoint-then-checksum.
    var e = edges
      .select(col(cols(0)).cast("long").as("src"), col(cols(1)).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)
    var prev = checksum(e)
    var round = 0
    var converged = prev._1 == 0L
    while (!converged && round < MaxRounds) {
      e = smallStar(largeStar(e)).localCheckpoint(false)
      val cs = checksum(e)
      converged = cs == prev
      prev = cs
      round += 1
    }
    // Fixpoint is a star forest rooted at each component minimum:
    // every edge is (member, root). Roots label themselves.
    e.select(col("src").as("node"), col("dst").as("component"))
      .union(e.select(col("dst").as("node"), col("dst").as("component")))
      .distinct()
  }
}
