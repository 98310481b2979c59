package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.GraftQuery

/** Iterative graph analytics over a graph derived from the warehouse —
  * PageRank as the representative fixed-point computation (link-quality
  * weighting of a crawl corpus is the training-data-pipeline use; the
  * same loop shape serves label propagation and hub/authority scores).
  *
  * The graph: customer and supplier nodes (namespaced odd/even ids),
  * one edge per DISTINCT (customer, supplier) trading pair from
  * orders⋈lineitem, materialized in both directions so every node has
  * out-degree ≥ 1 (no dangling-mass term needed).
  *
  * Determinism across engines is the design constraint: every rank is a
  * BIGINT in 1e-12 units of total mass and every step is integer
  * arithmetic (`div` floor division, per-edge BEFORE the sum — an
  * integer sum is order-independent where a double sum is not), so five
  * iterations replay bit-exactly in DuckDB as five unrolled CTEs (`//`)
  * and the whole fixed-point carries a full hash oracle — the same
  * integers-not-floats rule the rest of the catalog follows (t12/t16).
  *
  * Scale shape (the d05 connected-components discipline): per iteration
  * ONE join of edges to the rank vector (shuffle on src) and ONE partial
  * aggregate to dst (map-side combine — a billion-in-degree hub reduces
  * before the shuffle); the static edge+degree frame is persisted once
  * and reused; each round ends in an eager localCheckpoint so the
  * iterative plan stays constant-size instead of doubling per round. On
  * a cluster the persisted edges partition by src once and every
  * iteration's join reuses that layout.
  */
object GraphOps {

  /** Total rank mass in scaled units (1e12 ≪ 2^63/N for any realistic
    * node count; per-node quotients stay exact BIGINTs). */
  val Scale = 1000000000000L

  private def tradeEdges(t: Tables): DataFrame = {
    // `pairs` is persisted (round-14, guide §2.4): the bidirectional
    // union references it twice, and every caller layers a degree
    // aggregate + join (or a repartition) on top — un-persisted, one
    // edge-frame materialization re-ran the orders⋈lineitem join and
    // its distinct shuffle up to FOUR times (exchange reuse does not
    // fire across the union arms' differing projections). Measured
    // warm: g01's edge build 1.89 s → 0.16 s with pairs cached once.
    // Tracked in InternalCaches, so the bench releases it between
    // iterations like every other internal intermediate.
    val pairs = graft.InternalCaches.track(
      t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    pairs.unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** 5-iteration damped PageRank (d = 85/100) over the trading graph.
    * r₀ = Scale div N; rₜ₊₁(v) = (15·(Scale div N)) div 100 +
    * (85·Σ_{u→v}(rₜ(u) div deg(u))) div 100. */
  def pageRank(t: Tables, iters: Int = 5): DataFrame = {
    val edges = graft.InternalCaches.track {
      val e = tradeEdges(t)
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      // NOT broadcast on purpose (measured 3.8s → 6.3s/run if either deg
      // or the rank vector broadcasts): the shuffle join leaves the
      // persisted edges HASH-PARTITIONED BY src, so every iteration's
      // join reuses that layout and only the 16k-row rank vector moves —
      // broadcasting removes the shuffle here but forfeits the layout,
      // and then all five iteration joins shuffle the full edge set.
      e.join(deg, "src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val nodes = edges.select(col("src").as("node")).distinct()
    val n = nodes.count() // one count job; N is a broadcast scalar
    val r0 = Scale / n
    val base = 15L * r0 / 100L
    var ranks = nodes.select(col("node"), lit(r0).as("r")).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      // No join back to `nodes` for zero-in-degree nodes: the edge set is
      // bidirectional by construction, so every node has in-degree ≥ 1
      // and the dst aggregate already covers ALL nodes (profiled: the
      // left join doubled per-round cost for structurally dead work; a
      // dangling-node graph variant would need it back).
      ranks = edges
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("t"))
        .select(col("dst").as("node"),
          (lit(base) + expr("85 * t div 100")).as("r"))
        // N rows only: truncate lineage so the per-round plan stays flat
        .localCheckpoint(true)
    }
    ranks
      .select(col("node").as("node_id"),
        when(col("node") % 2 === 1, "supplier").otherwise("customer").as("kind"),
        col("r").as("rank_scaled"))
      .orderBy(col("node_id"))
  }

  /** g06's seed predicate — the g04 BFS seed set (every 4th supplier),
    * a pure expression of the node id so neither engine needs a join to
    * apply it. */
  private def pprSeed(node: Column): Column =
    node % 2 === 1 &&
      (shiftright((node - 1).cast("long"), 1) % 4 === 0)

  /** 5-iteration PERSONALIZED PageRank: teleport mass returns to the
    * g04 seed suppliers instead of spreading uniformly, so ranks answer
    * "how close is this node to the seed set under random traversal" —
    * the seed-relative importance used for recommendation candidates
    * and crawl frontier scoring. Same integer fixed-point discipline as
    * [[pageRank]] (per-edge floor division BEFORE the exact BIGINT sum,
    * five unrolled CTE replays in the oracle) and the same per-round
    * plan (one shuffle-join on src reusing the persisted edge layout,
    * one map-side-combined dst aggregate, eager localCheckpoint); only
    * the base term differs — it lands on seeds alone:
    * r₀ = [v∈S]·(Scale div |S|);
    * rₜ₊₁(v) = [v∈S]·(15·(Scale div |S|)) div 100
    *           + (85·Σ_{u→v} rₜ(u) div deg(u)) div 100. */
  def personalizedPageRank(t: Tables, iters: Int = 5): DataFrame = {
    val edges = graft.InternalCaches.track {
      val e = tradeEdges(t)
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      e.join(deg, "src")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val nodes = edges.select(col("src").as("node")).distinct()
    val nSeeds = nodes.filter(pprSeed(col("node"))).count()
    require(nSeeds > 0,
      "personalized PageRank needs a non-empty seed set: no graph node " +
        "matches the seed predicate (corpus too small or predicate drift)")
    val r0 = Scale / nSeeds
    val base = 15L * r0 / 100L
    var ranks = nodes
      .select(col("node"),
        when(pprSeed(col("node")), lit(r0)).otherwise(lit(0L)).as("r"))
      .localCheckpoint(true)
    (1 to iters).foreach { _ =>
      // the dst aggregate covers all nodes (bidirectional edges, every
      // node has in-degree ≥ 1 — the g01 argument); the seed-only base
      // is a pure projection of the dst id, no join
      ranks = edges
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("t"))
        .select(col("dst").as("node"),
          (when(pprSeed(col("dst")), lit(base)).otherwise(lit(0L)) +
            expr("85 * t div 100")).as("r"))
        .localCheckpoint(true)
    }
    ranks
      .select(col("node").as("node_id"),
        when(col("node") % 2 === 1, "supplier").otherwise("customer").as("kind"),
        col("r").as("rank_scaled"))
      .orderBy(col("node_id"))
  }

  /** Per-node triangle counts over the part co-purchase graph (distinct
    * part pairs sharing an order, both line quantities ≥ 25 — the
    * "bought together in volume" graph; ~325k edges / 232k triangles at
    * sf0.1).
    *
    * The algorithm is the degree-ordered orientation of Suri & Vassilvitskii
    * ("Counting Triangles and the Curse of the Last Reducer", WWW 2011):
    * orient every undirected edge from its lower (degree, id) endpoint to
    * the higher, so each triangle {x<y<z} is found EXACTLY once as the
    * wedge (x→y, x→z) closed by the edge y→z. Orientation bounds
    * out-degree by O(√m) — the total wedge count is O(m^1.5) worst case
    * instead of Σdeg² (a celebrity part with degree 10⁶ would otherwise
    * generate 10¹² wedges from one node; oriented it generates at most
    * ~√(2m)). No caps or sampling needed: the bound is structural.
    *
    * Shape at scale: build edges (one distinct shuffle), degrees (one
    * partial agg), orient (two broadcast-or-shuffle joins against the
    * small degree table), persist the oriented edge set (reused three
    * times: both wedge sides + closure probe), wedge self-join on the
    * source node (one shuffle on s), closure equi-join on (b, c) (one
    * shuffle). Everything is an equi-join — no BNLJ anywhere — and the
    * whole computation is exact integers → full DuckDB oracle. */
  def triangleCounts(t: Tables): DataFrame = {
    val li = t.lineitem.where(col("l_quantity") >= 25)
      .select(col("l_orderkey"), col("l_partkey"))
    val e0 = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    trianglesFromEdges(e0)
  }

  /** Core of [[triangleCounts]]: per-node triangle counts from a distinct
    * undirected edge set (`u` < `v`, one row per edge). */
  def trianglesFromEdges(e0raw: DataFrame): DataFrame = {
    // e0 persisted (round-14, guide §2.4): the degree aggregate references
    // it twice (both union arms) and the orientation join a third time —
    // for g02 that re-ran the lineitem co-purchase self-join + distinct
    // three times per materialization. Tracked for inter-iteration release.
    val e0 = graft.InternalCaches.track(
      e0raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val deg = e0.select(col("u").as("node"))
      .unionAll(e0.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val uLower = struct(col("du.d"), col("u")) < struct(col("dv.d"), col("v"))
    val oriented = graft.InternalCaches.track {
      e0.join(deg.as("du"), col("u") === col("du.node"))
        .join(deg.as("dv"), col("v") === col("dv.node"))
        .select(when(uLower, col("u")).otherwise(col("v")).as("s"),
          when(uLower, col("v")).otherwise(col("u")).as("t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
    // the wedge's outer pair is ordered by node id, the closing edge by
    // (degree, id) — probing both directions of the oriented set matches
    // each closed wedge exactly once
    val closing = oriented.select(col("s").as("b"), col("t").as("c"))
      .unionAll(oriented.select(col("t").as("b"), col("s").as("c")))
    wedges.join(closing, Seq("b", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node_id"))
      .groupBy(col("node_id")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("node_id"))
  }

  /** Hierarchy resolution by POINTER DOUBLING — the engine's answer to
    * the recursive CTE Spark does not have. A synthetic management
    * forest over customers (roots 1..8; parent(c) = c div 2 otherwise)
    * stands in for any parent-pointer table; each node must learn its
    * ROOT, its DEPTH, and its subtree's rolled-up account balance.
    *
    * The naive loop walks one parent edge per round — O(max depth)
    * shuffles, a non-starter for a million-deep chain. Pointer doubling
    * composes the link table with ITSELF each round ((node → anc, d)
    * ∘ (anc → anc', d') = (node → anc', d + d')), so covered distance
    * doubles per round: O(log depth) self-joins resolve ANY depth — 5
    * rounds here cover 2⁵ = 32 levels, deeper than a 4-billion-node
    * binary tree. Root links are fixed points ((root → root, 0)), so
    * resolved nodes pass through later rounds unchanged. Same iterative
    * discipline as g01/d05: per-round localCheckpoint keeps the plan
    * flat; every join is an equi-join on the ancestor key.
    *
    * All-integer (depths; balances in floor-cents) → the full fixed
    * point carries a DuckDB `WITH RECURSIVE` oracle — the two engines
    * compute the same closure by entirely different algorithms. */
  def hierarchyResolve(t: Tables, rounds: Int = 5): DataFrame = {
    val nodes = t.customer.select(col("c_custkey").as("node"),
      floor(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val links0 = nodes.select(col("node"),
      when(col("node") <= 8, col("node")).otherwise(expr("node div 2")).as("anc"),
      when(col("node") <= 8, 0L).otherwise(1L).as("d"))
    val links = resolvePointers(links0, rounds)
    val totals = links.join(nodes, "node")
      .groupBy(col("anc")).agg(sum(col("bal_cents")).as("root_total_bal_cents"))
    links
      .join(broadcast(totals), "anc")
      .select(col("node").as("node_id"), col("anc").as("root_id"),
        col("d").as("depth"), col("root_total_bal_cents"))
      .orderBy(col("node_id"))
  }

  /** Pointer-doubling core: `links0` is one row per node —
    * (node, parent-or-self, 1-or-0) — a functional link table (exactly
    * one ancestor pointer per node, roots self-looped at distance 0).
    * Each round composes the table with itself, doubling the covered
    * distance; `rounds` rounds resolve any forest of depth ≤ 2^rounds
    * while keeping exactly one row per node throughout.
    *
    * Convergence guard: `rounds` is a HINT, not a correctness
    * precondition. After the hinted rounds one anti-join count checks the
    * fixed point (every `anc` must be a root, i.e. a self-looped node);
    * if any pointer is still mid-tree the loop keeps doubling — a deeper
    * forest costs extra rounds, never a silently wrong `anc` (the round-4
    * advisory's failure mode). Termination: in a valid forest every extra
    * round STRICTLY shrinks the unresolved set — an unresolved node at
    * depth D > 2^k has an ancestor at every depth below it, so depths in
    * (2^k, min(D, 2^(k+1))] exist and resolve that round — so a round
    * with no progress proves a cycle with no self-looped root (no fixed
    * point exists) and fails loudly after ONE wasted round instead of
    * spinning; the 62-round cap (a chain deeper than 2⁶²) is an
    * unreachable backstop. */
  def resolvePointers(links0: DataFrame, rounds: Int): DataFrame = {
    val MaxRounds = 62
    var links = links0.localCheckpoint(true)
    def step(): Unit = {
      links = links.as("a")
        .join(links.as("b"), col("a.anc") === col("b.node"))
        .select(col("a.node"), col("b.anc"), (col("a.d") + col("b.d")).as("d"))
        .localCheckpoint(true)
    }
    (1 to rounds).foreach(_ => step())
    // A pointer is resolved iff its anc is a TRUE root: self-looped AT
    // DISTANCE 0. The d=0 guard matters — doubling collapses a cycle of
    // even length into self-loops with d>0 (1→2→1 becomes 1→1 at d=2),
    // which would otherwise masquerade as roots.
    def unresolved(): Long = {
      val roots = links.where(col("node") === col("anc") && col("d") === 0)
        .select(col("node").as("root"))
      links.join(roots, col("anc") === col("root"), "left_anti").count()
    }
    var round = rounds
    var pending = unresolved()
    var prev = Long.MaxValue
    while (pending > 0 && pending < prev && round < MaxRounds) {
      prev = pending
      step(); round += 1; pending = unresolved()
    }
    if (pending > 0)
      throw new IllegalStateException(
        s"resolvePointers: $pending pointers unresolved after $round rounds " +
          "with no further progress — the link table has a cycle with no " +
          "self-looped root")
    links
  }

  /** Multi-source BFS hop distances over the trading graph — the
    * "blast radius" primitive (how far is every entity from a seed set:
    * compromised suppliers, recalled parts, a marketing cohort).
    * Sources are derived relationally from the graph itself (supplier
    * nodes with suppkey ≡ 0 mod 4), so both engines agree on the seed
    * set without a side channel.
    *
    * This is DELTA iteration, not bulk iteration: each round joins the
    * edge set against only the FRONTIER (nodes first reached last
    * round), takes the map-side-combining min over arriving distances,
    * and anti-joins the known set so the frontier stays minimal —
    * visited nodes never re-enter the join. Rounds = eccentricity of
    * the seed set (~6 on this near-bipartite graph), each round ONE
    * shuffle-join + ONE partial agg + ONE anti-join. The edge table is
    * persisted hash-partitioned by src once (the g01 discipline), so
    * per-round joins move only frontier rows. Termination is exact: the
    * loop ends when the frontier empties; a 64-round backstop turns a
    * pathological input into a loud failure instead of an endless loop.
    *
    * All-integer distances (unreached = -1) → full DuckDB oracle: a
    * bounded `WITH RECURSIVE ... UNION` walk computes min hop counts by
    * a completely different algorithm (level-synchronous dedup walk vs
    * frontier delta iteration) and must agree bit-for-bit. */
  def bfsDistances(t: Tables, maxRounds: Int = 20): DataFrame = {
    val edges = graft.InternalCaches.track {
      tradeEdges(t).repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val nodes = edges.select(col("src").as("node")).distinct()
    val sources = nodes
      .filter(col("node") % 2 === 1 && expr("((node - 1) div 2) % 4") === 0)
    var dist = sources.select(col("node"), lit(0L).as("dist")).localCheckpoint(true)
    var frontier = dist
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      round += 1
      val arrivals = edges
        .join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + 1L).as("dist"))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      val discovered = arrivals
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .localCheckpoint(true)
      if (discovered.isEmpty) converged = true
      else {
        dist = dist.unionByName(discovered).localCheckpoint(true)
        frontier = discovered
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"bfsDistances: frontier still live after $maxRounds rounds — " +
          "eccentricity exceeds the hint; raise maxRounds")
    nodes.join(dist, Seq("node"), "left")
      .select(col("node").as("node_id"),
        when(col("node") % 2 === 1, "supplier").otherwise("customer").as("kind"),
        coalesce(col("dist"), lit(-1L)).as("dist"))
      .orderBy(col("node_id"))
  }

  /** g10: single-source-set WEIGHTED shortest paths — g04's BFS measures
    * hops; the business question is usually weighted ("how close is
    * this supplier through STRONG trading relationships"). Edge weight
    * is derived from relationship intensity: w = max(1, 100 div n_txn)
    * for n_txn lineitems between the pair — heavy trading ⇒ short edge;
    * exact integer arithmetic so every relaxation replays in SQL.
    *
    * Algorithm: distributed Bellman-Ford with a DELTA frontier — only
    * nodes whose tentative distance IMPROVED this round re-expand next
    * round (the weighted generalization of g04's discovered-set
    * frontier; unlike BFS a settled node can re-enter the frontier when
    * a shorter many-hop path arrives later). One exchange per round
    * (the frontier⋈edges arrival agg); the running dist table updates
    * by anti-join + union of the improved rows, localCheckpoint-frozen
    * per round (the g01/g04 iterative-fixed-point discipline: lineage
    * must not grow with rounds).
    *
    * `distCap` is a DECLARED horizon, part of the semantics: arrivals
    * beyond it are pruned in-flight (at corpus scale this bounds both
    * the frontier and — in the oracle — the recursive walk's state,
    * exactly like g04's hop bound), and nodes beyond it report -1
    * alongside the genuinely unreachable. Termination: every frontier
    * row strictly decreases an integer distance bounded below, so the
    * improved set empties in ≤ distCap/min_w rounds; `maxRounds`
    * therefore DEFAULTS to that semantic bound (min edge weight is 1,
    * so distCap rounds always suffice — a fixed smaller default could
    * throw on valid data at larger scale factors) and stays overridable
    * as the same loud-failure hint as g04's. */
  def weightedSssp(t: Tables, distCap: Long = 300L,
      maxRounds: Int = -1): DataFrame = {
    val roundCap = if (maxRounds > 0) maxRounds
      else math.min(distCap, Int.MaxValue.toLong).toInt
    val pairs = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .agg(count(lit(1)).as("n"))
    val half = pairs.select(col("src"), col("dst"),
      greatest(lit(1L), expr("100 DIV n")).as("w"))
    val edges = graft.InternalCaches.track {
      half.unionByName(
          half.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        .repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val nodes = edges.select(col("src").as("node")).distinct()
    val sources = nodes
      .filter(col("node") % 2 === 1 && expr("((node - 1) div 2) % 4") === 0)
    var dist = sources.select(col("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    var frontier = dist
    var round = 0
    var converged = false
    while (!converged && round < roundCap) {
      round += 1
      val arrivals = edges
        .join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("cand"))
        .groupBy(col("node")).agg(min(col("cand")).as("cand"))
        .filter(col("cand") <= distCap)
      val improved = arrivals
        .join(dist.withColumnRenamed("dist", "cur"), Seq("node"), "left")
        .filter(col("cur").isNull || col("cand") < col("cur"))
        .select(col("node"), col("cand").as("dist"))
        .localCheckpoint(true)
      if (improved.isEmpty) converged = true
      else {
        dist = dist.join(improved.select(col("node")), Seq("node"), "left_anti")
          .unionByName(improved).localCheckpoint(true)
        frontier = improved
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"weightedSssp: frontier still improving after $roundCap rounds — " +
          "raise maxRounds (bounded by distCap/min_w)")
    nodes.join(dist, Seq("node"), "left")
      .select(col("node").as("node_id"),
        when(col("node") % 2 === 1, "supplier").otherwise("customer").as("kind"),
        coalesce(col("dist"), lit(-1L)).as("wdist"))
      .orderBy(col("node_id"))
  }

  /** g05's supplier-hub cap: common-neighbor evidence through a
    * supplier trading with more customers than this is discounted to
    * zero outright (its 1/ln(deg) weight is already near-noise) and,
    * structurally, the candidate fan-out through it is skipped —
    * bounding per-query-node work by deg(a)·cap at any corpus size.
    * Inactive at the test SFs (max supplier degree ≈ 500 at sf0.1);
    * exercised by GraphSpec at a synthetic cap of 3. Declared BEFORE
    * [[all]]: the oracle SQL interpolates it at object-init time.
    */
  val LinkHubCap = 1000L

  /** g05 body (see the catalog entry's doc); `hubCap` is a parameter so
    * the spec can exercise the hub-exclusion path on test-scale data. */
  def linkPrediction(t: Tables, hubCap: Long = LinkHubCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: the distinct pair table feeds THREE consumers (degree
    // dimension, query edge set, candidate side) — without the barrier
    // Catalyst recomputes the orders⋈lineitem distinct per consumer
    val pairs = graft.InternalCaches.track(
      t.orders
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val inv = pairs.groupBy(col("supp")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= hubCap)
      .select(col("supp"),
        round(lit(1000000.0) / log(col("deg").cast("double")))
          .cast("long").as("inv_e6"))
    val q = pairs.filter(col("cust") % 75 === 0)
      .select(col("cust").as("a"), col("supp"))
    // No broadcast() hints here: `q` is 1/75 of the distinct pair table
    // and `inv` is supplier-dimension-sized — both LINEAR in corpus size,
    // so a forced hint would pin driver materialization and OOM at 100×.
    // At test SFs AQE's runtime size stats convert both joins to
    // broadcast-hash anyway (PlanShapeSpec asserts this); past the
    // auto-threshold they degrade to shuffle-hash on `supp` with no
    // semantic change — the size-adaptive plan the scale doc claims.
    val scored = pairs.select(col("cust").as("b"), col("supp"))
      .join(q, Seq("supp"))
      .filter(col("a") =!= col("b"))
      .join(inv, Seq("supp"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"), sum(col("inv_e6")).as("aa_e6"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("a")).orderBy(col("aa_e6").desc, col("b"))))
      .filter(col("rk") <= 10)
      .select(col("a").as("cust_a"), col("b").as("cust_b"),
        col("n_common"), col("aa_e6"), col("rk").cast("long").as("rk"))
      .orderBy(col("cust_a"), col("rk"))
  }

  /** Fixed-round synchronous LABEL PROPAGATION communities (Raghavan et
    * al. 2007) over the trading graph — the cheap community detector a
    * corpus team runs to group crawl domains / trading counterparties
    * before per-community sampling caps. Deterministic by construction
    * where textbook LPA is not: votes are counted synchronously from
    * the previous round's labels (async LPA depends on visit order),
    * every node also votes for its OWN current label once (which damps
    * the 2-cycle oscillation pure synchronous LPA exhibits on bipartite
    * graphs — and this customer↔supplier graph IS bipartite), and the
    * argmax tie-break is total (count desc, then min label). A fixed
    * round count replaces the convergence loop so the oracle unrolls to
    * plain CTEs.
    *
    * l₀(v) = v;  lₜ₊₁(v) = argmax_{l} |{u→v : lₜ(u)=l}| + [lₜ(v)=l],
    * ties → smaller l.
    *
    * Scale shape (the g01 discipline): edges persisted hash-partitioned
    * by src ONCE, so each round's join moves only the N-row label
    * vector; the mode-vote is two hash aggregates — (node, lbl) counts
    * then the per-node argmax as a map-side-combinable min(struct(-c,
    * lbl)), NOT a window, so a hub node's vote list never sorts in one
    * task; per-round localCheckpoint keeps the plan constant-size. */
  def labelPropagation(t: Tables, rounds: Int = 3): DataFrame = {
    val edges = graft.InternalCaches.track {
      tradeEdges(t).repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)
    (1 to rounds).foreach { _ =>
      val votes = edges.join(labels, col("src") === col("node"))
        .select(col("dst").as("n"), col("lbl"))
        .unionByName(labels.select(col("node").as("n"), col("lbl")))
      labels = votes
        .groupBy(col("n"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("n"))
        .agg(min(struct((-col("c")).as("negc"), col("lbl").as("l"))).as("w"))
        .select(col("n").as("node"), col("w.l").as("lbl"))
        .localCheckpoint(true)
    }
    val sizes = labels.groupBy(col("lbl"))
      .agg(count(lit(1)).as("community_size"))
    labels.join(sizes, Seq("lbl"))
      .select(col("node").as("node_id"),
        when(col("node") % 2 === 1, "supplier").otherwise("customer").as("kind"),
        col("lbl").as("community"), col("community_size"))
      .orderBy(col("node_id"))
  }

  /** Fixed-round K-CORE decomposition (degree peeling) over the trading
    * graph — the standard density filter a corpus/graph team runs
    * before expensive per-node work: nodes that cannot sit inside a
    * subgraph of minimum degree k are peeled, and what survives R
    * peel rounds approximates the k-core (equals it once a round is a
    * fixed point). On the trading graph it answers "which customers
    * and suppliers are embedded in a dense trading neighborhood"
    * (ie. not one-off counterparties) — the same shape as keeping only
    * well-linked crawl domains. A fixed round count R replaces the
    * until-fixpoint loop so the oracle unrolls to plain CTEs (the
    * g07/g01 discipline); the output is TOTAL over the node set:
    * survivors carry status 'core' and their final in-core degree,
    * peeled nodes carry 'peeled' and 0.
    *
    * s₀ = V;  sₜ₊₁ = { v ∈ sₜ : |N(v) ∩ sₜ| ≥ k },
    * core_degree(v∈s_R) = |N(v) ∩ s_{R-1}|.
    *
    * Scale shape: edges persisted hash-partitioned by dst ONCE; each
    * round is one join of edges to the (N-row) survivor vector on dst
    * — reusing the persisted layout, only the survivor vector moves —
    * then a map-side-combined count by src and an N-row×N-row
    * membership join (no broadcast hint: both sides are
    * corpus-proportional, AQE picks the strategy). Per-round
    * localCheckpoint keeps the iterative plan constant-size. */
  def kCore(t: Tables, k: Int = 4, rounds: Int = 3): DataFrame = {
    val edges = graft.InternalCaches.track {
      tradeEdges(t).repartition(col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val nodes = edges.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    var surv = nodes
    (1 to rounds).foreach { _ =>
      val deg = edges.join(surv.select(col("node")), col("dst") === col("node"))
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      surv = deg
        .join(surv.select(col("node").as("m")), col("src") === col("m"))
        .filter(col("deg") >= k)
        .select(col("src").as("node"), col("deg"))
        .localCheckpoint(true)
    }
    nodes.select(col("node"))
      .join(surv, Seq("node"), "left")
      .select(col("node").as("node_id"),
        when(col("node") % 2 === 1, "supplier").otherwise("customer").as("kind"),
        when(col("deg").isNotNull, "core").otherwise("peeled").as("status"),
        coalesce(col("deg"), lit(0L)).as("core_degree"))
      .orderBy(col("node_id"))
  }

  /** One unrolled peel round: degree restricted to the previous
    * survivor set, kept iff ≥ k. Must mirror [[kCore]]. */
  private def kcoreOracleIter(prev: String, cur: String, k: Int): String =
    s"""$cur AS (
       |  SELECT e.src AS node, count(*) AS deg
       |  FROM edges e
       |  JOIN $prev p ON e.dst = p.node
       |  JOIN $prev q ON e.src = q.node
       |  GROUP BY e.src HAVING count(*) >= $k)""".stripMargin

  /** One unrolled synchronous LPA round: neighbor votes + the self-vote,
    * argmax by (count desc, label asc). Must mirror [[labelPropagation]]. */
  private def lpaOracleIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT node, lbl FROM (
       |    SELECT node, lbl,
       |           row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
       |    FROM (
       |      SELECT node, lbl, count(*) AS c FROM (
       |        SELECT e.dst AS node, p.lbl AS lbl
       |        FROM edges e JOIN $prev p ON e.src = p.node
       |        UNION ALL
       |        SELECT node, lbl FROM $prev) v
       |      GROUP BY node, lbl) cnt)
       |  WHERE rn = 1)""".stripMargin

  private def oracleIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.node, (SELECT (15 * (${Scale} // count(*))) // 100 FROM nodes)
       |           + (85 * coalesce(s.t, 0)) // 100 AS r
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS node, sum($prev.r // e.deg) AS t
       |    FROM edges e JOIN $prev ON e.src = $prev.node
       |    GROUP BY e.dst) s USING (node))""".stripMargin

  /** The g06 seed predicate in DuckDB SQL (must mirror [[pprSeed]]). */
  private val pprSeedSql = "(node % 2 = 1 AND ((node - 1) // 2) % 4 = 0)"

  /** One unrolled PPR iteration: the base term lands on seeds only. */
  private def pprOracleIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.node,
       |         CASE WHEN ${pprSeedSql.replace("node", "n.node")}
       |              THEN (SELECT (15 * (${Scale} // count(*))) // 100 FROM seeds)
       |              ELSE 0 END
       |           + (85 * coalesce(s.t, 0)) // 100 AS r
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS node, sum($prev.r // e.deg) AS t
       |    FROM edges e JOIN $prev ON e.src = $prev.node
       |    GROUP BY e.dst) s USING (node))""".stripMargin


  /** Neighborhood-size sketching — HyperBall (Boldi & Vigna, "In-Core
    * Computation of Geometric Centralities with HyperBall", 2013) with
    * k-minimum-values registers instead of HLL: per node, the 2-hop
    * ball size |{u : dist(v,u) ≤ 2}| estimated by iteratively merging
    * every neighbor's sketch into the node's own. The corpus-scale
    * question it answers ("how connected is this graph? what is its
    * effective diameter / reach profile?") is exactly what exact BFS
    * from every node cannot — N BFS traversals vs `rounds` sketch
    * sweeps.
    *
    * KMV instead of HyperLogLog is the q66 lesson applied to graphs:
    * the registers are plain sorted md5-hashes, so every merge decision
    * replays in any engine (`row_number() OVER (ORDER BY h) <= k`) and
    * the entry carries a FULL value oracle where an HLL ball would be
    * rows-only (engine-specific binary). The estimator is q66's
    * (k−1)·H / h(k).
    *
    * Scale shape: one round = one join of the edge list to the |V|·k
    * sketch frame + ONE [[graft.functions.expressions.KmvMerge]]
    * aggregate — |E| register merges, the HyperBall cost, with
    * map-side partial merging collapsing any in-degree before the
    * shuffle (a row-explode formulation would instead shuffle |E|·k
    * rows through a distinct AND a bottom-k). Eager localCheckpoint
    * per round keeps the iterative plan constant-size (GraphOps
    * discipline); edges persist once and every round's join reuses the
    * layout. */
  def hyperBallKmv(t: Tables, k: Int = 32, rounds: Int = 2): DataFrame = {
    val e = graft.InternalCaches.track(
      tradeEdges(t).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nodes = e.select(col("src").as("node")).distinct()
    val h = conv(substring(md5(col("node").cast("string")), 1, 13), 16, 10)
      .cast("long")
    val kmv = graft.functions.expressions.KmvMerge.merge(k)
    var sk = nodes.select(col("node"), array(h).as("sk")).localCheckpoint(true)
    (1 to rounds).foreach { _ =>
      sk = e.join(sk, col("src") === col("node"))
        .select(col("dst").as("node"), col("sk"))
        .unionByName(sk)
        .groupBy(col("node"))
        .agg(kmv(col("sk")).as("sk"))
        .localCheckpoint(true)
    }
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "node")
    val hashSpace = 4503599627370496L // 2^52: 13 hex chars of md5
    sk.join(deg, Seq("node"))
      .select(col("node").as("node_id"), col("deg"),
        size(col("sk")).cast("long").as("b2_kmv_size"),
        when(size(col("sk")) === k, element_at(col("sk"), k))
          .otherwise(lit(0L)).as("b2_kth_hash"))
      .select(col("node_id"), col("deg"), col("b2_kmv_size"), col("b2_kth_hash"),
        when(col("b2_kmv_size") < k, col("b2_kmv_size"))
          .otherwise(expr(s"${k - 1}L * ${hashSpace}L div b2_kth_hash"))
          .as("b2_est"))
      .orderBy(col("node_id"))
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "g01_pagerank",
      "5-iteration integer PageRank over the customer-supplier trading graph",
      (spark, dir) => pageRank(Tables(spark, dir)),
      Some(
        s"""WITH e0 AS (
           |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |eraw AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
           |deg AS (SELECT src, count(*) AS deg FROM eraw GROUP BY src),
           |edges AS (SELECT eraw.src, eraw.dst, deg.deg FROM eraw JOIN deg USING (src)),
           |nodes AS (SELECT DISTINCT src AS node FROM eraw),
           |r0 AS (SELECT node, (SELECT ${Scale} // count(*) FROM nodes) AS r FROM nodes),
           |${oracleIter("r0", "r1")},
           |${oracleIter("r1", "r2")},
           |${oracleIter("r2", "r3")},
           |${oracleIter("r3", "r4")},
           |${oracleIter("r4", "r5")}
           |SELECT node AS node_id,
           |       CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END AS kind,
           |       CAST(r AS BIGINT) AS rank_scaled -- sum() upcasts to HUGEINT -> float64 in pandas
           |FROM r5
           |ORDER BY node_id""".stripMargin)
    ),

    GraftQuery(
      "g02_triangle_count",
      "per-node triangle counts over the part co-purchase graph via degree-ordered orientation",
      (spark, dir) => triangleCounts(Tables(spark, dir)),
      Some(
        """WITH li AS (
          |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 25),
          |e0 AS (
          |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          |  FROM li a JOIN li b
          |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
          |deg AS (
          |  SELECT node, count(*) AS d FROM (
          |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
          |  GROUP BY node),
          |o AS (
          |  SELECT CASE WHEN (du.d, u) < (dv.d, v) THEN u ELSE v END AS s,
          |         CASE WHEN (du.d, u) < (dv.d, v) THEN v ELSE u END AS t
          |  FROM e0 JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
          |w AS (
          |  SELECT e1.s AS a, e1.t AS b, e2.t AS c
          |  FROM o e1 JOIN o e2 ON e1.s = e2.s AND e1.t < e2.t),
          |closing AS (SELECT s AS b, t AS c FROM o UNION ALL SELECT t, s FROM o),
          |tri AS (SELECT a, b, c FROM w JOIN closing USING (b, c))
          |SELECT node_id, count(*) AS n_triangles
          |FROM (SELECT unnest([a, b, c]) AS node_id FROM tri)
          |GROUP BY node_id
          |ORDER BY node_id""".stripMargin)
    ),

    GraftQuery(
      "g03_hierarchy_resolve",
      "root/depth/subtree-rollup of a parent-pointer forest via pointer doubling (log-depth rounds)",
      (spark, dir) => hierarchyResolve(Tables(spark, dir)),
      Some(
        """WITH RECURSIVE walk AS (
          |  SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
          |  UNION ALL
          |  SELECT node, cur // 2, depth + 1 FROM walk WHERE cur > 8),
          |resolved AS (
          |  SELECT node, cur AS root_id, depth FROM walk WHERE cur <= 8),
          |bal AS (
          |  SELECT c_custkey AS node,
          |         CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
          |  FROM customer),
          |totals AS (
          |  SELECT r.root_id, CAST(sum(b.bal_cents) AS BIGINT) AS root_total_bal_cents
          |  FROM resolved r JOIN bal b USING (node)
          |  GROUP BY r.root_id)
          |SELECT r.node AS node_id, r.root_id,
          |       CAST(r.depth AS BIGINT) AS depth, t.root_total_bal_cents
          |FROM resolved r JOIN totals t USING (root_id)
          |ORDER BY node_id""".stripMargin)
    ),

    GraftQuery(
      "g04_bfs_distance",
      "multi-source BFS hop distances from seed suppliers via frontier delta iteration",
      (spark, dir) => bfsDistances(Tables(spark, dir)),
      Some(
        """WITH RECURSIVE e0 AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |eraw AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
          |nodes AS (SELECT DISTINCT src AS node FROM eraw),
          |sources AS (
          |  SELECT node FROM nodes
          |  WHERE node % 2 = 1 AND ((node - 1) // 2) % 4 = 0),
          |walk AS (
          |  SELECT node, 0 AS dist FROM sources
          |  UNION
          |  SELECT e.dst AS node, w.dist + 1 AS dist
          |  FROM walk w JOIN eraw e ON e.src = w.node
          |  WHERE w.dist < 20),
          |d AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
          |SELECT n.node AS node_id,
          |       CASE WHEN n.node % 2 = 1 THEN 'supplier' ELSE 'customer' END AS kind,
          |       CAST(coalesce(d.dist, -1) AS BIGINT) AS dist
          |FROM nodes n LEFT JOIN d USING (node)
          |ORDER BY node_id""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // g05: Adamic-Adar link prediction over the bipartite trade graph —
    // "customers most similar to customer a" scored by their shared
    // suppliers, each shared supplier s contributing 1/ln(deg(s))
    // (Adamic & Adar 2003, public paper; the standard common-neighbor
    // score with hub discounting). The float 1/ln(deg) is quantized to
    // integer micro-units ON THE SUPPLIER-DEGREE DIMENSION (t12
    // discipline), so per-pair sums are exact BIGINTs and the oracle
    // hash holds. deg-1 suppliers cannot witness a pair (their only
    // customer is `a` itself) and ln(1)=0 would divide by zero — they
    // are excluded by definition, as are hub suppliers above
    // [[LinkHubCap]] (inactive at test SFs, load-bearing at 100 TB:
    // candidate volume is bounded by |Q|·deg(a)·cap instead of a hub's
    // full neighborhood, and 1/ln(deg) already makes a mega-hub's
    // evidence negligible — the d12 hot-key-cap discipline).
    //
    // Plan shape: the |Q|·deg(a)-row query edge set BROADCASTS onto the
    // supplier-partitioned pair table (no big-side shuffle), the
    // supplier weight dimension broadcasts onto the candidates, ONE
    // map-side-combined shuffle aggregates (a,b) scores, and the top-10
    // per query node is a window over per-group candidate sets bounded
    // by deg(a)·cap. Two shuffles total (degree agg + score agg).
    GraftQuery(
      "g05_link_prediction",
      "Adamic-Adar similar-customer top-10 per query customer (shared-supplier evidence)",
      (spark, dir) => linkPrediction(Tables(spark, dir)),
      Some(
        s"""WITH pairs AS (
           |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |inv AS (
           |  SELECT supp,
           |         CAST(round(1000000.0 / ln(CAST(deg AS DOUBLE))) AS BIGINT) AS inv_e6
           |  FROM (SELECT supp, count(*) AS deg FROM pairs GROUP BY 1)
           |  WHERE deg BETWEEN 2 AND $LinkHubCap),
           |q AS (SELECT cust AS a, supp FROM pairs WHERE cust % 75 = 0),
           |scored AS (
           |  SELECT q.a, p.cust AS b, CAST(count(*) AS BIGINT) AS n_common,
           |         CAST(sum(i.inv_e6) AS BIGINT) AS aa_e6
           |  FROM q JOIN pairs p USING (supp) JOIN inv i USING (supp)
           |  WHERE p.cust <> q.a
           |  GROUP BY 1, 2),
           |rk AS (
           |  SELECT a, b, n_common, aa_e6,
           |         row_number() OVER (PARTITION BY a ORDER BY aa_e6 DESC, b) AS rk
           |  FROM scored)
           |SELECT a AS cust_a, b AS cust_b, n_common, aa_e6, CAST(rk AS BIGINT) AS rk
           |FROM rk WHERE rk <= 10
           |ORDER BY cust_a, rk""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // g06: personalized PageRank from the g04 seed suppliers — see
    // [[personalizedPageRank]]. The oracle unrolls the same five
    // integer iterations with the seed-conditional base term.
    GraftQuery(
      "g06_personalized_pagerank",
      "5-iteration integer personalized PageRank from the g04 seed suppliers",
      (spark, dir) => personalizedPageRank(Tables(spark, dir)),
      Some(
        s"""WITH e0 AS (
           |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |eraw AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
           |deg AS (SELECT src, count(*) AS deg FROM eraw GROUP BY src),
           |edges AS (SELECT eraw.src, eraw.dst, deg.deg FROM eraw JOIN deg USING (src)),
           |nodes AS (SELECT DISTINCT src AS node FROM eraw),
           |seeds AS (SELECT node FROM nodes WHERE $pprSeedSql),
           |r0 AS (
           |  SELECT node,
           |         CASE WHEN $pprSeedSql
           |              THEN (SELECT ${Scale} // count(*) FROM seeds) ELSE 0 END AS r
           |  FROM nodes),
           |${pprOracleIter("r0", "r1")},
           |${pprOracleIter("r1", "r2")},
           |${pprOracleIter("r2", "r3")},
           |${pprOracleIter("r3", "r4")},
           |${pprOracleIter("r4", "r5")}
           |SELECT node AS node_id,
           |       CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END AS kind,
           |       CAST(r AS BIGINT) AS rank_scaled
           |FROM r5
           |ORDER BY node_id""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // g07: community detection by synchronous label propagation — see
    // [[labelPropagation]]. The oracle unrolls the same three
    // mode-vote rounds (count desc, label asc argmax per node).
    GraftQuery(
      "g07_community_labelprop",
      "3-round deterministic label-propagation communities over the trading graph (self-vote, min-label tie-break)",
      (spark, dir) => labelPropagation(Tables(spark, dir)),
      Some(
        s"""WITH e0 AS (
           |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
           |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
           |${lpaOracleIter("l0", "l1")},
           |${lpaOracleIter("l1", "l2")},
           |${lpaOracleIter("l2", "l3")},
           |sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS community_size
           |       FROM l3 GROUP BY lbl)
           |SELECT l.node AS node_id,
           |       CASE WHEN l.node % 2 = 1 THEN 'supplier' ELSE 'customer' END AS kind,
           |       l.lbl AS community, sz.community_size
           |FROM l3 l JOIN sz USING (lbl)
           |ORDER BY node_id""".stripMargin)
    ),

    // ------------------------------------------------------------------

    // ------------------------------------------------------------------
    // g09: HyperBall-with-KMV 2-hop neighborhood sizes — see
    // [[hyperBallKmv]]. The oracle unrolls both sketch sweeps: UNION
    // dedups members, row_number <= k is the register cut, and the
    // estimator is q66's.
    GraftQuery(
      "g09_hyperball_kmv",
      "HyperBall-style 2-hop ball-size estimates per node (KMV registers k=32, fully oracled)",
      (spark, dir) => hyperBallKmv(Tables(spark, dir)),
      Some(
        s"""WITH p AS (
           |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
           |n AS (SELECT DISTINCT src AS node FROM e),
           |h0 AS (SELECT node,
           |         CAST('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 13) AS BIGINT) AS h
           |       FROM n),
           |r1 AS (SELECT e.dst AS node, h.h FROM e JOIN h0 h ON h.node = e.src
           |       UNION SELECT node, h FROM h0),
           |s1 AS (SELECT node, h FROM (
           |         SELECT node, h, row_number() OVER (PARTITION BY node ORDER BY h) AS rn
           |         FROM r1) WHERE rn <= 32),
           |r2 AS (SELECT e.dst AS node, s.h FROM e JOIN s1 s ON s.node = e.src
           |       UNION SELECT node, h FROM s1),
           |s2 AS (SELECT node, h, row_number() OVER (PARTITION BY node ORDER BY h) AS rn
           |       FROM r2),
           |agg AS (SELECT node, CAST(count(*) AS BIGINT) AS b2_kmv_size,
           |               CAST(coalesce(max(CASE WHEN rn = 32 THEN h END), 0) AS BIGINT) AS b2_kth_hash
           |        FROM s2 WHERE rn <= 32 GROUP BY node),
           |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1)
           |SELECT a.node AS node_id, d.deg, a.b2_kmv_size, a.b2_kth_hash,
           |       CASE WHEN a.b2_kmv_size < 32 THEN a.b2_kmv_size
           |            ELSE 31 * 4503599627370496 // a.b2_kth_hash END AS b2_est
           |FROM agg a JOIN deg d USING (node)
           |ORDER BY node_id""".stripMargin)
    ),

    // g08: k-core decomposition by fixed-round degree peeling — see
    // [[kCore]]. The oracle unrolls the same three peel rounds
    // (HAVING count(*) >= k over the surviving subgraph).
    GraftQuery(
      "g08_kcore_peel",
      "3-round k-core peel (k=4) over the trading graph: total core/peeled verdict with final in-core degree",
      (spark, dir) => kCore(Tables(spark, dir)),
      Some(
        s"""WITH e0 AS (
           |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
           |s0 AS (SELECT DISTINCT src AS node FROM edges),
           |${kcoreOracleIter("s0", "s1", 4)},
           |${kcoreOracleIter("s1", "s2", 4)},
           |${kcoreOracleIter("s2", "s3", 4)}
           |SELECT n.node AS node_id,
           |       CASE WHEN n.node % 2 = 1 THEN 'supplier' ELSE 'customer' END AS kind,
           |       CASE WHEN s3.node IS NULL THEN 'peeled' ELSE 'core' END AS status,
           |       CAST(coalesce(s3.deg, 0) AS BIGINT) AS core_degree
           |FROM s0 n LEFT JOIN s3 USING (node)
           |ORDER BY node_id""".stripMargin)
    ),

    // ------------------------------------------------------------------
    // g10: weighted shortest paths from the seed suppliers — see
    // [[weightedSssp]]. FULLY ORACLED: integer weights and integer
    // relaxations mean DuckDB's recursive walk (UNION-deduped
    // (node, dist) states, pruned at the same declared horizon) reaches
    // the identical fixed point; min-per-node reads off the answer.
    GraftQuery(
      "g10_weighted_sssp",
      "weighted shortest paths (Bellman-Ford delta frontier, w = max(1, 100 div n_txn), horizon 300)",
      (spark, dir) => weightedSssp(Tables(spark, dir)),
      Some(
        """WITH RECURSIVE p0 AS (
          |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
          |         count(*) AS n
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |  GROUP BY 1, 2),
          |e0 AS (SELECT src, dst, greatest(1, 100 // n) AS w FROM p0),
          |eraw AS (SELECT src, dst, w FROM e0
          |         UNION ALL SELECT dst, src, w FROM e0),
          |nodes AS (SELECT DISTINCT src AS node FROM eraw),
          |sources AS (
          |  SELECT node FROM nodes
          |  WHERE node % 2 = 1 AND ((node - 1) // 2) % 4 = 0),
          |walk AS (
          |  SELECT node, CAST(0 AS BIGINT) AS dist FROM sources
          |  UNION
          |  SELECT e.dst AS node, CAST(w.dist + e.w AS BIGINT) AS dist
          |  FROM walk w JOIN eraw e ON e.src = w.node
          |  WHERE w.dist + e.w <= 300),
          |d AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
          |SELECT n.node AS node_id,
          |       CASE WHEN n.node % 2 = 1 THEN 'supplier' ELSE 'customer' END AS kind,
          |       CAST(coalesce(d.dist, -1) AS BIGINT) AS wdist
          |FROM nodes n LEFT JOIN d USING (node)
          |ORDER BY node_id""".stripMargin)
    )
  )
}
