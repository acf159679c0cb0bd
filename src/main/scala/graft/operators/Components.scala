package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering step
  * after near-duplicate PAIR detection: pairs (a,b),(b,c) must collapse to
  * one keep-group {a,b,c} before a corpus can drop duplicates (the
  * reference surface's dedup endpoint; every 100 TB dedup pipeline ends
  * here).
  *
  * Algorithm: iterative min-label propagation. Each round every node
  * adopts the minimum label among itself and its neighbors — one
  * edge-to-label equality join + groupBy-min per round, converging in
  * O(graph diameter) rounds. Near-dup clusters are dense and tiny
  * (diameter ≤ a few hops), so 3-5 rounds close them; the driver checks a
  * convergence count per round (one action, same discipline as GraphX's
  * connectedComponents Pregel loop) and `maxIter` bounds pathological
  * chains. All state lives in (node, label) DataFrames partitioned by the
  * join keys — no driver-side graph, no per-node collect.
  */
object Components {

  // Round-15 note (measured, kept for the next optimizer): an attempt to
  // pre-partition + sort + persist the loop-invariant edge frames by
  // their per-round join key (so rounds skip the edge-side Exchange/Sort)
  // REGRESSED every loop it touched at bench scale (q37 1.9×, q47 1.4×,
  // q40 1.2× in an interleaved A/B) — at these sizes the per-round joins
  // already BROADCAST the frontier/label side (checkpoint gives the
  // planner accurate sizes), so no edge exchange existed to remove, and
  // the extra exchange+sort+materialization was pure cost. At 100 TB the
  // layout-reuse story belongs to the persisted BUCKETED tables
  // (TextDedup.bandedIndex discipline), not in-query persists.

  /** (id, component) for every node appearing in `edges`, where component
    * is the cluster's minimum node id. Columns `idA`/`idB` name the edge
    * endpoints in `edges`.
    */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
                          idB: String = "id_b",
                          maxIter: Int = 20): DataFrame = {
    // undirected: propagate along both orientations. Materialized ONCE —
    // the loop touches the edge list every iteration, and `edges` is
    // usually an expensive plan (the whole near-dup candidate pipeline)
    val e = edges.select(col(idA).as("u"), col(idB).as("v"))
      .union(edges.select(col(idB).as("u"), col(idA).as("v")))
      .distinct()
      .localCheckpoint(true)
    locally {
      // Round-16: FRONTIER-DELTA min-label propagation (the SCC
      // minLabels / relaxToFixpoint discipline) — only labels that
      // CHANGED last round flow along edges, improvements accumulate as
      // checkpointed LAYERS, and the running best per id is a lazy
      // union-min over the layers. Labels only decrease, so the
      // delta-synchronous rounds produce the SAME label frame per round
      // as the old full union+groupBy rewrite (monotone-fixpoint
      // induction), the round count is identical, and convergence is
      // "no improvement rows" — the per-round Σlbl 1-row witness and
      // the per-round V-sized re-materialization are both gone.
      // localCheckpoint, not persist: an iterative DataFrame loop grows
      // its lineage every round and replanning (and even the plan STRING)
      // eventually dominates or OOMs — truncate it each iteration, the
      // same discipline as GraphX's Pregel materialization.
      val collapseEvery = 12
      def fold(layers: Seq[DataFrame]): DataFrame =
        layers.reduce(_ union _)
          .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
      var layers = Vector(e.select(col("u").as("id")).distinct()
        .withColumn("lbl", col("id"))
        .localCheckpoint(true))
      var delta = layers.head
      var iter = 0
      var converged = false
      while (iter < maxIter && !converged) {
        val best = if (layers.size == 1) layers.head else fold(layers)
        // candidate labels flowing along edges: a CHANGED neighbor's
        // label reaches me (unchanged neighbors already contributed);
        // the convergence count rides the checkpoint job (IterUtil)
        val (next, improved) = IterUtil.checkpointCounted(
          e.join(delta, e("v") === delta("id"))
            .select(e("u").as("id"), delta("lbl").as("lbl"))
            .groupBy("id").agg(min("lbl").as("lbl"))
            .join(best.withColumnRenamed("lbl", "cur"), Seq("id"))
            .filter(col("lbl") < col("cur"))
            .select(col("id"), col("lbl")))
        converged = improved == 0L
        if (!converged) {
          layers :+= next
          delta = next
          if (layers.size > collapseEvery)
            layers = Vector(fold(layers).localCheckpoint(true))
        }
        iter += 1
      }
      // silent non-convergence would split true clusters and let duplicates
      // through the keep-one-per-group step — refuse instead
      require(converged,
        s"connectedComponents did not converge within $maxIter iterations " +
          "(graph diameter exceeds maxIter) — raise maxIter")
      val labels = if (layers.size == 1) layers.head else fold(layers)
      labels.select(col("id"), col("lbl").as("component"))
    }
  }

  // ---------------------------------------------------------------------
  // INCREMENTALLY MAINTAINED components — the last full-recompute in the
  // dedup story closed: the near-dup GATE admits pairs incrementally
  // (TextDedup.dedupGateBatch), but cluster membership used to need a
  // full-graph rerun per refresh. Here membership persists as a
  // [[BatchTables]] table of (id, component, _seq) rows and each delta
  // batch of edges re-propagates ONLY the touched subgraph:
  //
  //   1. the batch's edge endpoints look up their current components
  //      (one join of the small delta against the membership table);
  //   2. every member of a touched component is pulled in (a second
  //      membership join against the — typically broadcast-size — set
  //      of touched labels);
  //   3. min-label propagation runs over delta edges ∪ one star edge
  //      (member → its label) per affected member. Contracting an old
  //      component to a star is connectivity-exact, so the mini-graph's
  //      components equal the union graph's on the touched region —
  //      including the hard case where one late edge MERGES two prior
  //      components (both end up touched, both star-sets join);
  //   4. relabeled members land under the batch's own `_batch_id` with
  //      `_seq = batchId` carried IN the row, so latest-wins survives
  //      compaction's `_batch_id` normalization (the AnnIndex `_seq`
  //      discipline).
  //
  // Invariant (induction over batches): the latest-per-id view equals
  // the connected components of ALL edges absorbed so far, labels = min
  // member id — exactly the one-shot [[connectedComponents]] answer, so
  // the one-shot recursive-CTE oracle gates every batched arrival order
  // (`doc_dup_clusters_incr`).
  //
  // 100 TB shape: per batch the data-sized work is two hash joins of
  // the membership table against delta-derived key sets (AQE broadcasts
  // them when small) plus propagation over the AFFECTED subgraph only —
  // near-dup clusters are tiny, so the iterative part stays
  // delta-sized. Nothing rescans the pair-generation pipeline, and a
  // daily crawl delta no longer pays the full graph.
  // ---------------------------------------------------------------------

  /** Merge one batch of delta edges into the persisted component table
    * `table` at `path` ([[BatchTables]] replay discipline: re-running a
    * batch dynamic-overwrites its own partition, so crash/replay never
    * duplicates or forks membership).
    */
  def mergeBatchEdges(edges: DataFrame, table: String, path: String,
                      batchId: Long, idA: String = "id_a",
                      idB: String = "id_b", maxIter: Int = 20): Unit = {
    val spark = edges.sparkSession
    // consumed by endpoints + the mini-graph union: materialize the
    // (usually expensive) delta plan once
    val delta = edges.select(col(idA).cast("long").as("u"),
        col(idB).cast("long").as("v"))
      .distinct()
      .localCheckpoint(true)
    val empty = delta.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("component",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_seq",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_batch_id",
          org.apache.spark.sql.types.LongType))))
    BatchTables.ensureBatchTable(empty, table, path)

    val membership = componentsFromTable(spark, table)
    val endpoints = delta.select(col("u").as("id"))
      .union(delta.select(col("v").as("id"))).distinct()
    // components the delta touches, then ALL their members — the only
    // region whose labels can change
    val touched = membership.join(endpoints, "id")
      .select(col("component")).distinct()
    val affected = membership.join(touched, Seq("component"))
      .select(col("id"), col("component"))
    // star-contract each touched component onto its label node
    // (labels are member ids, so connectivity is preserved exactly)
    val mini = delta.union(
      affected.select(col("id").as("u"), col("component").as("v")))
    val relabeled = connectedComponents(mini, "u", "v", maxIter)
      .select(col("id"), col("component"),
        lit(batchId).as("_seq"), lit(batchId).as("_batch_id"))
    BatchTables.withDynamicOverwrite(spark) {
      relabeled.write.mode("overwrite").insertInto(table)
    }
  }

  /** Current membership: latest (`_seq`-wise) component per node across
    * every batch partition — (id, component).
    */
  def componentsFromTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
      .groupBy(col("id"))
      .agg(max_by(col("component"), col("_seq")).as("component"))

  /** Fold batch partitions `0..upToBatchId` into one consolidated
    * partition, keeping each id's newest row — `_seq` lives in the row,
    * so latest-wins survives the `_batch_id` normalization. Crash
    * leftovers duplicate identical rows only (same id, same `_seq` ⇒
    * same component), which the max_by collapse absorbs.
    */
  def compactComponents(spark: SparkSession, table: String,
                        upToBatchId: Long): (Int, Int) =
    BatchTables.compactBatchPartitions(spark, table, upToBatchId,
      df => df.groupBy(col("id"), col("_batch_id"))
        .agg(max(col("_seq")).as("_seq"),
          max_by(col("component"), col("_seq")).as("component"))
        .select(col("id"), col("component"), col("_seq"), col("_batch_id")))

  /** k-core decomposition by iterative peeling (Seidman 1983; the
    * Batagelj–Zaveršnik cascade, synchronous form): repeatedly drop
    * every node whose degree among SURVIVORS is < k until a fixpoint —
    * what remains is the k-core, the maximal subgraph of minimum degree
    * ≥ k. The cohesion member of the graph family beside connectivity
    * ([[connectedComponents]]), centrality (`PageRank`) and clustering
    * (`Communities`): cores separate the structurally-embedded region
    * of a link/interaction graph from the peripheral one (spam rings
    * and boilerplate mirrors concentrate in shallow cores).
    *
    * Caller symmetrizes for undirected semantics (the `q16_pagerank`
    * idiom); edges de-duplicate first, so degree = distinct surviving
    * neighbors. Deterministic integers end to end — the synchronous
    * rounds unroll into SQL, and TRAILING rounds past the fixpoint are
    * no-ops, so an oracle unrolling R ≥ rounds-to-fixpoint replays the
    * exact result (`q34_kcore` unrolls 10; the gate graphs converge in
    * 3/6 at sf0.01/sf0.1).
    *
    * Shape per round: one semi-join of the edge frame against the
    * survivor set on EACH endpoint + one map-side-combined degree count
    * — all shuffles on node ids; the edge frame materializes once and
    * each round's survivor frame is localCheckpoint-truncated with one
    * 1-row count action as the convergence check (the iterative-loop
    * contract). Rounds are data-dependent but each non-final round
    * removes ≥ 1 node, and real cascades are shallow (single digits on
    * the gate graphs).
    *
    * Output: (node BIGINT, core_degree BIGINT) for the k-core members —
    * core_degree is the degree WITHIN the core (≥ k by construction).
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val srcNodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    // the peel reads degrees from src endpoints only — correct ONLY for
    // symmetrized input. A directed edge list used to be accepted
    // silently (dst-only nodes dropped, degrees undercounted → a wrong
    // core with no error — ADVICE r12); fail loudly instead. The check
    // (every dst appears as some src) is necessary for symmetry, cheap
    // (one anti-join over the already-checkpointed frames), and catches
    // the realistic mistake of passing one direction of an edge list.
    val stray = e.select(col("dst").as("node"))
      .join(srcNodes, Seq("node"), "left_anti")
      .limit(1).count()
    require(stray == 0L,
      "kCore requires a SYMMETRIZED edge list (every edge present in " +
        "both directions): found dst nodes that never appear as src — " +
        "union the reversed edges before calling (see q34_kcore)")
    // round-16: DELTA peeling — the old loop recounted degrees from the
    // FULL edge frame every round (two E-sized semi-joins + an E-row
    // groupBy per peel, even when one node fell). Degrees among the next
    // survivor set equal the current degrees minus each survivor's edges
    // to the JUST-REMOVED nodes (e is distinct and symmetrized), so each
    // round now joins only the removed nodes' out-edges and decrements —
    // work proportional to the peel, not the graph. The maintained deg
    // frame IS degreesAmong(survivors) by induction (base: survivors =
    // all src nodes, semi-joins are no-ops), so the returned fixpoint
    // frame is identical to the old final recompute.
    // the "how many fall next" statistic rides each checkpoint job
    // (IterUtil) — one job per peel round, not two
    val remMetric = coalesce(sum(when(col("core_degree") < k, 1L)
      .otherwise(0L)), lit(0L)).as("nrem")
    var (deg, obs0) = IterUtil.checkpointObserved(
      e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("core_degree")),
      Seq(remMetric))
    var nRemoved = obs0("nrem").asInstanceOf[Long]
    while (nRemoved > 0) {
      val removed = deg.filter(col("core_degree") < k)
      val dec = e
        .join(removed.select(col("node").as("src")), Seq("src"), "left_semi")
        .groupBy(col("dst").as("node")).agg(count(lit(1)).as("_dec"))
      val (degNext, obsN) = IterUtil.checkpointObserved(
        deg.filter(col("core_degree") >= k)
          .join(dec, Seq("node"), "left")
          .select(col("node"),
            (col("core_degree") - coalesce(col("_dec"), lit(0L)))
              .as("core_degree")),
        Seq(remMetric))
      deg = degNext
      nRemoved = obsN("nrem").asInstanceOf[Long]
    }
    deg
  }

  /** Multi-source BFS hop distance — the link-graph quality feature
    * beside personalized PageRank (`PageRank.pageRankPersonalized`):
    * `hops(v)` = the minimum number of edges from ANY seed to `v`,
    * following edges src→dst (pass a symmetrized list for undirected
    * semantics, the q34_kcore idiom). Output `(node BIGINT, hops
    * BIGINT)` for every REACHED node — seeds at 0 (kept even when they
    * never appear in the edge list: the seed set is given independently
    * of the graph); unreachable nodes are simply absent, so the caller's
    * left join reads them as NULL (the documented unreachable = NULL
    * contract, spec-pinned).
    *
    * Shape per synchronous frontier round: one semi-join of the edge
    * frame against the frontier on src + a distinct + one anti-join
    * against the visited set — all shuffles on node ids, the edge frame
    * materialized once, each round's frames localCheckpoint-truncated
    * with one 1-row count action as the convergence check (the
    * iterative-loop contract shared with `kCore` and label propagation).
    * Rounds are integer-exact (hop literals), so the unrolled-SQL oracle
    * replays bit-for-bit with no rounding anywhere; frontier rounds are
    * bounded by the graph's eccentricity from the seed set (measured 9
    * on the q37 tripartite gate graph at sf0.01 AND sf0.1).
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: DataFrame, seedCol: String,
              maxHops: Int = Int.MaxValue): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    // round-15: the visited set is kept as per-hop LAYERS (each
    // checkpointed once when its round produces it) instead of one frame
    // re-unioned and re-materialized every round — the old shape rewrote
    // the ENTIRE visited set per hop just to add a layer (guide §1.2:
    // don't compute things you throw away)
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    locally {
      // seed/frontier counts ride their checkpoint jobs (IterUtil) —
      // one job per hop, not two
      val (seedLayer, n0) = IterUtil.checkpointCounted(seeds
        .select(col(seedCol).cast("long").as("node"))
        .filter(col("node").isNotNull)
        .distinct()
        .withColumn("hops", lit(0L)))
      var layers = Vector(seedLayer)
      // the visited-set UNION is tracked separately from the output
      // layers so it can be collapsed: maxHops is unbounded by default,
      // and a deep-diameter graph would otherwise grow the anti-join
      // plan linearly with hop count (ADVICE r15). Collapsing merges
      // only the node-id sets — the per-hop output layers (which carry
      // the hops labels) are never merged.
      var visited = Vector(seedLayer.select("node"))
      var frontier = seedLayer.select("node")
      var hop = 0L
      var n = n0
      while (n > 0 && hop < maxHops) {
        hop += 1
        val visitedIds = visited.reduce(_ union _)
        val (next, nNext) = IterUtil.checkpointCounted(e
          .join(frontier.withColumnRenamed("node", "src"), Seq("src"),
            "left_semi")
          .select(col("dst").as("node")).distinct()
          .join(visitedIds, Seq("node"), "left_anti"))
        n = nNext
        if (n > 0) {
          layers :+= next.withColumn("hops", lit(hop))
          visited :+= next
          if (visited.size > 12)
            visited = Vector(visited.reduce(_ union _).localCheckpoint(true))
          frontier = next
        }
      }
      layers.reduce(_ union _)
    }
  }

  /** Single/multi-source WEIGHTED shortest paths (Bellman-Ford with a
    * delta frontier) — the weighted sibling of [[bfsHops]]: hop counts
    * answer "how far", weighted distance answers "how cheap" (link-graph
    * trust propagation, org-distance with per-edge costs, routing-shaped
    * enrichments). Reference ships the unweighted 1-hop special case as
    * its org-distance enrichment; this is the general operator.
    *
    * Algorithm: synchronous relaxation rounds, but each round relaxes
    * ONLY edges out of the delta frontier (nodes whose distance improved
    * last round) — the standard frontier form. Settled regions stop
    * costing anything: at 100 TB the late rounds touch a vanishing slice
    * of the graph instead of rescanning every edge (textbook
    * Bellman-Ford is O(V·E); this is O(Σ round frontiers)). Each round
    * is one equi-join (edges ⋈ frontier on src) + groupBy-min + one
    * left-join filter against the running dist frame + a union-min
    * merge — all shuffles keyed on node ids, frames
    * localCheckpoint-truncated, ONE 1-row count action as the
    * convergence witness (the iterative-loop contract shared with
    * [[bfsHops]], `kCore` and label propagation).
    *
    * Exactness: distances are LONG sums of long weights — integer
    * arithmetic commutes, so the result is bit-identical under any
    * partition layout and an unrolled-SQL oracle replays it exactly
    * (the [[PageRank]] fixed-point discipline). Negative weights are
    * rejected per-row via a codegen guard (a silent filter would turn a
    * modelling bug into wrong shortest paths); NULL endpoints/weights
    * drop like [[bfsHops]] nulls. Parallel edges collapse to their
    * cheapest weight up front. Unreachable nodes are absent (the
    * caller's left join reads NULL — the shared contract). Rounds are
    * bounded by the max edge-count of any shortest path (≤ 13/15 on the
    * q39 gate graph at sf0.01/sf0.1, DuckDB-probed before the gate was
    * declared); `maxRounds` bounds adversarial chains.
    */
  def sssp(edges: DataFrame, srcCol: String, dstCol: String,
           weightCol: String, seeds: DataFrame, seedCol: String,
           maxRounds: Int = 64): DataFrame = {
    val start = seeds
      .select(col(seedCol).cast("long").as("node"))
      .filter(col("node").isNotNull)
      .distinct()
      .withColumn("dist", lit(0L))
    relaxToFixpoint(weightedEdges(edges, srcCol, dstCol, weightCol),
      start, maxRounds)
  }

  /** WARM-START weighted shortest paths — resume relaxation from a
    * PERSISTED distance table after the graph GREW (the incremental
    * sibling in the `pageRankResume`/`labelPropagationResume` family):
    * edge additions only ever SHORTEN distances, and shortest distances
    * are the unique fixpoint of relaxation from any valid upper bound,
    * so `ssspResume(G', sssp(G, seeds))` equals `sssp(G', seeds)`
    * BIT-EXACTLY for any G' ⊇ G (integer arithmetic + unique fixpoint —
    * ComponentsSpec pins it, and the q39_sssp_incr gate replays the
    * one-shot oracle verbatim). The first resume round relaxes every
    * edge out of every previously-reached node ONCE (that is what makes
    * brand-new edges out of settled nodes visible); the regions the new
    * edges cannot improve produce no second-round frontier — the resume
    * cost is proportional to the impact of the change, not the graph.
    *
    * `prior` rows are (node, dist) upper bounds; duplicates collapse to
    * their min. Distances never printed by a prior run (unreached
    * nodes) are simply absent from `prior` — they are discovered by
    * relaxation like any frontier expansion.
    */
  def ssspResume(edges: DataFrame, srcCol: String, dstCol: String,
                 weightCol: String, prior: DataFrame,
                 maxRounds: Int = 64): DataFrame = {
    val start = prior
      .select(col("node").cast("long").as("node"),
        col("dist").cast("long").as("dist"))
      .filter(col("node").isNotNull && col("dist").isNotNull)
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))
    relaxToFixpoint(weightedEdges(edges, srcCol, dstCol, weightCol),
      start, maxRounds)
  }

  /** The (src, dst, w) frame every SSSP variant relaxes over: longs,
    * null-dropped, negative weights rejected loudly, parallel edges
    * collapsed to min weight, materialized once.
    */
  private def weightedEdges(edges: DataFrame, srcCol: String,
                            dstCol: String, weightCol: String): DataFrame = {
    val w0 = col(weightCol).cast("long")
    edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        when(w0 < 0L, raise_error(concat(
          lit("sssp: negative edge weight "), w0.cast("string"),
          lit(s" in column $weightCol — Bellman-Ford here requires " +
            "non-negative weights")))).otherwise(w0).as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("w").isNotNull && col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .localCheckpoint(true)
  }

  /** Delta-frontier Bellman-Ford from `start` (node, dist) upper
    * bounds: every start node is frontier in round 1, after that only
    * improved nodes relax — one join + groupBy-min + an improvement
    * filter per round, one 1-row action as the convergence witness.
    *
    * Round-16: the distance state is kept as LAYERS of improvements
    * (each round checkpoints only its improved rows — frontier-sized)
    * instead of union+groupBy-rewriting and re-materializing the FULL
    * dist frame every round — the discipline bfsHops/harmonic/brandes
    * got in round 15, applied to the last full-state rewriter. The
    * per-round improvement filter reads the running best as a LAZY
    * union-min over the checkpointed layers (the same per-node minima
    * the materialized frame held, so every round's frontier, the round
    * count and the fixpoint are unchanged — labels only decrease, and a
    * node's current dist is the min over the layers that ever improved
    * it). Layers collapse into one checkpointed frame every
    * `collapseEvery` rounds so plan width stays bounded on deep graphs
    * (the ADVICE-r15 layer-growth concern); the final union-min fold
    * runs once at exhaustion.
    */
  private def relaxToFixpoint(e: DataFrame, start: DataFrame,
                              maxRounds: Int): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val collapseEvery = 12
    def fold(layers: Seq[DataFrame]): DataFrame =
      layers.reduce(_ union _)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
    locally {
      // the start count and every round's improvement count ride their
      // frame's checkpoint job (IterUtil — one job per round, not two)
      var (head0, improved) = IterUtil.checkpointCounted(start)
      var layers = Vector(head0)
      var frontier = layers.head
      var round = 0
      while (improved > 0 && round < maxRounds) {
        round += 1
        val best = if (layers.size == 1) layers.head else fold(layers)
        val (next, nImp) = IterUtil.checkpointCounted(e
          .join(frontier.select(col("node").as("src"), col("dist").as("fd")),
            Seq("src"))
          .select(col("dst").as("node"), (col("fd") + col("w")).as("nd"))
          .groupBy(col("node")).agg(min(col("nd")).as("nd"))
          .join(best, Seq("node"), "left")
          .filter(col("dist").isNull || col("nd") < col("dist"))
          .select(col("node"), col("nd").as("dist")))
        improved = nImp
        if (improved > 0) {
          layers :+= next
          frontier = next
          if (layers.size > collapseEvery)
            layers = Vector(fold(layers).localCheckpoint(true))
        }
      }
      if (layers.size == 1) layers.head else fold(layers)
    }
  }

  /** Sampled harmonic centrality (Boldi & Vigna 2014's axiom-clean
    * centrality; Eppstein & Wang 2004 make the sampled-source estimator
    * standard): for a seed-set sample S, every node scores
    * Σ_{s ∈ S, d(s,n) ≥ 1} 1/d(s,n) — the "how close is this node to
    * the sample" link-quality feature beside PageRank's random surfer
    * and bfsHops' nearest-seed distance. Unreachable (source, node)
    * pairs contribute exactly 0 (harmonic's selling point over
    * closeness — no infinity bookkeeping), nodes reached by NO source
    * are absent (the shared contract).
    *
    * Exactness: 1/d is not an exact double, so instead of float sums the
    * score is returned as an exact INTEGER numerator `h_num = Σ L/d`
    * over the common denominator L = lcm(1 .. maxRounds) — every term
    * divides exactly, integer sums commute, so the result is
    * bit-identical under any layout and an unrolled-SQL oracle replays
    * it with `//` arithmetic (the PageRank fixed-point discipline). The
    * rounded convenience double `h = round(h_num / L, 6)` is derived
    * FROM the exact numerator, one deterministic IEEE division in both
    * engines. `reach` is the exact count of sources that reach the node.
    *
    * Shape: one BFS whose frontier is keyed (source, node) — per round
    * one equi-join on the node id + distinct + anti-join against the
    * visited pairs, all localCheckpoint-truncated with the shared 1-row
    * convergence action. State is |S| × reach pairs — the sampled
    * estimator's whole point at 100 TB: |S| stays fixed as V grows, and
    * the estimate concentrates (Eppstein-Wang give the Hoeffding bound).
    * Edges follow src→dst; pass a symmetrized list for undirected
    * semantics (the kCore/bfsHops contract).
    */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
                         seeds: DataFrame, seedCol: String,
                         maxRounds: Int = 12): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 40,
      s"maxRounds must be in [1, 40], got $maxRounds " +
        "(lcm(1..41) overflows the exact LONG numerator headroom)")
    val denom = (1L to maxRounds.toLong).foldLeft(1L) { (l, d) =>
      val g = java.math.BigInteger.valueOf(l)
        .gcd(java.math.BigInteger.valueOf(d)).longValueExact()
      l / g * d
    }
    // round-15: visited kept as per-round LAYERS (the bfsHops discipline —
    // no full-set re-union + re-materialization per round)
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    locally {
      // seed/frontier counts ride their checkpoint jobs (IterUtil)
      val (seedLayer, nSeeds) = IterUtil.checkpointCounted(seeds
        .select(col(seedCol).cast("long").as("source"))
        .filter(col("source").isNotNull)
        .distinct()
        .select(col("source"), col("source").as("node"))
        .withColumn("d", lit(0L)))
      // exact-numerator overflow guard: worst case every source at d=1
      require(nSeeds <= Long.MaxValue / math.max(denom, 1L) / 2,
        s"$nSeeds seeds at lcm denominator $denom could overflow h_num — " +
          "sample the seed set (the estimator wants a sample anyway)")
      var layers = Vector(seedLayer)
      var frontier = seedLayer.select("source", "node")
      var rnd = 0
      var n = nSeeds
      while (n > 0 && rnd < maxRounds) {
        rnd += 1
        val visitedPairs = layers.map(_.select("source", "node"))
          .reduce(_ union _)
        val (next, nNext) = IterUtil.checkpointCounted(e
          .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("source"), col("dst").as("node")).distinct()
          .join(visitedPairs, Seq("source", "node"), "left_anti"))
        n = nNext
        if (n > 0) {
          layers :+= next.withColumn("d", lit(rnd.toLong))
          frontier = next
        }
      }
      layers.reduce(_ union _).filter(col("d") >= 1L)
        .groupBy(col("node"))
        .agg(count(lit(1)).as("reach"),
          // `div` keeps every term an exact LONG (d divides the lcm), so
          // the sum is integer arithmetic end to end — no double crossing
          sum(expr(s"${denom}L div d")).as("h_num"))
        .select(col("node"), col("reach"), col("h_num"),
          round(col("h_num").cast("double") / lit(denom.toDouble), 6).as("h"))
    }
  }

  /** Brandes forward phase from a sampled source set: per (source, node)
    * the shortest-path distance `d` AND the EXACT shortest-path count
    * `sigma` (σ, DECIMAL(38,0) — path counts multiply along layers and
    * can pass a LONG on hub-dense graphs). This is the integer half of
    * sampled betweenness centrality (Brandes 2001; Brandes & Pich 2007
    * make the sampled-source estimator standard) and the version-proof
    * GATE surface: distances and σ-counts are exact integers, so an
    * unrolled-SQL oracle replays them bit-for-bit with no float
    * anywhere (the q45 register-signature discipline).
    *
    * Shape: the [[harmonicCentrality]] (source, node)-keyed BFS with one
    * extra groupBy-sum per round — σ(w) at level l+1 is the sum of σ(v)
    * over DAG predecessors v at level l, so each round is one equi-join
    * on the node id + groupBy (source, dst) sum + one anti-join against
    * the visited pairs, all localCheckpoint-truncated with the shared
    * 1-row convergence action. State is |S| × reach pairs: |S| stays
    * fixed as V grows — the sampled estimator's 100 TB point. Edges
    * follow src→dst; pass a symmetrized list for undirected semantics
    * (the kCore/bfsHops contract). Self rows (d = 0, σ = 1) included.
    */
  def brandesForward(edges: DataFrame, srcCol: String, dstCol: String,
                     seeds: DataFrame, seedCol: String,
                     maxRounds: Int = 12): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    // round-15: visited kept as per-round LAYERS (the bfsHops
    // discipline); the σ aggregation moved BEFORE the anti-join so the
    // exchange carries map-side-combined (source, node, Σσ) rows instead
    // of one row per DAG edge — dropping visited pairs before or after
    // summing σ is equivalent (the anti-join removes whole (source, node)
    // groups, never partial contributions)
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    locally {
      // seed/frontier counts ride their checkpoint jobs (IterUtil)
      val (seedLayer, nSeeds) = IterUtil.checkpointCounted(seeds
        .select(col(seedCol).cast("long").as("source"))
        .filter(col("source").isNotNull)
        .distinct()
        .select(col("source"), col("source").as("node"),
          lit(0L).as("d"), lit(1L).cast("decimal(38,0)").as("sigma")))
      var layers = Vector(seedLayer)
      var frontier = seedLayer
      var rnd = 0
      var n = nSeeds
      while (n > 0 && rnd < maxRounds) {
        rnd += 1
        val visitedPairs = layers.map(_.select("source", "node"))
          .reduce(_ union _)
        val (next, nNext) = IterUtil.checkpointCounted(e
          .join(frontier.withColumnRenamed("node", "src"),
            Seq("src"))
          .select(col("source"), col("dst").as("node"), col("sigma"))
          .groupBy(col("source"), col("node"))
          // exact integer σ sums commute — layout-invariant by construction
          .agg(sum(col("sigma")).cast("decimal(38,0)").as("sigma"))
          .join(visitedPairs, Seq("source", "node"), "left_anti")
          .select(col("source"), col("node"), lit(rnd.toLong).as("d"),
            col("sigma")))
        n = nNext
        if (n > 0) {
          layers :+= next
          frontier = next
        }
      }
      // the DuckDB oracle error()-asserts frontier exhaustion; mirror it —
      // a capped BFS would silently drop every node past maxRounds from the
      // sigma/reach aggregates
      require(n == 0,
        s"brandesForward: frontier still live ($n rows) after $maxRounds " +
          "rounds (raise maxRounds)")
      layers.reduce(_ unionByName _)
    }
  }

  /** Sampled betweenness centrality (Brandes 2001, sampled sources per
    * Brandes & Pich 2007): bc(v) = Σ_{s ∈ S} δ_s(v) with the dependency
    * accumulation δ_s(v) = Σ_{w : (v,w) ∈ E, d(w) = d(v)+1}
    * (σ(v)/σ(w)) · (1 + δ_s(w)) — the standard reverse-level pass over
    * the shortest-path DAG of [[brandesForward]]. The one standard
    * web-graph centrality the PageRank/HITS/harmonic/HyperBall family
    * lacked: "how much shortest-path traffic transits this node".
    *
    * Determinism: δ is inherently rational (σ ratios), so floats are
    * unavoidable — but every sum runs as a FIXED-ORDER sequential fold
    * (sort_array over collect_list + `aggregate`, the RankEval
    * discipline): per (source, v) the ≤ out-degree successor
    * contributions fold in ascending-w order, and the final cross-source
    * sum folds in ascending-source order. The result is bit-identical
    * under any partition layout (spec-pinned at 1 vs 7 partitions
    * against the scalar Brandes model). It is NOT oracle-gated — the
    * round-13 q45 red proved per-row float rounding at V-node scale is
    * version-fragile, so the hash gate (q46) pins the exact integer
    * forward surface and this readout is spec-certified instead (the
    * HyperBall N(t) treatment).
    *
    * Scale: the backward pass is ≤ diameter rounds of (edges ⋈ next
    * level) joins; per-(source,v) folds touch at most the out-degree —
    * at extreme hub degrees swap the fold for a plain sum and accept
    * layout noise, documented trade. Output: (node, reach, bc) for
    * every node some source reaches at d ≥ 1; bc round-6.
    */
  def betweenness(edges: DataFrame, srcCol: String, dstCol: String,
                  seeds: DataFrame, seedCol: String,
                  maxRounds: Int = 12): DataFrame = {
    val fwd = brandesForward(edges, srcCol, dstCol, seeds, seedCol,
      maxRounds).localCheckpoint(true)
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    def foldBy(terms: org.apache.spark.sql.Column, field: String) =
      aggregate(sort_array(terms), lit(0.0),
        (acc, x) => acc + x.getField(field))
    val maxD = fwd.agg(max(col("d"))).head().getLong(0)
    var deltas = fwd.filter(col("d") === maxD)
      .select(col("source"), col("node"), lit(0.0).as("delta"))
      .localCheckpoint(true)
    var acc = if (maxD >= 1L) Seq(deltas) else Seq.empty[DataFrame]
    var l = maxD - 1
    while (l >= 1) {
      val nextLvl = fwd.filter(col("d") === l + 1)
        .join(deltas, Seq("source", "node"))
        .select(col("source"), col("node").as("dst"),
          col("sigma").as("sw"), col("delta").as("dw"))
      val contribs = e.join(nextLvl, Seq("dst"))
        .select(col("source"), col("src").as("node"), col("dst").as("w"),
          col("sw"), col("dw"))
        .join(fwd.filter(col("d") === l)
          .select(col("source"), col("node"), col("sigma").as("sv")),
          Seq("source", "node"))
        .select(col("source"), col("node"), col("w"),
          (col("sv").cast("double") / col("sw").cast("double") *
            (lit(1.0) + col("dw"))).as("c"))
      val lvlDelta = contribs.groupBy(col("source"), col("node"))
        .agg(foldBy(collect_list(struct(col("w"), col("c"))), "c")
          .as("delta"))
      // DAG leaves at this level (no successors) carry delta = 0
      deltas = fwd.filter(col("d") === l).select("source", "node")
        .join(lvlDelta, Seq("source", "node"), "left")
        .select(col("source"), col("node"),
          coalesce(col("delta"), lit(0.0)).as("delta"))
        .localCheckpoint(true)
      acc = acc :+ deltas
      l -= 1
    }
    val all = acc.reduceOption(_ unionByName _)
      .getOrElse(deltas.limit(0))
    all.filter(col("node") =!= col("source"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("reach"),
        foldBy(collect_list(struct(col("source"), col("delta"))), "delta")
          .as("_bc"))
      .select(col("node"), col("reach"), round(col("_bc"), 6).as("bc"))
  }

  /** Directed STRONGLY connected components — (node, scc) with `scc` the
    * minimum node id of the component. [[connectedComponents]] answers
    * the undirected question; link-graph analyses (spam farms, crawl
    * traps, the web's bow-tie) need mutual reachability.
    *
    * Algorithm — trim + forward/backward min-label coloring (the
    * Slota/Hong FB-trim family, the standard label-propagation SCC):
    *  1. TRIM to a fixpoint: a node with no in-edge or no out-edge
    *     inside the remaining graph is its own SCC (the kCore peel
    *     shape) — this resolves every DAG appendage in rounds bounded by
    *     the longest dangling chain.
    *  2. PHASE: over the remaining graph, `f(v)` = min label that
    *     REACHES v (forward min-propagation to a fixpoint) and `b(v)` =
    *     min label v REACHES (backward). `f(v) = b(v) = m` proves
    *     m→v→m, so v ∈ SCC(m) — those nodes are decided and removed;
    *     every phase decides at least the SCC of each remaining
    *     source-region minimum, so the phase count is bounded by the
    *     condensation's chain depth (4 on the q47 gate graph, probed).
    *  3. repeat trim+phase until nothing remains.
    *
    * Exactness: labels are LONG mins — integer lattice moves only, so
    * every fixpoint is layout-invariant and the whole output replays in
    * unrolled SQL with no float anywhere (the q46/q45 gate discipline).
    * Convergence witnesses are 1-row (count, sum) actions on frames that
    * only shrink/decrease (the q39 discipline). At 100 TB: each round is
    * one equi-join + groupBy-min on node ids; trim kills the DAG mass
    * early so phases run on the cyclic core only; state is one (node,
    * label) row per live node.
    */
  def stronglyConnectedComponents(edges: DataFrame, srcCol: String,
                                  dstCol: String, maxPhases: Int = 64,
                                  maxRounds: Int = 64): DataFrame = {
    require(maxPhases >= 1, s"maxPhases must be >= 1, got $maxPhases")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    locally {
      // every remaining/keep count rides its checkpoint job (IterUtil)
      var (remaining, nRemaining) = IterUtil.checkpointCounted(
        e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct())
      var assigned = Seq.empty[DataFrame]

      // trim fixpoint: peel no-in/no-out nodes (each its own SCC)
      def trim(): Unit = {
        var changed = true
        while (changed && nRemaining > 0) {
          val er = e
            .join(remaining.withColumnRenamed("node", "src"), Seq("src"),
              "left_semi")
            .join(remaining.withColumnRenamed("node", "dst"), Seq("dst"),
              "left_semi")
          val (keep, kc) = IterUtil.checkpointCounted(remaining
            .join(er.select(col("src").as("node")).distinct(), Seq("node"),
              "left_semi")
            .join(er.select(col("dst").as("node")).distinct(), Seq("node"),
              "left_semi"))
          if (kc == nRemaining) changed = false
          else {
            assigned :+= remaining.join(keep, Seq("node"), "left_anti")
              .select(col("node"), col("node").as("scc"))
              .localCheckpoint(true)
            remaining = keep
            nRemaining = kc
          }
        }
      }

      // min-label propagation to a fixpoint over the restricted edge
      // frame. Round-16: FRONTIER-DELTA form — only labels that CHANGED
      // last round flow along edges (an unchanged neighbor's label was
      // already applied in the round after it was attained, and labels
      // only decrease, so re-sending it is a no-op under min). Delta-
      // synchronous rounds produce the SAME label frame per round as the
      // old full-synchronous union+groupBy (standard monotone-fixpoint
      // induction: the running best per node = min over the delta layers
      // that ever improved it), so the round count and the fixpoint are
      // identical; the convergence witness simplifies to "no improvement
      // rows" — the old 1-row Σ(lab) scan per round is no longer needed.
      // Per round the join and the checkpoint are DELTA-sized, not
      // V-sized (the relaxToFixpoint discipline).
      def minLabels(er: DataFrame, reverse: Boolean): DataFrame = {
        val (from, to) = if (reverse) ("dst", "src") else ("src", "dst")
        val collapseEvery = 12
        def fold(layers: Seq[DataFrame]): DataFrame =
          layers.reduce(_ union _)
            .groupBy(col("node")).agg(min(col("lab")).as("lab"))
        // layer 0 is a trivial projection of the ALREADY-CHECKPOINTED
        // remaining frame — no extra materialization job needed
        var layers = Vector(remaining
          .select(col("node"), col("node").as("lab")))
        var delta = layers.head
        var rnd = 0
        var converged = false
        while (!converged && rnd < maxRounds) {
          rnd += 1
          val best = if (layers.size == 1) layers.head else fold(layers)
          val (next, improved) = IterUtil.checkpointCounted(er
            .join(delta.withColumnRenamed("node", from), Seq(from))
            .select(col(to).as("node"), col("lab"))
            .groupBy(col("node")).agg(min(col("lab")).as("lab"))
            .join(best.withColumnRenamed("lab", "cur"), Seq("node"))
            .filter(col("lab") < col("cur"))
            .select(col("node"), col("lab")))
          converged = improved == 0L
          if (!converged) {
            layers :+= next
            delta = next
            if (layers.size > collapseEvery)
              layers = Vector(fold(layers).localCheckpoint(true))
          }
        }
        // a capped, non-stationary fixpoint would silently mislabel deep
        // cycles (partial f/b mins decide only the min node, trim then
        // shatters the rest into bogus singleton SCCs) — fail loudly like
        // the phase loop's require instead
        require(converged,
          s"SCC min-label propagation did not reach a fixpoint within " +
            s"$maxRounds rounds (raise maxRounds)")
        if (layers.size == 1) layers.head else fold(layers)
      }

      var phase = 0
      trim()
      while (nRemaining > 0 && phase < maxPhases) {
        phase += 1
        val er = e
          .join(remaining.withColumnRenamed("node", "src"), Seq("src"),
            "left_semi")
          .join(remaining.withColumnRenamed("node", "dst"), Seq("dst"),
            "left_semi")
          .localCheckpoint(true)
        // round-16 (guide §2.6 — overlap independent jobs): the forward
        // and backward fixpoints read the same immutable er/remaining
        // frames and share nothing else — run them on two driver threads
        // so each fixpoint's small driver-synchronized rounds back-fill
        // the other's idle cores; results are unchanged (each fixpoint is
        // a deterministic function of er alone)
        val ec = scala.concurrent.ExecutionContext.global
        val fF = scala.concurrent.Future(minLabels(er, reverse = false))(ec)
        val fB = scala.concurrent.Future(minLabels(er, reverse = true))(ec)
        val f = scala.concurrent.Await.result(fF,
          scala.concurrent.duration.Duration.Inf)
        val b = scala.concurrent.Await.result(fB,
          scala.concurrent.duration.Duration.Inf)
        val dec = f.join(b.withColumnRenamed("lab", "blab"), Seq("node"))
          .filter(col("lab") === col("blab"))
          .select(col("node"), col("lab").as("scc"))
          .localCheckpoint(true)
        assigned :+= dec
        val (rem2, nRem2) = IterUtil.checkpointCounted(
          remaining.join(dec, Seq("node"), "left_anti"))
        remaining = rem2
        nRemaining = nRem2
        trim()
      }
      require(nRemaining == 0,
        s"SCC did not converge within $maxPhases phases — $nRemaining " +
          "nodes undecided (raise maxPhases)")
      assigned.reduce(_ unionByName _)
    }
  }
}
