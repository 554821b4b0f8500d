package graft.ops

import graft.ops.Materialize.EagerOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over derived pair graphs (near-dup candidates, citation
  * or link tables) — the iterative-dataflow family beyond connected
  * components: power iteration expressed as join + aggregate per step,
  * exactly the GraphX/Pregel contribution-passing shape but in plain
  * DataFrame operators the optimizer can see through.
  */
object Graph {

  /** PageRank damping factor (the classic 0.85). */
  val Damping = 0.85

  /** Power-iteration count — like nearDupComponents' bounded label
    * propagation, a FIXED unrollable depth so the oracle can replay it.
    */
  val PrIters = 3

  /** PageRank over an undirected pair graph (columns doc_a, doc_b):
    * symmetrize to a directed edge list, then `iters` rounds of
    *   rank'(v) = (1−d)/N + d · Σ_{u→v} rank(u)/deg(u).
    *
    * Within the near-dup use: rank concentrates on documents entangled
    * with MANY near-duplicates (template hubs) — a cluster-centrality
    * signal component-size counts cannot see (a chain and a star of equal
    * size get identical component stats but very different hub ranks).
    *
    * Determinism: per-edge contributions divide two per-node values
    * (bit-identical in both engines); each iteration's rank is rounded to
    * 6dp so cross-engine aggregation-order ulps cannot compound across
    * iterations (same convention as psiDrift's ln-term sum).
    *
    * Scale: every step is one equi-join of the edge list against the
    * rank table plus one hash agg — shuffles the PAIR GRAPH only, never a
    * corpus (the same invariant as nearDupComponents); the driver sees a
    * single scalar (N) for the teleport term.
    */
  def pageRank(
      pairs: DataFrame,
      iters: Int = PrIters,
      damping: Double = Damping): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    val nodeDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
      .persist()
    val n = nodeDeg.count()
    require(n > 0, "pageRank: empty pair graph — nothing to rank")
    var ranks = nodeDeg.select(col("node"), (lit(1.0) / lit(n.toDouble)).as("rank"))
    for (_ <- 0 until iters) {
      val contrib = edges
        .join(ranks.join(nodeDeg, Seq("node")).withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg").cast("double")).as("in_sum"))
      ranks = nodeDeg.select(col("node"))
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) / lit(n.toDouble) +
            lit(damping) * coalesce(col("in_sum"), lit(0.0)), 6).as("rank"))
    }
    nodeDeg.join(ranks, Seq("node"))
      .select(col("node"), col("deg"), col("rank"))
  }

  /** Weighted PageRank over an undirected weighted pair graph
    * (doc_a, doc_b, weight): contributions split proportionally to edge
    * weight — rank'(v) = (1−d)/N + d·Σ rank(u)·w(u,v)/W(u), with W(u)
    * the node's total incident weight. On the near-dup graph this makes
    * hub rank follow similarity MASS: a template hub whose edges are all
    * borderline collisions ranks below a smaller but tightly-duplicated
    * center. Weights are quantized to integer micro-units (exact sums
    * for W(u)); each per-edge term divides two engine-identical values
    * and every iteration rounds to 6dp (the pageRank convention), so the
    * replay is exact.
    *
    * Scale: identical plan shape to pageRank — one edge ⋈ rank equi-join
    * plus one hash agg per iteration, all keyed on the pair graph.
    */
  def pageRankWeighted(
      pairs: DataFrame,
      iters: Int = PrIters,
      damping: Double = Damping): DataFrame = {
    val wfp = round(col("weight") * lit(1e6), 0).cast("long")
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"), wfp.as("w"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"), wfp.as("w")))
      .persist()
    val nodeW = edges.groupBy(col("src")).agg(sum(col("w")).as("tw"))
      .select(col("src").as("node"), col("tw"))
      .persist()
    val n = nodeW.count()
    require(n > 0, "pageRankWeighted: empty pair graph — nothing to rank")
    var ranks = nodeW.select(col("node"), (lit(1.0) / lit(n.toDouble)).as("rank"))
    for (_ <- 0 until iters) {
      val contrib = edges
        .join(ranks.join(nodeW, Seq("node")).withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") * col("w").cast("double") / col("tw").cast("double"))
          .as("in_sum"))
      ranks = nodeW.select(col("node"))
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) / lit(n.toDouble) +
            lit(damping) * coalesce(col("in_sum"), lit(0.0)), 6).as("rank"))
    }
    nodeW.join(ranks, Seq("node"))
      .select(col("node"), col("tw").as("weight_fp"), col("rank"))
  }

  /** Per-node triangle count + local clustering coefficient over an
    * undirected pair graph (doc_a, doc_b; doc_a < doc_b canonical).
    *
    * Enumeration is DEGREE-ORIENTED: each edge is directed from its
    * lower-(deg, id) endpoint, wedges pivot on shared out-neighbors, and a
    * wedge closes iff its two tips are a canonical edge. Orientation bounds
    * every pivot's out-degree by O(√m), so the wedge join materializes
    * O(m^1.5) rows worst-case — on the star-heavy graphs near-dup corpora
    * produce (template hubs), the naive id-ordered wedge join is quadratic
    * at the hub while this stays flat. The triangle SET is
    * orientation-independent, so the DuckDB oracle replays the simple
    * a<b<c three-way join and the results still hash-match.
    *
    * In the near-dup use: a node with high degree but LOW coefficient is a
    * template hub bridging otherwise-unrelated documents (its neighbors
    * don't resemble each other) — a different artifact than a tight
    * duplicate clique (coefficient ≈ 1), and the signal that decides
    * between "drop the hub" and "drop the cluster" policies.
    *
    * Scale: three equi-joins + two hash aggs, all keyed on nodes/edges of
    * the PAIR graph (never corpus-sized); no window, nothing collects.
    */
  def triangleStats(pairs: DataFrame): DataFrame = {
    val canon = pairs.select(col("doc_a"), col("doc_b"))
    val deg = canon.select(col("doc_a").as("node"))
      .union(canon.select(col("doc_b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val oriented = canon
      .join(deg.select(col("node").as("doc_a"), col("deg").as("dega")), Seq("doc_a"))
      .join(deg.select(col("node").as("doc_b"), col("deg").as("degb")), Seq("doc_b"))
      // doc_a < doc_b by construction, so equal degrees orient a → b
      .select(
        when(col("dega") <= col("degb"), col("doc_a")).otherwise(col("doc_b")).as("u"),
        when(col("dega") <= col("degb"), col("doc_b")).otherwise(col("doc_a")).as("v"))
    val e1 = oriented.select(col("u"), col("v").as("x"))
    val e2 = oriented.select(col("u"), col("v").as("y"))
    val wedges = e1.join(e2, Seq("u")).filter(col("x") < col("y"))
    val tris = wedges.join(canon,
      col("x") === col("doc_a") && col("y") === col("doc_b"))
      .select(col("u"), col("x"), col("y"))
    val perNode = tris
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(when(col("deg") >= 2,
          lit(2.0) * coalesce(col("n_tri"), lit(0L)) / (col("deg") * (col("deg") - 1)))
          .otherwise(lit(0.0)), 6).as("clustering_coef"))
  }

  /** Synchronous label-propagation rounds — fixed and unrollable so the
    * oracle can replay each round as a CTE (same convention as PrIters).
    */
  val LpIters = 3

  /** Label-propagation community detection over an undirected pair graph
    * (doc_a, doc_b): every node starts labeled with its own id; each
    * SYNCHRONOUS round relabels v with the most frequent label among its
    * neighbors, ties broken by the smallest label — both rules integer-
    * exact, so the result is deterministic across engines, partitionings,
    * and cluster sizes (asynchronous LPA, the textbook default, is
    * schedule-dependent and unreproducible — useless for an
    * oracle-checked pipeline).
    *
    * Communities refine what connected components cannot: a component is
    * everything transitively touching, so one template hub welds
    * unrelated duplicate cliques into a single giant component, while
    * label propagation keeps densely-linked cliques as separate
    * communities — the granularity at which "keep one representative per
    * group" should actually operate.
    *
    * Scale: each round is one equi-join of the edge list against the
    * label table, one bounded hash agg on (node, label), and one size-
    * |labels-per-node| window — everything keyed on the PAIR graph, never
    * corpus-sized; `iters` is a constant, so the plan depth is fixed.
    */
  /** Weighted synchronous label propagation: each round relabels v with
    * the label carrying the largest incident EDGE-WEIGHT mass (ties by
    * smallest label). Weights (e.g. estimated Jaccard, cosine) are
    * quantized to integer micro-units before summation — the fixed-point
    * convention (see Classify) — so weighted majorities are exact
    * integer comparisons, reproducible at any partitioning. On near-dup
    * graphs this stops one borderline band-collision edge from
    * out-voting a genuinely-similar neighborhood: similarity mass, not
    * edge count, decides the community.
    *
    * Same plan shape per round as the unweighted variant: one edge ⋈
    * label equi-join, one bounded (node, label) hash agg, one
    * per-node window.
    */
  def labelPropagationWeighted(pairs: DataFrame, iters: Int = LpIters): DataFrame =
    lpaWeightedLoop(symmetrizedWeighted(pairs).persist(), iters)

  /** `labelPropagationWeighted` with eager materialization and cache
    * release — the per-micro-batch form: the returned frame is
    * localCheckpoint-truncated so it no longer references the cached edge
    * frame, which is unpersisted before returning (a long-running caller
    * like StreamingDedupIndex would otherwise leak one cached edge frame
    * per batch — the nearDupComponentsExact convention).
    */
  def labelPropagationWeightedEager(pairs: DataFrame, iters: Int = LpIters): DataFrame = {
    val edges = symmetrizedWeighted(pairs).persist()
    try lpaWeightedLoop(edges, iters).eagerCkpt
    finally edges.unpersist()
  }

  /** Integer micro-unit symmetrized weighted edge list — shared by the
    * weighted LPA and the modularity report so composed queries build
    * (and persist) the band-join subtree exactly once.
    */
  private[ops] def symmetrizedWeighted(pairs: DataFrame): DataFrame = {
    val wfp = round(col("weight") * lit(1e6), 0).cast("long")
    pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"), wfp.as("w"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"), wfp.as("w")))
  }

  private[ops] def lpaWeightedLoop(edges: DataFrame, iters: Int): DataFrame = {
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
    for (_ <- 0 until iters) {
      val cnt = edges
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"), col("lab"))
        .agg(sum(col("w")).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("node")).orderBy(col("c").desc, col("lab").asc)
      labels = cnt.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("node"), col("lab"))
    }
    labels.select(col("node"), col("lab").as("community"))
  }

  /** Per-community modularity contributions of the weighted-LPA
    * partition: q_c = s_in/2m − (s_tot/2m)², where s_in is the
    * intra-community weight (symmetrized, so each undirected edge counts
    * twice — the 2m convention), s_tot the community's total strength,
    * and 2m the graph's total strength — all EXACT integer micro-unit
    * sums, so only the final two divisions are floats (rounded 6dp).
    * Σ q_c is Newman modularity: the one-number answer to "are these
    * communities real structure or partition noise" before a
    * survivorship policy trusts them. Scale: the LPA rounds plus two
    * label-keyed joins of the edge list and a |communities|-row agg.
    */
  def modularityReport(pairs: DataFrame, iters: Int = LpIters): DataFrame = {
    // ONE persisted symmetrized edge frame feeds both the LPA rounds and
    // the e2 label joins (previously the report re-derived its own edge
    // list, recomputing the band join beside the LPA's cached copy), and
    // the finished |nodes|-row label table is persisted because it
    // appears TWICE in e2 — unpersisted, the whole iterative LPA chain
    // would execute once per join arm.
    val edges = symmetrizedWeighted(pairs).persist()
    val labels = lpaWeightedLoop(edges, iters).persist()
    modularityFrom(edges, labels)
  }

  /** Modularity report served from a PREBUILT weighted pair graph AND its
    * PREBUILT label table (the DedupIndex artifact): no LPA rounds run —
    * only the two label-keyed edge joins and the |communities|-row
    * aggregate. `pairs` carries (doc_a, doc_b, weight).
    */
  def modularityReportFrom(pairs: DataFrame, labels: DataFrame): DataFrame =
    modularityFrom(symmetrizedWeighted(pairs).persist(), labels)

  /** Modularity contributions from PREBUILT (and caller-persisted)
    * symmetrized-edge and label frames — the composition point for
    * queries that also need the labels themselves (e.g. gated
    * survivorship), so the LPA rounds run exactly once.
    */
  private[ops] def modularityFrom(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e2 = edges
      .join(labels.select(col("node").as("src"), col("community").as("ca")), Seq("src"))
      .join(labels.select(col("node").as("dst"), col("community").as("cb")), Seq("dst"))
    // community sizes from the |nodes|-row LABEL table, not
    // countDistinct(src) over the edge rows: every symmetrized node
    // appears as a src, so the two counts are identical — but the label
    // agg avoids the Expand/two-phase distinct over the (much larger)
    // edge join output
    val sizes = labels.groupBy(col("community")).agg(count(lit(1)).as("n_nodes"))
    // |communities|-row frame; persisted so the 2m derivation below reads
    // the cached agg instead of re-running the whole LPA + join subtree.
    val st = e2.groupBy(col("ca").as("community"))
      .agg(sum(col("w")).as("s_tot"),
        sum(when(col("ca") === col("cb"), col("w")).otherwise(0L)).as("s_in"))
      .join(sizes, Seq("community"))
      .persist()
    // Σ s_tot = 2m exactly: each symmetrized edge lands in precisely one
    // src community's strength, so summing strengths re-sums every w once.
    val twoM = st.agg(sum(col("s_tot")).as("two_m"))
    val tm = col("two_m").cast("double")
    st.crossJoin(broadcast(twoM))
      .select(col("community"), col("n_nodes"), col("s_in"), col("s_tot"),
        round(col("s_in").cast("double") / tm -
          (col("s_tot").cast("double") / tm) * (col("s_tot").cast("double") / tm), 6)
          .as("q_contrib"))
  }

  def labelPropagation(pairs: DataFrame, iters: Int = LpIters): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
    for (_ <- 0 until iters) {
      val cnt = edges
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("node")).orderBy(col("c").desc, col("lab").asc)
      labels = cnt.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("node"), col("lab"))
    }
    labels.select(col("node"), col("lab").as("community"))
  }

  /** k-core threshold and the hard peel-round backstop for `kCore`. The
    * backstop THROWS rather than silently returning a superset of the
    * true core (the nearDupComponentsExact convention); the oracle
    * unrolls exactly `KCoreMaxRounds` rounds, which equals the fixpoint
    * whenever the fixpoint is reachable within the bound — i.e. whenever
    * the Spark side doesn't throw — so the engines stay in lockstep.
    */
  val KCoreK = 2
  val KCoreMaxRounds = 12

  /** EXACT k-core over an undirected pair graph: synchronous rounds of
    * "drop every node with fewer than k neighbors among the still-alive
    * nodes", iterated to FIXPOINT — the alive set only shrinks, so one
    * survivor-count scalar per round detects convergence (count unchanged
    * ⟺ set unchanged ⟺ fixpoint) — then the surviving nodes with their
    * final within-core degree. `maxRounds` is a hard backstop that
    * throws on a deeper-than-expected peel instead of silently returning
    * a superset of the true core (the fixed-round variant's failure
    * shape; exact CC set the precedent).
    *
    * On the near-dup graph the k-core is the DENSE heart of duplication —
    * template farms and tight mirror clusters survive, while chains,
    * stars' leaves, and isolated pairs peel away (a chain dies entirely
    * at k=3; a hub survives only if its neighbors also interconnect).
    * The complement lens to triangleStats' per-node coefficient:
    * coreness is a set-level density certificate.
    *
    * Scale: per round one alive-filtered edge count (two semi-joins + a
    * hash agg on the PAIR graph) plus one driver scalar, lineage
    * truncated per round like the CC fixpoint; early exit means shallow
    * graphs pay their actual peel depth, not the worst-case budget.
    */
  def kCore(
      pairs: DataFrame,
      k: Int = KCoreK,
      maxRounds: Int = KCoreMaxRounds): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    // try/finally: the backstop throw below (and the caller catching it
    // to retry with a larger bound) must not strand the cached edge
    // frame; the result is localCheckpoint-materialized before the
    // release so it no longer references the cache
    try {
      var alive = edges.select(col("src").as("node")).distinct().eagerCkpt
      var aliveCount = alive.count()
      var converged = false
      var it = 0
      while (!converged && it < maxRounds) {
        val next = edges
          .join(alive.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
          .join(alive.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
          .groupBy(col("src").as("node")).agg(count(lit(1)).as("c"))
          .filter(col("c") >= k).select(col("node"))
          .eagerCkpt
        val nextCount = next.count()
        converged = nextCount == aliveCount
        alive = next
        aliveCount = nextCount
        it += 1
      }
      require(converged,
        s"kCore: no fixpoint after $maxRounds peel rounds — raise maxRounds " +
          "(each round peels at least one node, so the bound is the graph's " +
          "degeneracy-ordering depth, not its size)")
      edges
        .join(alive.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(alive.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
        .eagerCkpt
    } finally edges.unpersist()
  }
}
