package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relation-shaped graphs (north-star: centrality
  * and structure queries on the similarity/duplication graphs the
  * dedup family produces — "which document is the hub of this template
  * flood", "rank cluster members by linkage", link-spam detection).
  *
  * Everything here is expressed as joins + aggregates over (src, dst)
  * edge frames — the Pregel-without-Pregel shape: one co-partitioned
  * equi-join per superstep, message passing as a groupBy(dst), no
  * driver-side graph state (the dedup family's min-label propagation
  * in [[Dedup]] is the same discipline).
  */
object Graph {

  /** Deterministic integer PageRank: ranks in exact fixed-point units
    * (`scale` = one unit of initial mass per node) with damping
    * dampNum/dampDen, iterated a FIXED `iters` times.
    *
    * All arithmetic is Long floor division — no floating point
    * anywhere — so the result is independent of partitioning and
    * summation order, bit-identical across engines (an oracle can
    * unroll the same iterations in SQL), and safely comparable across
    * runs; the cost is the floored remainder mass, which is dropped
    * (sub-`1/scale` per edge per step — irrelevant for ranking).
    * Dangling nodes (out-degree 0) keep and emit nothing beyond the
    * base term — the "no redistribution" convention.
    *
    * r₀(v) = scale;
    * r_{t+1}(v) = (scale·(dampDen−dampNum)) div dampDen
    *            + (dampNum · Σ_{(u,v)∈E} (r_t(u) div deg(u))) div dampDen
    *
    * Scale shape: `iters` supersteps, each ONE equi-join of the edge
    * frame with the rank frame on the src key plus ONE
    * map-side-combined groupBy(dst) — every shuffle is keyed on a node
    * id, nothing is ever collected to the driver, and the rank frame
    * stays |V| rows. The degree join is computed once and reused.
    * Overflow headroom: ranks stay ≤ scale·|V| only if the graph were
    * one absorbing hub; with Long and the default millionth-scale that
    * allows |V| up to ~9·10¹² — beyond any corpus.
    *
    * @param nodes one `id` column, the full vertex set (isolated
    *              vertices keep the base rank)
    * @param edges directed (src, dst) rows; symmetrize before calling
    *              for an undirected graph
    */
  def pageRankInt(nodes: DataFrame, edges: DataFrame, iters: Int = 3,
      dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"need at least one iteration: $iters")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < dampNum < dampDen: $dampNum/$dampDen")
    val base = scale * (dampDen - dampNum) / dampDen
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesDeg = edges.join(deg, "src")
    val init = nodes.select(col("id"), lit(scale).as("rank_u"))
    (1 to iters).foldLeft(init) { (ranks, _) =>
      val contrib = edgesDeg
        .join(ranks.select(col("id").as("src"), col("rank_u")), "src")
        .select(col("dst"), expr("rank_u div deg").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("c"))
      nodes
        .join(contrib.select(col("dst").as("id"), col("c")), Seq("id"),
          "left")
        .select(col("id"),
          (lit(base) +
            expr(s"($dampNum * coalesce(c, 0L)) div $dampDen"))
            .as("rank_u"))
    }
  }

  /** Exact triangle count of an undirected graph via DEGREE-ORDERED
    * orientation (the scalable formulation): orient every undirected
    * edge from its lower to its higher endpoint in the (degree, id)
    * total order, enumerate wedges only at each edge's lower endpoint,
    * and close them against the oriented edge list. Every triangle is
    * counted exactly once (the orientation is acyclic), and wedge
    * fan-out is bounded by each node's ORIENTED out-degree — O(√m) on
    * any graph, so a celebrity hub with 10⁶ neighbors generates no
    * 10¹²-wedge explosion (the naive u-centered wedge join does).
    *
    * Shape: two joins on node keys (degree attach), one self-equi-join
    * on the wedge pivot, one closing equi-join on (v, w); all
    * counting, no floats.
    *
    * @param edges symmetrized directed (src, dst) rows (both
    *              directions per undirected edge, as [[pageRankInt]])
    * @return one row: n_triangles BIGINT */
  def triangleCount(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val oriented = edges
      .join(deg, "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("ddst")),
        "dst")
      .filter(struct(col("deg"), col("src")) <
        struct(col("ddst"), col("dst")))
      .select(col("src"), col("dst"), col("ddst"))
    val wedges = oriented.as("a")
      .join(oriented.as("b"), col("a.src") === col("b.src"))
      .filter(struct(col("a.ddst"), col("a.dst")) <
        struct(col("b.ddst"), col("b.dst")))
      .select(col("a.dst").as("v"), col("b.dst").as("w"))
    wedges
      .join(oriented.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Degree assortativity: the Pearson correlation of endpoint
    * degrees over the (symmetrized) edge list — "do hubs link to
    * hubs" (positive: template floods chain into each other;
    * negative: hub-and-spoke boilerplate). Exact Long sums over the
    * edge frame (degrees are edge-bounded so the moment sums stay far
    * from overflow at any corpus the pair generator can emit); the
    * correlation is the corrMatrix fixed-order IEEE combination,
    * rounded 4, NULL for degree-regular graphs (zero variance).
    *
    * Output (one row): n_edges (directed/symmetrized count), r_r. */
  def assortativity(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val sums = edges
      .join(deg, "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("ddst")),
        "dst")
      .agg(count(lit(1)).as("n"), sum(col("deg")).as("sa"),
        sum(col("ddst")).as("sb"),
        sum(col("deg") * col("deg")).as("qa"),
        sum(col("ddst") * col("ddst")).as("qb"),
        sum(col("deg") * col("ddst")).as("pab"))
    def d(c: String) = col(c).cast("double")
    val ca = d("n") * d("qa") - d("sa") * d("sa")
    val cb = d("n") * d("qb") - d("sb") * d("sb")
    sums.select(col("n").as("n_edges"),
      when(ca > 0 && cb > 0,
        round((d("n") * d("pab") - d("sa") * d("sb")) /
          (sqrt(ca) * sqrt(cb)), 4)).as("r_r"))
  }

  /** Per-node local clustering coefficient in exact basis points:
    * 2·(triangles at the node) / (deg·(deg−1)), floored bp — how
    * template-blob-like each document's neighborhood is ([[triangleCount]]
    * gives the corpus total; this localizes it, the per-doc "is this
    * node inside a dense flood" flag). Triangles enumerate once at the
    * degree-ordered wedge apex (hub-safe, exactly the triangleCount
    * plan) and then attribute to all THREE corners via one 3-row
    * explode — per-node counts without per-node wedge fan-out. Nodes
    * with deg < 2 have no defined coefficient (NULL). */
  def clusteringCoefficient(nodes: DataFrame, edges: DataFrame)
      : DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val oriented = edges
      .join(deg, "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("ddst")),
        "dst")
      .filter(struct(col("deg"), col("src")) <
        struct(col("ddst"), col("dst")))
      .select(col("src"), col("dst"), col("ddst"))
    val tri = oriented.as("a")
      .join(oriented.as("b"), col("a.src") === col("b.src"))
      .filter(struct(col("a.ddst"), col("a.dst")) <
        struct(col("b.ddst"), col("b.dst")))
      .select(col("a.src").as("u"), col("a.dst").as("v"),
        col("b.dst").as("w"))
      .join(oriented.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"))
    val perNode = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
    nodes
      .join(deg.select(col("src").as("id"), col("deg")), Seq("id"),
        "left_outer")
      .join(perNode, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(coalesce(col("deg"), lit(0L)) >= 2,
          expr("(2 * coalesce(n_tri, 0) * 10000) div (deg * (deg - 1))"))
          .as("coeff_bp"))
  }

  /** Undirected degree profile of an edge list: per node, its degree;
    * isolated nodes included with degree 0 (the companion query for
    * spotting hub documents before they flood a near-dup pass). */
  def degrees(nodes: DataFrame, edges: DataFrame): DataFrame =
    nodes.join(
        edges.groupBy(col("src").as("id"))
          .agg(count(lit(1)).as("degree")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("degree"), lit(0L)).as("degree"))

  /** Bounded k-core peeling: `rounds` supersteps of "drop every node
    * whose degree among SURVIVORS is < k" — the density filter that
    * separates a template flood's tightly-linked core from
    * incidentally-similar stragglers (a node in the true k-core never
    * drops; peeling converges to it as rounds grow). Fixed `rounds`
    * keeps the computation an exact, oracle-replayable unrolled
    * recurrence (the pageRankInt discipline) instead of a
    * driver-controlled convergence loop; nodes report the FIRST round
    * they fell out, NULL = still in after all rounds.
    *
    * Scale shape: per superstep, two equi-joins restrict the edge
    * frame to surviving endpoints and one map-side-combined
    * groupBy(src) recounts degrees — every shuffle keyed on a node
    * id, the survivor frame only shrinks, nothing collects to the
    * driver. The edge frame is CACHED once (it is typically an
    * expensive minhash→band→candidate pipeline that must not
    * re-execute per round) and each round's degree frame is eagerly
    * localCheckpoint'ed — the same lineage discipline as
    * [[Dedup.dupClusters]]: without it the survivor plan references
    * `edges` twice and `alive` three times per round, so the upstream
    * pipeline re-executes O(rounds) times and the plan compounds ~3×
    * per round (an exponential-lineage hang at 100 TB with deep
    * peeling).
    *
    * Output: (id, in_core, dropped_round — NULL iff in_core). */
  def kCorePeel(nodes: DataFrame, edges: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    require(rounds >= 1, s"need at least one round: $rounds")
    val e0 = edges.cache()
    var alive = nodes.select(col("id"))
    val dropped = Seq.newBuilder[DataFrame]
    for (r <- 1 to rounds) {
      val e2 = e0
        .join(alive.select(col("id").as("src")), "src")
        .join(alive.select(col("id").as("dst")), "dst")
      // EAGER localCheckpoint: materializes this round's ~|alive|-row
      // degree frame and truncates the plan to a leaf, so (a) the two
      // consumers below (survivor filter + dropped filter) read
      // materialized blocks instead of re-running the restrict joins,
      // and (b) next round's plan starts from a constant-size leaf.
      val deg = alive.join(
          e2.groupBy(col("src").as("id"))
            .agg(count(lit(1)).as("d")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("d"), lit(0L)).as("d"))
        .localCheckpoint(true)
      alive = deg.filter(col("d") >= k).select(col("id"))
      dropped += deg.filter(col("d") < k)
        .select(col("id"), lit(r.toLong).as("dropped_round"))
    }
    // every per-round degree frame is checkpointed (leaf plans over
    // materialized blocks), so the edge cache can release without
    // risking a recompute of the candidate pipeline
    e0.unpersist(): Unit
    nodes.select(col("id"))
      .join(dropped.result().reduce(_ unionAll _), Seq("id"), "left")
      .select(col("id"), col("dropped_round").isNull.as("in_core"),
        col("dropped_round"))
  }

  /** Connected components by FIXED-ROUND min-label propagation — the
    * general-graph form of [[Dedup.dupClusters]]' clustering (that one
    * is convergence-driven and dedup-shaped; this one takes any
    * (nodes, edges) pair and unrolls an exact, oracle-replayable
    * recurrence, the [[pageRankInt]] discipline): per round,
    * label(v) ← min(label(v), min over in-neighbors label(u)).
    * After `rounds` rounds every node carries the smallest node id
    * within `rounds` hops — equal to its true component id whenever
    * `rounds` ≥ the component's min-label eccentricity (tiny for LSH
    * near-dup blobs; raise `rounds` for chain-shaped graphs or use
    * dupClusters' converging form).
    *
    * Scale shape: one src-keyed equi-join plus one map-side-combined
    * groupBy(id) per round; the edge frame is cached once and each
    * round's label frame is eagerly localCheckpoint'ed (constant-size
    * plans, no O(rounds) recompute of an upstream candidate pipeline).
    *
    * @param edges directed (src, dst); symmetrize for undirected
    * @return (id, component) — component = min reachable id seen */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"need at least one round: $rounds")
    val e0 = edges.cache()
    var labels = nodes
      .select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val viaNeighbors = e0
        .join(labels.select(col("id").as("src"), col("component")), "src")
        .select(col("dst").as("id"), col("component"))
      labels = labels
        .unionAll(viaNeighbors)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(true)
    }
    e0.unpersist(): Unit
    labels
  }

  /** Synchronous label propagation (community detection): every node
    * starts as its own community; per round each node adopts the most
    * frequent community among its in-neighbors, ties broken to the
    * SMALLEST community id, isolated nodes keep their own — the
    * deterministic-LPA variant (classic LPA breaks ties randomly;
    * random ties are unreproducible across engines and runs, so the
    * tie policy here is part of the contract). Fixed `rounds` keeps
    * the recurrence exact and oracle-replayable. Unlike
    * [[connectedComponents]] this separates DENSELY linked blobs
    * inside one weakly-connected component — the template-flood
    * community structure a near-dup graph actually has.
    *
    * Scale shape per round: one src-keyed join, one (id, label)
    * count aggregate, one per-id argmax as a struct-max AGGREGATE
    * (max count, then min label via negated id — no per-node window
    * sort), one left join back; edges cached once, labels
    * checkpointed per round.
    *
    * @param edges directed (src, dst); symmetrize for undirected
    * @return (id, community) after `rounds` synchronous updates */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"need at least one round: $rounds")
    val e0 = edges.cache()
    var labels = nodes
      .select(col("id"), col("id").as("community"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val votes = e0
        .join(labels.select(col("id").as("src"), col("community")), "src")
        .groupBy(col("dst").as("id"), col("community"))
        .agg(count(lit(1)).as("cnt"))
      // argmax(count, then min community): node ids are non-negative,
      // so max(struct(cnt, -community)) picks highest count and,
      // within it, the smallest community id
      val winner = votes
        .groupBy("id")
        .agg(max(struct(col("cnt"), negate(col("community")).as("nc")))
          .as("w"))
        .select(col("id"), negate(col("w.nc")).as("vote"))
      labels = labels
        .join(winner, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("vote"), col("community")).as("community"))
        .localCheckpoint(true)
    }
    e0.unpersist(): Unit
    labels
  }
}
