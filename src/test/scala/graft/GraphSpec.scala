package graft

import graft.operators.Graph
import org.scalatest.funsuite.AnyFunSuite

/** Integer-PageRank unit coverage (the registry oracle replays the
  * full recurrence over the real LSH graph; these fixtures pin the
  * hand-computed recurrence, isolated-node behavior, and
  * partitioning-independence). */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def frames(edges: Seq[(Long, Long)], nodes: Seq[Long]) = {
    val s = spark
    import s.implicits._
    // symmetrize: callers pass undirected pairs
    val e = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    (nodes.toDF("id"), e)
  }

  test("pageRankInt: hand-computed two supersteps on the path a—b—c " +
    "plus an isolated node that keeps exactly the base rank") {
    val (nodes, edges) = frames(Seq((1L, 2L), (2L, 3L)),
      Seq(1L, 2L, 3L, 4L))
    // scale 10⁶, damping 85/100, base = 150000; degrees: a=1, b=2, c=1
    // it1: c(a)=c(c)=⌊10⁶/2⌋=500000 → r=150000+⌊85·5e5/100⌋=575000
    //      c(b)=10⁶+10⁶=2·10⁶      → r=150000+1700000=1850000
    // it2: c(a)=c(c)=⌊1850000/2⌋=925000 → r=150000+786250=936250
    //      c(b)=575000+575000=1150000   → r=150000+977500=1127500
    val out = Graph.pageRankInt(nodes, edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L,
      4L -> 150000L))
  }

  test("pageRankInt is independent of partitioning (exact integer " +
    "arithmetic — no summation-order drift)") {
    val (nodes, edges) = frames(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)),
      (1L to 6L))
    val a = Graph.pageRankInt(nodes.repartition(7), edges.repartition(5),
        iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRankInt(nodes.repartition(2), edges.repartition(3),
        iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    // the two high-degree nodes (1 and 3, degree 3) outrank the rest
    val top = a.toSeq.sortBy(-_._2).take(2).map(_._1).toSet
    assert(top === Set(1L, 3L))
  }

  test("triangleCount: hand-built graphs — one triangle with a tail, " +
    "two triangles sharing an edge, a star with none") {
    def count(undirected: Seq[(Long, Long)]): Long = {
      val (_, e) = frames(undirected, undirected.flatMap(p =>
        Seq(p._1, p._2)).distinct)
      Graph.triangleCount(e).collect().head.getLong(0)
    }
    // triangle 1-2-3 plus tail 3-4
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))) === 1L)
    // triangles 1-2-3 and 2-3-4 share edge 2-3
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L),
      (3L, 4L))) === 2L)
    // star: hub 1 with 4 leaves — wedges everywhere, no closures
    assert(count(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) === 0L)
    // K4: C(4,3) = 4 triangles, each counted once despite symmetry
    assert(count(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))) === 4L)
  }

  test("degrees: isolated nodes report 0; degree counts the " +
    "symmetrized neighbor set") {
    val (nodes, edges) = frames(Seq((1L, 2L), (2L, 3L)), Seq(1L, 2L, 3L, 9L))
    val out = Graph.degrees(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 9L -> 0L))
  }

  test("clusteringCoefficient: triangle corners all score 10000, a " +
    "tail node and isolated node have NULL coefficients, K4 interior " +
    "scores 10000 and a broken-K4 corner scores the exact fraction") {
    val (nodes, edges) = frames(
      // triangle 1-2-3 with tail 3-4; isolated 9
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)),
      Seq(1L, 2L, 3L, 4L, 9L))
    val out = Graph.clusteringCoefficient(nodes, edges)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_ => r.getLong(3))))).toMap
    assert(out(1L) === ((2L, 1L, Some(10000L))))
    assert(out(2L) === ((2L, 1L, Some(10000L))))
    // node 3: deg 3, 1 triangle of 3 possible pairs → 3333 bp
    assert(out(3L) === ((3L, 1L, Some(3333L))))
    assert(out(4L) === ((1L, 0L, None)))
    assert(out(9L) === ((0L, 0L, None)))
    // K4 minus edge (3,4): nodes 1,2 see all 3 of their neighbor
    // pairs minus... by hand: triangles are 1-2-3 and 1-2-4.
    val (n2, e2) = frames(Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L)), Seq(1L, 2L, 3L, 4L))
    val o2 = Graph.clusteringCoefficient(n2, e2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), Option(r.get(3)).map(_ => r.getLong(3)))))
      .toMap
    assert(o2(1L) === ((2L, Some(6666L)))) // deg 3: 2 of 3 pairs
    assert(o2(2L) === ((2L, Some(6666L))))
    assert(o2(3L) === ((1L, Some(10000L)))) // deg 2: its 1 pair closes
    assert(o2(4L) === ((1L, Some(10000L))))
  }

  test("kCorePeel: a path CASCADES round by round while a triangle " +
    "survives as the 2-core; isolated nodes drop in round 1") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4-5 hanging off triangle 5-6-7; node 99 isolated
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (5L, 7L), (6L, 7L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 99L)).toDF("id")
    val out = Graph.kCorePeel(nodes, edges, k = 2, rounds = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    // round 1 drops degree-<2: node 1 (deg 1) and 99 (deg 0); then
    // 2 (its neighbor gone), then 3, then 4 — one per round
    assert(out(99L) === ((false, Some(1L))))
    assert(out(1L) === ((false, Some(1L))))
    assert(out(2L) === ((false, Some(2L))))
    assert(out(3L) === ((false, Some(3L))))
    assert(out(4L) === ((false, Some(4L))))
    // the triangle (with 5 still attached through it) is the 2-core
    assert(out(5L) === ((true, None)))
    assert(out(6L) === ((true, None)))
    assert(out(7L) === ((true, None)))
  }

  test("connectedComponents: two components + an isolated node label " +
    "to their min member; a 5-chain needs its eccentricity in rounds") {
    val (nodes, edges) = frames(
      Seq((5L, 6L), (6L, 7L), (10L, 11L)),
      Seq(5L, 6L, 7L, 10L, 11L, 99L))
    val out = Graph.connectedComponents(nodes, edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(5L -> 5L, 6L -> 5L, 7L -> 5L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
    // path 1-2-3-4-5: min label 1 reaches node 5 only after 4 rounds
    val (n2, e2) = frames(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)),
      Seq(1L, 2L, 3L, 4L, 5L))
    val r2 = Graph.connectedComponents(n2, e2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(5L) === 3L) // 2 hops only
    val r4 = Graph.connectedComponents(n2, e2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r4 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("labelPropagation: a bridged pair of triangles keeps two " +
    "communities; ties break to the SMALLEST label; isolated keeps own") {
    // triangles 1-2-3 and 4-5-6 bridged by 3-4; node 99 isolated
    val (nodes, edges) = frames(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
        (3L, 4L)),
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 99L))
    val out = Graph.labelPropagation(nodes, edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(99L) === 99L)
    // round 1 (all labels distinct → every vote ties → min neighbor):
    // 1←2, 2←1, 3←1, 4←3, 5←4, 6←4; round 2: 1←min(1,1)... the
    // triangle 1-2-3 collapses onto 1; the right side follows its
    // bridge down to the left's labels over later rounds — the pinned
    // fixpoint here documents the deterministic recurrence
    assert(Set(out(1L), out(2L), out(3L)) === Set(1L))
    // right triangle: after r1 labels (3,4,4); r2: 4 sees {5:4,6:4,3:3}
    // → 4 wins count 2; 5 sees {4:3,6:4} tie → 3; 6 sees {4:3,5:4}
    // tie → 3; r3: 4 sees {5:3,6:3,3:1}→3, 5 sees {4:4,6:3} tie→3,
    // 6 likewise → all land on 3 (absorbed across the bridge)
    assert(out(4L) === 3L && out(5L) === 3L && out(6L) === 3L)
  }

  test("kCorePeel truncates lineage per round: the result plan reads " +
    "checkpointed degree frames, never the edge pipeline (the r10 " +
    "lineage-explosion fix — edges must NOT re-execute O(rounds) times)") {
    val s = spark
    import s.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val out = Graph.kCorePeel(nodes, edges, k = 2, rounds = 3)
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    // each round's degree frame is an eager localCheckpoint → a
    // LogicalRDD leaf; the edge frame's LocalRelation must be absent
    // from the final plan entirely (it was consumed at peel time)
    val rddLeaves = leaves.count(_.getClass.getSimpleName
      .contains("LogicalRDD"))
    assert(rddLeaves === 3,
      s"expected 3 checkpointed round leaves, plan:\n$out")
    // only the nodes relation remains besides the checkpoints
    assert(leaves.size === 4,
      s"unexpected extra leaves (edge lineage leaked back in):\n" +
        out.queryExecution.optimizedPlan.toString.take(3000))
  }
}
