package graft

import graft.plan.ChunkPlanner
import org.scalatest.funsuite.AnyFunSuite

/** Chunk-plan math per /root/reference/pkg/agent/sync.go:118-146
  * (FIXTURES.md §B.2). */
class ChunkPlannerSpec extends AnyFunSuite {

  test("exact multiple: newest-first, half-open tiling") {
    val p = ChunkPlanner.plan(0L, 100L, 25L)
    assert(p.map(c => (c.startNs, c.endNs)) ==
      Seq((75L, 100L), (50L, 75L), (25L, 50L), (0L, 25L)))
    assert(p.map(_.id) == Seq(0, 1, 2, 3))
  }

  test("non-multiple: oldest chunk clamped to start (no over-extension)") {
    val p = ChunkPlanner.plan(0L, 90L, 25L)
    assert(p.map(c => (c.startNs, c.endNs)) ==
      Seq((65L, 90L), (40L, 65L), (15L, 40L), (0L, 15L)))
  }

  test("empty and inverted windows") {
    assert(ChunkPlanner.plan(5L, 5L, 10L).isEmpty)
    assert(ChunkPlanner.plan(10L, 5L, 10L).isEmpty)
  }

  test("max retention clamps the horizon (sync.go:122-126 analog)") {
    val p = ChunkPlanner.plan(0L, 100L, 10L, maxRetentionNs = Some(30L))
    assert(p.head.endNs == 100L && p.last.startNs == 70L)
    assert(p.size == 3)
  }

  test("reference plan: duration/chunk + 1 chunks, over-extended tail") {
    // 90s window, 25s chunks → reference makes 90/25+1 = 4 chunks, the
    // last reaching BEFORE start (sync.go:118-121,144-146)
    val p = ChunkPlanner.planReferenceSeconds(10L, 100L, 25L, 3600L)
    assert(p.size == 4)
    assert(p.head.endNs == 100L * 1000000000L)
    assert(p.last.startNs == 0L) // (100 - 4*25) = 0 < start 10
  }

  test("reference plan: maxret cap") {
    val p = ChunkPlanner.planReferenceSeconds(0L, 1000L, 10L, 50L)
    assert(p.size == 50 / 10 + 1)
  }

  test("property: chunks tile [start,end) with no gaps or overlaps") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val start = rnd.nextInt().toLong
      val len = rnd.nextInt(100000).toLong + 1
      val chunk = rnd.nextInt(1000).toLong + 1
      val p = ChunkPlanner.plan(start, start + len, chunk)
      // newest-first; reversing gives contiguous ascending coverage
      val asc = p.reverse
      assert(asc.head.startNs == start)
      assert(asc.last.endNs == start + len)
      asc.sliding(2).foreach {
        case Seq(x, y) => assert(x.endNs == y.startNs)
        case _         =>
      }
      assert(p.forall(c => c.endNs - c.startNs <= chunk))
    }
  }

  test("adaptive plan: dense cells isolate, sparse cells merge, chunks " +
    "never exceed target unless a single cell does") {
    // 10 cells of width 10: counts 5,5,5,100,5,5,0,0,5,5; target 20
    val counts = Map(0L -> 5L, 1L -> 5L, 2L -> 5L, 3L -> 100L,
      4L -> 5L, 5L -> 5L, 8L -> 5L, 9L -> 5L)
    val p = ChunkPlanner.planAdaptive(0L, 100L, 10L, counts, 20L)
    val asc = p.reverse.map(c => (c.startNs, c.endNs))
    // [0,30) = 15 rows; [30,40) the burst cell alone; [40,100) = 20 rows
    assert(asc === Seq((0L, 30L), (30L, 40L), (40L, 100L)))
    // newest-first ids, like plan()
    assert(p.map(_.id) === p.indices.toSeq)
    assert(p.head.endNs === 100L && p.last.startNs === 0L)
  }

  test("adaptive plan property: exact tiling for random skewed " +
    "histograms; per-chunk rows bounded by max(target, max cell)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 300) {
      val start = rnd.nextInt().toLong
      val len = rnd.nextInt(100000).toLong + 1
      val cell = rnd.nextInt(1000).toLong + 1
      val nCells = ((len + cell - 1) / cell).toInt
      val counts = (0 until nCells).flatMap { i =>
        if (rnd.nextBoolean()) None
        else Some(i.toLong ->
          (if (rnd.nextInt(10) == 0) 5000L else rnd.nextInt(50).toLong))
      }.toMap
      val target = 100L
      val p = ChunkPlanner.planAdaptive(start, start + len, cell,
        counts, target)
      val asc = p.reverse
      assert(asc.head.startNs == start && asc.last.endNs == start + len)
      asc.sliding(2).foreach {
        case Seq(x, y) => assert(x.endNs == y.startNs)
        case _         =>
      }
      // rows per chunk ≤ max(target, densest single cell)
      val maxCell = if (counts.isEmpty) 0L else counts.values.max
      asc.foreach { c =>
        val rows = counts.collect { case (i, n)
          if start + i * cell >= c.startNs &&
            start + i * cell < c.endNs => n }.sum
        assert(rows <= math.max(target, maxCell),
          s"chunk $c rows=$rows")
      }
    }
  }

  test("adaptive plan: empty histogram → one chunk, empty window → Nil") {
    assert(ChunkPlanner.planAdaptive(0L, 100L, 10L, Map.empty, 10L)
      .map(c => (c.startNs, c.endNs)) === Seq((0L, 100L)))
    assert(ChunkPlanner.planAdaptive(100L, 100L, 10L, Map.empty, 10L)
      .isEmpty)
  }
}
