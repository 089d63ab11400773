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
}
