package graft.plan

import graft.model.ChunkSpec

/** Time-window chunk planner.
  *
  * Reproduces the reference's driver-side chunk math
  * (/root/reference/pkg/agent/sync.go:118-146):
  *
  *   - number of chunks `hLength = duration/chunk + 1` capped by
  *     `maxret/chunk + 1` (sync.go:122-126)
  *   - chunks are iterated NEWEST → OLDEST:
  *     `endsec = eEpoch − i·chunk; startsec = eEpoch − (i+1)·chunk`
  *     (sync.go:144-146)
  *   - the reference then scans with doubly-exclusive bounds
  *     `time > start AND time < end` (sync.go:162), which drops points
  *     exactly on chunk edges — a known lossy semantic.
  *
  * Engine default is the lossless half-open `[start, end)` plan with no
  * over-extension past the requested window; `strictReferenceBounds`
  * reproduces the reference plan exactly for differential tests
  * (SURVEY.md §7.3 hard part 2).
  */
object ChunkPlanner {

  /** Lossless default plan: newest-first, half-open `[start,end)` chunks
    * exactly tiling `[startNs, endNs)`, clamped to the retention horizon
    * `endNs - maxRetentionNs` when one is given (sync.go:122-126 analog).
    */
  def plan(
      startNs: Long,
      endNs: Long,
      chunkNs: Long,
      maxRetentionNs: Option[Long] = None): Seq[ChunkSpec] = {
    require(chunkNs > 0, s"chunkNs must be positive: $chunkNs")
    val clampedStart = maxRetentionNs match {
      case Some(r) if r > 0 => math.max(startNs, endNs - r)
      case _                => startNs
    }
    if (endNs <= clampedStart) return Nil
    val n = ceilDiv(endNs - clampedStart, chunkNs)
    // newest-first: chunk 0 is [end-chunk, end)
    (0L until n).map { i =>
      val e = endNs - i * chunkNs
      val s = math.max(clampedStart, e - chunkNs)
      ChunkSpec(i.toInt, s, e)
    }
  }

  /** Reference-parity plan: `duration/chunk + 1` chunks (the `+1`
    * over-extends the oldest chunk before `start`), second-aligned edges,
    * max-retention cap `maxret/chunk + 1` (sync.go:118-128). Bounds are
    * intended to be consumed with strict `>` / `<` on both ends
    * (sync.go:162). Inputs in seconds like the reference.
    */
  def planReferenceSeconds(
      startSec: Long,
      endSec: Long,
      chunkSec: Long,
      maxRetentionSec: Long): Seq[ChunkSpec] = {
    require(chunkSec > 0)
    val duration = endSec - startSec
    if (duration <= 0) return Nil
    val raw = duration / chunkSec + 1          // sync.go:118-121
    val cap = maxRetentionSec / chunkSec + 1   // sync.go:122-126
    val n = math.min(raw, cap)
    (0L until n).map { i =>
      val e = endSec - i * chunkSec            // sync.go:144-145
      val s = endSec - (i + 1) * chunkSec      // sync.go:146
      ChunkSpec(i.toInt, s * 1000000000L, e * 1000000000L)
    }
  }

  /** Density-adaptive plan: tile `[startNs, endNs)` so every chunk
    * holds ≈ `targetRows`, from a coarse row-density histogram (one
    * cheap count aggregation at `cellNs` grain —
    * [[graft.sources.Tables.cellCounts]]). Fixed-width chunks are the
    * reference's contract (sync.go:118-146) but break under time skew:
    * at 100 TB a burst hour holds orders of magnitude more rows than a
    * quiet one, so the fixed plan builds one executor-crushing chunk
    * and thousands of near-empty ones. Greedy oldest→newest walk over
    * the aligned cells: cut a boundary when adding the next cell would
    * exceed `targetRows` (always taking at least one cell — a cell
    * denser than the target becomes its own chunk, `cellNs` bounding
    * the split granularity; empty cells merge into neighbors for
    * free). Output chunks exactly tile the window, half-open,
    * newest-first ids — drop-in for the fixed plan everywhere
    * downstream (copy, checksum, retention).
    *
    * `counts`: rows per cell index, cell i = [startNs + i·cellNs,
    * startNs + (i+1)·cellNs) ∩ window; absent ⇒ 0. */
  def planAdaptive(
      startNs: Long,
      endNs: Long,
      cellNs: Long,
      counts: Map[Long, Long],
      targetRows: Long): Seq[ChunkSpec] = {
    require(cellNs > 0, s"cellNs must be positive: $cellNs")
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    if (endNs <= startNs) return Nil
    val nCells = ceilDiv(endNs - startNs, cellNs)
    val bounds = Seq.newBuilder[(Long, Long)] // oldest-first spans
    var chunkStart = startNs
    var acc = 0L
    var i = 0L
    while (i < nCells) {
      val rows = counts.getOrElse(i, 0L)
      val cellEnd = math.min(startNs + (i + 1) * cellNs, endNs)
      if (acc > 0 && acc + rows > targetRows) {
        // cut BEFORE this cell; it starts the next chunk
        val cellStart = startNs + i * cellNs
        bounds += ((chunkStart, cellStart))
        chunkStart = cellStart
        acc = rows
      } else acc += rows
      if (i == nCells - 1) bounds += ((chunkStart, cellEnd))
      i += 1
    }
    val oldestFirst = bounds.result()
    oldestFirst.reverseIterator.zipWithIndex.map { case ((s, e), id) =>
      ChunkSpec(id, s, e)
    }.toSeq
  }

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b
}
