package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Explicit bloom runtime filter: prune a huge probe side BEFORE its
  * shuffle using a compact membership sketch built from the (much
  * smaller) build side.
  *
  * This is the user-controllable twin of Catalyst's `InjectRuntimeFilter`
  * rule (which only fires when its size thresholds and shuffle-shape
  * heuristics line up). At 100 TB the win is structural: a semi join
  * against a selective dimension otherwise shuffles every probe row —
  * including the ~99% that can never match — across the network. A bloom
  * filter of the build keys is a few MB regardless of probe size, ships
  * once, and drops non-matching rows AT THE SCAN, before the exchange.
  * False positives only cost the exact join that follows; false
  * negatives are impossible, so semantics are exactly a semi join.
  *
  * Not in the reference (its only join plane is per-measurement copy);
  * north-star equipment per SURVEY.md §2.3.
  *
  * Implementation notes:
  *  - keys are hashed with `xxhash64` on BOTH sides — BloomFilterAggregate
  *    buffers longs, and membership is tested on the same hash;
  *  - the sketch is materialized to the driver and inlined as a literal
  *    (BloomFilterMightContain requires a foldable/scalar-subquery bloom
  *    input — an AttributeReference from a broadcast join is rejected).
  *    That is the same materialize-then-rebroadcast shape Catalyst's own
  *    rule produces via a scalar subquery, and the payload is bounded by
  *    `numBits/8` (1 MiB here), NOT by either table's size;
  *  - both bloom expressions are codegen'd, so the prefilter runs inside
  *    the probe scan's WholeStageCodegen span.
  */
object RuntimeFilters {

  private def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    GraftShim.column(
      new BloomFilterAggregate(
        GraftShim.expression(xxhash64(key)),
        GraftShim.expression(lit(expectedItems)),
        GraftShim.expression(lit(numBits))).toAggregateExpression())

  /** Build a bloom filter over `build(buildKey)`'s xxhash64 values.
    * Returns the serialized sketch (`util.sketch.BloomFilter` wire
    * format, `numBits/8` bytes ≈ 1 MiB at the defaults). */
  def buildBloom(
      build: DataFrame,
      buildKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): Array[Byte] =
    build
      .select(bloomAgg(col(buildKey), expectedItems, numBits).as("bf"))
      .head()
      .getAs[Array[Byte]](0)

  /** Membership-test column: true when `key`'s hash might be in `bloom`.
    * No false negatives; false-positive rate set by numBits/items. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftShim.column(
      new BloomFilterMightContain(
        GraftShim.expression(lit(bloom)),
        GraftShim.expression(xxhash64(key))))

  /** Semi join `probe ⋉ build` with a bloom prefilter on the probe side.
    *
    * Plan shape: probe scan → bloom filter (codegen'd, before any
    * exchange) → exact LEFT SEMI join against `build`. The exact join
    * removes bloom false positives, so the result is identical to
    * `probe.join(build, keys, "left_semi")` — only the shuffled probe
    * volume changes (by ~the build side's selectivity). */
  def bloomSemiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    val bloom = buildBloom(build, buildKey, expectedItems, numBits)
    probe
      .filter(mightContain(bloom, col(probeKey)))
      .join(build, col(probeKey) === build(buildKey), "left_semi")
  }
}
