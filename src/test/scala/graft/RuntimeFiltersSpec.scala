package graft

import graft.operators.RuntimeFilters
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RuntimeFilters: the explicit bloom prefilter must be semantically
  * invisible (≡ plain semi join) and physically present (a
  * might_contain filter on the probe side BEFORE the join). */
class RuntimeFiltersSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = SparkSpec.Sf0001

  private def probe = Tables.load(spark, dir, "lineitem")
  private def build = Tables.load(spark, dir, "part")
    .filter(col("p_size") < 10)

  test("bloomSemiJoin ≡ plain left-semi join (false positives removed " +
    "by the exact-join finish)") {
    val viaBloom = RuntimeFilters.bloomSemiJoin(
      probe, build, "l_partkey", "p_partkey", expectedItems = 10000L)
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
    val plain = probe
      .join(build, col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("bloom membership has NO false negatives: every true build key " +
    "passes mightContain") {
    val bloom = RuntimeFilters.buildBloom(build, "p_partkey",
      expectedItems = 10000L)
    val misses = build
      .filter(!RuntimeFilters.mightContain(bloom, col("p_partkey")))
      .count()
    assert(misses === 0L)
  }

  test("prefilter is physically planned on the probe side before the " +
    "join (might_contain in the executed plan)") {
    val df = RuntimeFilters.bloomSemiJoin(
      probe, build, "l_partkey", "p_partkey", expectedItems = 10000L)
    df.collect(): Unit
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(3000))
    // the prefilter must not have replaced the exact join
    assert(p.contains("LeftSemi"), p.take(3000))
  }

  test("sketch size is bounded by numBits, independent of probe size") {
    val bloom = RuntimeFilters.buildBloom(build, "p_partkey",
      expectedItems = 10000L, numBits = 65536L)
    // util.sketch wire format: version + numHashes + longs array
    assert(bloom.length <= 65536 / 8 + 64, bloom.length)
  }
}
