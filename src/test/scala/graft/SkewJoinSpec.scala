package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-shuffle equivalence: results identical to the un-salted plan,
  * while the hot key's rows spread across `factor` salt partitions. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  // heavily skewed: 10k rows of key "hot", a handful of others
  def skewed() = ((1 to 10000).map(i => ("hot", i.toLong)) ++
    Seq(("a", 1L), ("b", 2L), ("c", 3L))).toDF("k", "v")

  test("saltedInnerJoin equals the plain join") {
    val right = Seq(("hot", 100L), ("a", 10L), ("z", 0L)).toDF("k", "w")
    val plain = skewed().join(right, "k")
      .select(sum($"v" + $"w")).head().getLong(0)
    val salted = SkewJoin.saltedInnerJoin(skewed(), right, "k", 8)
      .select(sum($"v" + $"w")).head().getLong(0)
    assert(salted == plain)
    assert(SkewJoin.saltedInnerJoin(skewed(), right, "k", 8).count() ==
      skewed().join(right, "k").count())
  }

  test("saltedAgg equals the plain aggregation and spreads the hot key") {
    val plain = skewed().groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val salted = SkewJoin.saltedAgg(skewed(), "k", 8,
      partial = _.agg(count(lit(1)).as("n"), sum("v").as("s")),
      finalAgg = _.agg(sum("n").as("n"), sum("s").as("s")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(salted == plain)
    // FULLY IDENTICAL rows (the canonical hot-key payload) must still
    // fan out: count the partial-stage rows per key via the two-phase
    // API itself — >1 means the hot key really spread over salts
    val identical = (1 to 1000).map(_ => ("hot", 1L)).toDF("k", "v")
    val spread = SkewJoin.saltedAgg(identical, "k", 8,
      partial = _.agg(count(lit(1)).as("n")),
      finalAgg = _.agg(count(lit(1)).as("n_salt_groups"),
        sum("n").as("n")))
      .head()
    assert(spread.getAs[Long]("n_salt_groups") > 1L)
    assert(spread.getAs[Long]("n") == 1000L)
  }
}
