package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-error evidence for `agg_percentiles_approx` (sketch merge
  * order isn't canonical across engines, so no DuckDB hash match): the
  * GK sketch guarantees the returned value's RANK is within
  * ε = 1/accuracy of the requested percentile. With accuracy=1000 the
  * returned q50 must be an actual data value whose rank sits in
  * [0.499, 0.501] of the group — checked against the exact sorted rank,
  * not against a value tolerance (quantities are integral, so a value
  * tolerance would be vacuous). */
class PercentileApproxSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("approx_percentile rank error ≤ 1/accuracy vs exact ranks per " +
    "group (sf0.001 and the driver-gate sf0.01)") {
    val eps = 1.0 / 1000.0
    for (dir <- Seq(SparkSpec.Sf0001, "/root/testdata/sf0.01")) {
      val approx = SparkEntry.queries("agg_percentiles_approx")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      val li = Tables.load(spark, dir, "lineitem").cache()
      try {
        for ((flag, (q50, q90, p99)) <- approx) {
          val grp = li.filter(col("l_returnflag") === flag)
          def rankOf(c: String, v: Double): Double = {
            val below = grp.filter(col(c) <= v).count().toDouble
            below / grp.count()
          }
          // value at rank r: at least (r - eps) of rows are ≤ it, and
          // strictly less than (r + eps) are < it
          def ok(c: String, v: Double, r: Double): Boolean = {
            val le = rankOf(c, v)
            val lt = grp.filter(col(c) < v).count().toDouble / grp.count()
            le >= r - eps && lt <= r + eps
          }
          assert(ok("l_quantity", q50, 0.5), s"$dir $flag q50=$q50")
          assert(ok("l_quantity", q90, 0.9), s"$dir $flag q90=$q90")
          assert(ok("l_extendedprice", p99, 0.99), s"$dir $flag p99=$p99")
        }
      } finally { li.unpersist(): Unit }
    }
  }
}
