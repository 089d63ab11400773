package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-error evidence for the one registry row whose value can't be
  * hash-matched (HLL sketch internals differ across engines) but CAN be
  * bounded: the estimate must sit within the configured rsd of the
  * exact distinct count. */
class ApproxDistinctSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("agg_approx_distinct: HLL estimate within 5% relative error of " +
    "exact countDistinct per group (sf0.001 and the driver-gate sf0.01)") {
    for (dir <- Seq(SparkSpec.Sf0001, "/root/testdata/sf0.01")) {
      val approx = SparkEntry.queries("agg_approx_distinct")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet == exact.keySet)
      exact.foreach { case (flag, n) =>
        val rel = math.abs(approx(flag) - n).toDouble / n
        assert(rel <= 0.05,
          s"$dir flag=$flag: approx=${approx(flag)} exact=$n rel=$rel")
      }
    }
  }
}
