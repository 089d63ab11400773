package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable HLL distinct-count partials: the union of per-slice
  * sketches must equal one direct sketch EXACTLY (HLL registers are
  * per-bucket maxes — partitioning cannot move the estimate), and the
  * estimate must sit inside the standard error envelope vs the exact
  * distinct count. */
class HllPartialsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("union of daily partials equals one direct sketch estimate " +
    "exactly; estimate within 5% of exact countDistinct") {
    val s = spark
    import s.implicits._
    val rows = (1 to 20000).map { i =>
      (i % 7, (i * 2654435761L) % 3000) // 7 slices, ~3000 distinct
    }
    val df = rows.toDF("d", "u")
    val viaPartials = df.groupBy($"d")
      .agg(expr("hll_sketch_agg(u)").as("sk"))
      .agg(expr("cast(hll_sketch_estimate(hll_union_agg(sk)) as bigint)"))
      .head().getLong(0)
    val direct = df
      .agg(expr("cast(hll_sketch_estimate(hll_sketch_agg(u)) as bigint)"))
      .head().getLong(0)
    assert(viaPartials === direct,
      "partitioning moved a mergeable-sketch estimate")
    val exact = df.select($"u").distinct().count()
    assert(math.abs(viaPartials - exact).toDouble / exact <= 0.05,
      s"estimate $viaPartials vs exact $exact")
  }

  test("the registry entry runs and every per-type estimate is " +
    "within 5% of the exact per-type distinct users (sf0.001)") {
    val dir = SparkSpec.Sf0001
    val out = SparkEntry.queries("incr_hll_partials")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = graft.sources.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === exact.keySet)
    out.foreach { case (k, est) =>
      val ex = exact(k)
      assert(math.abs(est - ex).toDouble / ex <= 0.05,
        s"$k: $est vs $ex")
    }
  }
}
