package graft

import java.nio.file.Files

import graft.operators.Bucketing
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: same result as the plain join, with NO
  * shuffle exchange in the physical plan — the write-time shuffle trade
  * that makes recurring fact-to-fact joins affordable at 100 TB. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("same-bucketed tables join without a shuffle and match the " +
    "plain join's result") {
    val base = Files.createTempDirectory("graft_bucket").toString
    val li = Tables.load(spark, SparkSpec.Sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val ord = Tables.load(spark, SparkSpec.Sf0001, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_b", s"$base/li", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_b", s"$base/ord", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // sf0.001 tables are broadcast-sized; disable broadcast so the
      // planner exercises the bucketed sort-merge path under test (at
      // real scale both sides exceed any broadcast threshold)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "li_b", "ord_b",
        "l_orderkey")
      joined.collect(): Unit
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(2500))
      assert(plan.contains("SortMergeJoin"), plan.take(2500))
      // result identity vs the plain (shuffled) join — exact row-set
      // compare (a float aggregate would differ only in summation order)
      val plain = li.join(ord, "l_orderkey")
      assert(joined.count() == plain.count())
      assert(joined.except(plain).count() == 0)
      assert(plain.except(joined).count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b"): Unit
    }
  }

  test("custom as-of exec composes with storage bucketing: both sides " +
    "bucketed on the key → NO shuffle exchange, results unchanged") {
    val base = Files.createTempDirectory("graft_bucket_asof").toString
    val ev = Tables.load(spark, SparkSpec.Sf0001, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("t_us"), col("event_type"), col("value"))
    val alerts = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), col("t_us").as("a_t"))
      .agg(max(col("value")).as("alert_value"))
    Bucketing.writeBucketed(ev.select("event_id", "user_id", "t_us"),
      "ev_b", s"$base/ev", "user_id", 8)
    Bucketing.writeBucketed(alerts, "al_b", s"$base/al", "user_id", 8)
    try {
      val joined = graft.operators.TemporalJoin.asofJoinMerged(
        spark.table("ev_b"), spark.table("al_b"),
        Seq("user_id"), "t_us", "a_t", Seq("alert_value"), "mt")
      joined.collect(): Unit
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // bucketed scans satisfy the exec's ClusteredDistribution on both
      // sides — EnsureRequirements inserts no exchange (sorts remain:
      // the layout is key-sorted, not (key, time)-sorted)
      assert(!plan.contains("Exchange"), plan.take(3000))
      assert(plan.contains("AsOfJoin"), plan.take(3000))
      // identical to the unbucketed composed form
      val want = graft.operators.TemporalJoin.asofJoin(
        ev.select("event_id", "user_id", "t_us"), alerts,
        Seq("user_id"), "t_us", "a_t", Seq("alert_value"), "mt")
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet === want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ev_b")
      spark.sql("DROP TABLE IF EXISTS al_b"): Unit
    }
  }

  test("multi-column bucket spec is REJECTED: (key, other) buckets are " +
    "not co-located on key alone and would silently shuffle") {
    val base = Files.createTempDirectory("graft_bucket_mc").toString
    val li = Tables.load(spark, SparkSpec.Sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    try {
      li.write.bucketBy(8, "l_orderkey", "l_partkey")
        .option("path", s"$base/li2").mode("overwrite")
        .saveAsTable("li_mc")
      Bucketing.writeBucketed(li, "li_ok", s"$base/li1", "l_orderkey", 8)
      val e = intercept[IllegalArgumentException] {
        Bucketing.bucketedJoin(spark, "li_mc", "li_ok", "l_orderkey")
      }
      assert(e.getMessage.contains("exactly"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_mc")
      spark.sql("DROP TABLE IF EXISTS li_ok"): Unit
    }
  }

  test("mortonKey: interleaves bits exactly (driver-side reference " +
    "over a dim grid), bounds stay positive, and sorting by it " +
    "clusters both dimensions") {
    val s = spark
    import s.implicits._
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i + 1)) |
          (((b >> i) & 1L) << (2 * i))
      }
    val grid = for (a <- 0L to 17L; b <- 0L to 17L) yield (a, b)
    val got = grid.toDF("a", "b")
      .select(col("a"), col("b"),
        Bucketing.mortonKey(col("a"), col("b"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    grid.foreach { case (a, b) =>
      assert(got((a, b)) === ref(a, b, 16), s"($a,$b)") }
    // canonical low-order values
    assert(got((1L, 0L)) === 2L && got((0L, 1L)) === 1L &&
      got((3L, 3L)) === 15L)
    // 2-D clustering: within any aligned 2×2 cell the z-keys are
    // CONTIGUOUS (the property row-group envelopes rely on)
    for (a0 <- Seq(0L, 2L, 4L, 16L); b0 <- Seq(0L, 2L, 8L)) {
      val cell = for (da <- 0L to 1L; db <- 0L to 1L)
        yield got((a0 + da, b0 + db))
      assert(cell.max - cell.min === 3L, s"cell ($a0,$b0): $cell")
    }
    val e = intercept[IllegalArgumentException] {
      Bucketing.mortonKey(col("a"), col("b"), 32)
    }
    assert(e.getMessage.contains("bits"))
  }
}
