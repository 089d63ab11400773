package graft

import graft.operators.QuantileSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DDSketch batch face: the relative-error guarantee vs the exact
  * order statistic, the bucket math, and the positive-domain
  * contract. */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("bucketOf/estimateOf: bucket i covers (gamma^(i-1), gamma^i] " +
    "and the midpoint estimate is within alpha of any value in it") {
    val alphaBp = 200
    val g = QuantileSketch.gamma(alphaBp)
    val lnG = math.log(g)
    assert(QuantileSketch.bucketOf(1L, lnG) === 0L)
    for (v <- Seq(1L, 2L, 17L, 999L, 123456L, 99999999L)) {
      val bk = QuantileSketch.bucketOf(v, lnG)
      // containment: gamma^(bk-1) < v <= gamma^bk (up to float slack)
      assert(math.pow(g, bk.toDouble - 1) <= v * (1 + 1e-12), s"v=$v")
      assert(v <= math.pow(g, bk.toDouble) * (1 + 1e-12), s"v=$v")
      val est = QuantileSketch.estimateOf(bk, alphaBp)
      assert(math.abs(est - v) / v <= alphaBp / 10000.0 + 1e-9,
        s"v=$v est=$est")
    }
    intercept[IllegalArgumentException] {
      QuantileSketch.bucketOf(0L, lnG)
    }
  }

  test("ddQuantiles: every estimate is within the alpha relative " +
    "error of the exact percentile; v <= 0 rows are excluded; the " +
    "per-group count is exact") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (for {
      gN <- Seq("a", "b")
      _ <- 1 to 2000
    } yield (gN, (rnd.nextInt(100000) + 1).toLong)) ++
      Seq(("a", 0L), ("a", -5L)) // excluded from the sketch
    val df = rows.toDF("g", "v")
    val out = QuantileSketch.ddQuantiles(df, Seq("g"), "v",
        alphaBp = 200, qs = Seq((50L, 100L), (99L, 100L)),
        names = Seq("p50_r", "p99_r")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def exactQ(gN: String, q: Double): Long = {
      val vs = rows.filter(r => r._1 == gN && r._2 > 0)
        .map(_._2).sorted
      vs((math.ceil(q * vs.size) - 1).toInt)
    }
    for (gN <- Seq("a", "b")) {
      val (n, p50, p99) = out(gN)
      assert(n === 2000L, s"$gN n")
      val e50 = exactQ(gN, 0.50).toDouble
      val e99 = exactQ(gN, 0.99).toDouble
      assert(math.abs(p50 - e50) / e50 <= 0.02 + 1e-6,
        s"$gN p50 $p50 vs $e50")
      assert(math.abs(p99 - e99) / e99 <= 0.02 + 1e-6,
        s"$gN p99 $p99 vs $e99")
    }
  }
}
