package graft

import graft.functions.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSaving heavy hitters: exact-mode equivalence with the exact
  * group-by, the saturated-mode overestimate/error bound, and the
  * frequent-items guarantee — each under adversarial partitioning
  * (merge paths exercised). */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  // skewed stream: key "k<i>" appears i² times, i = 1..40 (N = 22140,
  // 40 distinct); heavy tail concentrated in the top few keys
  private def skewed = {
    val s = spark
    import s.implicits._
    (1 to 40).flatMap(i => Seq.fill(i * i)(f"k$i%02d")).toDF("w")
  }

  private def run(df: org.apache.spark.sql.DataFrame, capacity: Int,
      k: Int): Seq[(String, Long, Long)] =
    df.agg(HeavyHitters.spaceSaving(capacity, k)(col("w")).as("hh"))
      .select(explode(col("hh.items")).as("it"))
      .select(col("it.key"), col("it.cnt"), col("it.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq

  test("exact mode (capacity >= distinct): counts exact, errs 0, " +
    "result independent of partitioning") {
    val expect = (31 to 40).map(i => (f"k$i%02d", (i * i).toLong, 0L))
      .sortBy { case (key, c, _) => (-c, key) }
    for (parts <- Seq(1, 7, 32)) {
      val got = run(skewed.repartition(parts), capacity = 64, k = 10)
      assert(got === expect, s"parts=$parts")
    }
  }

  test("saturated mode: every count is an overestimate bounded by its " +
    "tracked err, and err <= N/capacity per merge leg") {
    val truth = (1 to 40).map(i => f"k$i%02d" -> (i * i).toLong).toMap
    val got = run(skewed.repartition(8), capacity = 16, k = 16)
    assert(got.nonEmpty)
    got.foreach { case (key, cnt, err) =>
      val t = truth(key)
      assert(cnt >= t, s"$key undercounted: $cnt < $t")
      assert(cnt - t <= err, s"$key overcount ${cnt - t} exceeds err $err")
    }
  }

  test("frequent-items guarantee: keys with true frequency > N/capacity" +
    " survive saturation") {
    // N = 22140, capacity 16 ⇒ threshold 1384: keys 38..40 (1444+) must
    // be present no matter how partitions merged
    val got = run(skewed.repartition(8), capacity = 16, k = 16)
      .map(_._1).toSet
    for (i <- 38 to 40) assert(got.contains(f"k$i%02d"), got)
  }

  test("registry query text_heavy_hitters: rank order matches the " +
    "exact group-by (exact mode on the docs vocabulary)") {
    val dir = SparkSpec.Sf0001
    val got = SparkEntry.queries("text_heavy_hitters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exact = SparkSpec.spark.read
      .parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.length === exact.length)
    got.zip(exact).zipWithIndex.foreach {
      case (((rank, w, n), (ew, en)), i) =>
        assert(rank === i + 1L)
        assert(w === ew && n === en, s"rank ${i + 1}")
    }
  }
}
