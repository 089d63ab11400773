package graft

import graft.operators.Profiling
import org.scalatest.funsuite.AnyFunSuite

/** Winsorized-statistics unit coverage (columnProfile is pinned by the
  * registry oracle + PlanSpec's pruned-ReadSchema assertion). */
class ProfilingSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("winsorizedStats: hand-computed 25%-trim clamp over 1..20; " +
    "duplicate-heavy group clamps by multiplicity rank; a group " +
    "smaller than the trim grain is untouched") {
    val s = spark
    import s.implicits._
    val rows =
      (1 to 20).map(v => ("A", v.toLong)) ++         // uniform 1..20
      Seq.fill(4)(("B", 1L)) :+ (("B", 100L))        // skewed dup pile
    val out = Profiling.winsorizedStats(
        rows.toDF("g", "cents").repartition(5), Seq("g"), "cents",
        trimNum = 1L, trimDen = 4L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // A: n=20, klo=ceil(20/4)=5, khi=16 → bounds are the 5th/16th
    // smallest = 5/16; clamp: 4·5 + Σ(5..16) + 4·16 = 20+126+64 = 210;
    // wmean_u = round(210·10⁴/20) = 105000
    assert(out("A") == ((20L, 5L, 16L, 105000L)))
    // B: n=5, klo=2, khi=4; cum over distinct values: (1→4, 100→5) so
    // BOTH ranks land on value 1 (multiplicity, not distinct position)
    // → everything clamps to 1, mean exactly 1 cent
    assert(out("B") == ((5L, 1L, 1L, 10000L)))
    // n below the trim grain: klo=ceil(3/20)=1 → bounds = min/max, no
    // clipping, exact mean round((1+2+4)·10⁴/3) = 23333
    val out2 = Profiling.winsorizedStats(
        Seq(("C", 1L), ("C", 2L), ("C", 4L)).toDF("g", "cents"),
        Seq("g"), "cents")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out2.toSeq == Seq((3L, 1L, 4L, 23333L)))
  }
}
