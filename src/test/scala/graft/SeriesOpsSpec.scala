package graft

import graft.operators.SeriesOps
import org.scalatest.funsuite.AnyFunSuite

/** SeriesOps against a hand-computed two-series fixture: InfluxQL
  * emission conventions (first-point nulls, zero-elapsed nulls,
  * leading-edge moving-average skip) and exact values. */
class SeriesOpsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  // (series, id, ts_ns, value) — series "a": 10, 13, 7, 7 at 1s steps
  // (with one 2s gap); series "b": a zero-elapsed repeat pair
  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      ("a", 1L, 1000000000L, 10.0),
      ("a", 2L, 2000000000L, 13.0),
      ("a", 3L, 4000000000L, 7.0),
      ("a", 4L, 5000000000L, 7.0),
      ("b", 5L, 1000000000L, 5.0),
      ("b", 6L, 1000000000L, 9.0))
      .toDF("series", "id", "ts", "value")
  }

  private def rows = SeriesOps.transforms(fixture,
    Seq("series"), "ts", "id", "value", maPoints = 2)
    .collect()
    .map(r => (r.getString(0), r.getLong(1)) -> r)
    .toMap

  test("difference / elapsed / cumulative_sum: first point null, then " +
    "exact deltas") {
    val r = rows
    assert(r(("a", 1L)).isNullAt(3) && r(("a", 1L)).isNullAt(4))
    assert(r(("a", 2L)).getDouble(3) === 3.0)
    assert(r(("a", 3L)).getDouble(3) === -6.0)
    assert(r(("a", 3L)).getLong(4) === 2000000000L)
    assert(r(("a", 4L)).getDouble(8) === 37.0) // 10+13+7+7
  }

  test("derivative is a per-second rate; zero-elapsed repeats emit " +
    "null, not ±Inf (ties broken by the tie column)") {
    val r = rows
    assert(r(("a", 2L)).getDouble(5) === 3.0)   // +3 over 1s
    assert(r(("a", 3L)).getDouble(5) === -3.0)  // -6 over 2s
    assert(r(("a", 3L)).isNullAt(6))            // nn_derivative drops it
    assert(r(("a", 4L)).getDouble(6) === 0.0)
    assert(r(("b", 6L)).isNullAt(5))            // dt=0 → null
  }

  test("moving average emits only once the window is FULL " +
    "(InfluxQL leading-edge skip)") {
    val r = rows
    assert(r(("a", 1L)).isNullAt(7))
    assert(r(("a", 2L)).getDouble(7) === 11.5)
    assert(r(("a", 4L)).getDouble(7) === 7.0)
  }

  test("whole family plans ONE window exchange (shared window spec — " +
    "no per-transform reshuffle)") {
    val df = SparkEntry.queries("ts_series_transforms")(spark, SparkSpec.Sf0001)
    df.collect(): Unit
    // AQE's string form appends "== Initial Plan ==" — final plan only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // one physical Window host per frame shape at most (lag / ma / cum),
    // all sharing one partitioning+ordering…
    assert("(?m)^\\s*[+:]?[- ]*\\*?\\(?\\d*\\)?\\s*Window ".r
      .findAllIn(p).size <= 3, p.take(3000))
    // …so the family shuffles and sorts ONCE
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      p.take(3000))
    assert("(?m)^\\s*[+:]?[- ]*\\*?\\(?\\d*\\)?\\s*Sort ".r
      .findAllIn(p).size === 1, p.take(3000))
  }
}
