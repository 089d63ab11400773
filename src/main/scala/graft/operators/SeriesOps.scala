package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-series transformation functions over measurement frames — the
  * InfluxQL function family (`DIFFERENCE`, `DERIVATIVE`,
  * `NON_NEGATIVE_DERIVATIVE`, `ELAPSED`, `MOVING_AVERAGE`,
  * `CUMULATIVE_SUM`) that users of the reference run against the data it
  * syncs (the reference replicates measurements, InfluxDB evaluates
  * these; north-star surface per SURVEY.md §2.5).
  *
  * Scale shape: ALL transforms share ONE window spec — partition by the
  * series key, order by (time, tiebreak) — so Catalyst plans a single
  * Exchange + Sort + Window for the whole family (PlanSpec pins it).
  * Series keys are high-cardinality (tag sets), so per-partition window
  * state stays small at 100 TB; nothing here ever needs a global sort.
  *
  * Determinism: the order column set must uniquely order rows within a
  * series (`tieCol`), otherwise running sums are engine-dependent under
  * timestamp ties.
  */
object SeriesOps {

  /** All six transforms in one pass. Time units are whatever `tsCol`
    * ticks in (ns, µs, …): `time_ticks`/`elapsed_ticks` outputs are in
    * the same unit, and `unitTicks` sets the derivative's rate unit
    * (ticks per unit — 1e9 for per-second rates over an ns column).
    *
    * @param tsCol      integral epoch time column
    * @param tieCol     unique-per-row column breaking timestamp ties
    * @param maPoints   moving-average window size in POINTS (InfluxQL
    *                   `MOVING_AVERAGE(value, N)`); emitted only once
    *                   the window is full (InfluxQL leading-edge skip)
    * @param unitTicks  derivative unit in ticks (default: 1s over ns)
    */
  def transforms(
      df: DataFrame,
      seriesCols: Seq[String],
      tsCol: String,
      tieCol: String,
      valueCol: String,
      maPoints: Int = 3,
      unitTicks: Long = 1000000000L): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val maW = w.rowsBetween(-(maPoints - 1L), Window.currentRow)
    val cumW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val v = col(valueCol)
    val prevV = lag(v, 1).over(w)
    val prevT = lag(col(tsCol), 1).over(w)
    val diff = v - prevV
    val dtNs = col(tsCol) - prevT
    // rate per unit; null (not ±Inf) on the first point and on
    // zero-elapsed repeats — InfluxQL emits nothing for both
    val deriv: Column = when(dtNs > 0,
      diff / (dtNs.cast("double") / lit(unitTicks.toDouble)))

    // times stay integral end to end — a double division of an
    // ~1.7e18 ns epoch would lose precision past 2^53
    df.select(
      seriesCols.map(col) ++ Seq(
        col(tieCol),
        col(tsCol).cast("long").as("time_ticks"),
        round(diff, 4).as("difference"),
        dtNs.cast("long").as("elapsed_ticks"),
        round(deriv, 6).as("derivative"),
        round(when(deriv >= 0, deriv), 6).as("nn_derivative"),
        round(when(count(v).over(maW) === maPoints, avg(v).over(maW)), 6)
          .as(s"ma$maPoints"),
        round(sum(v).over(cumW), 4).as("cum_sum")): _*)
  }
}
