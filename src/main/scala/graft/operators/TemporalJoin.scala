package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators the reference lacks (SURVEY.md §2.3 names
  * them as engine surface: "range/as-of for time-series enrichment via
  * bucketed equi-join ... + window dedup"). Both are built so the plan
  * never contains a cartesian/nested-loop join — the shapes that survive
  * a 100 TB scale-up.
  */
object TemporalJoin {

  /** As-of join: for each left row, the most recent right row with
    * `right.time <= left.time`, per key — the standard enrichment join
    * of a point stream against a state/dimension-change stream.
    *
    * Implementation is the union+window trick, NOT a range join: tag
    * and union both sides, then per key take the running `last` of the
    * right payload ordered by (time, side) with rights before lefts on
    * ties (so a same-timestamp right row IS visible, matching ASOF's
    * `>=`). ONE hash shuffle on the key — no per-pair work at all, so
    * skewed keys cost what any groupBy on that key costs, and there is
    * no interval explosion. The right side must be unique per
    * (keys, time); aggregate it first (a duplicate would make "the"
    * match nondeterministic in any engine).
    *
    * Output: every left row (left columns unchanged) plus
    * `matchedTimeCol` (the matched right timestamp, null when no prior
    * right row) and the right payload columns, nulled when unmatched.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      matchedTimeCol: String = "asof_time"): DataFrame = {
    require(keys.nonEmpty, "asofJoin requires at least one key column")
    val leftCols = left.columns.toSeq
    require(payloadCols.intersect(leftCols).isEmpty,
      s"payload columns ${payloadCols.intersect(leftCols)} clash with " +
        "left columns — rename the right side first")
    require(!leftCols.contains(matchedTimeCol),
      s"matchedTimeCol '$matchedTimeCol' clashes with a left column")
    val lTagged = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn(matchedTimeCol, lit(null).cast("long"))
      .select((keys :+ "_t" :+ "_side" :+ matchedTimeCol).map(col) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(c)) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val rTagged = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn(matchedTimeCol, col(rightTime).cast("long"))
      .select((keys :+ "_t" :+ "_side" :+ matchedTimeCol).map(col) ++
        payloadCols.map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // rights sort before lefts at equal time → `>=` semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn(matchedTimeCol,
        last(col(matchedTimeCol), ignoreNulls = true).over(w))
      .withColumns(payloadCols.map(c =>
        c -> last(col(c), ignoreNulls = true).over(w)).toMap)
    filled.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ Seq(col(matchedTimeCol)) ++
        // matchedTime null ⇒ no prior right row ⇒ the running-last of
        // every payload is null too; the explicit guard just keeps the
        // unmatched shape airtight
        payloadCols.map(c => when(col(matchedTimeCol).isNotNull, col(c))
          .as(c)): _*)
  }

  /** Range (interval-containment) join: pair each point with every
    * interval `[start, end)` containing it, per key. The scale shape is
    * bucketed: intervals explode onto the fixed-width time buckets they
    * overlap, points map to their single bucket, and the join is a plain
    * equi-join on (keys…, bucket) followed by the exact containment
    * filter — never a nested-loop/cartesian plan. A (point, interval)
    * pair meets in exactly one bucket (the point's), so no post-join
    * dedup is needed. Pick `bucketWidth` ≈ the typical interval length:
    * each interval then lands in ~2 buckets and bucket fan-out stays
    * O(|intervals|). */
  def rangeJoin(
      points: DataFrame,
      ptTime: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // integral floor-division (`(a - pmod(a, w)) div w`): `floor(a / w)`
    // would route through a double, whose 53-bit mantissa misbuckets
    // ns-scale epochs (~1e18); this form is exact at any magnitude and
    // floors correctly for negative times too
    def fdiv(c: String, off: String) =
      s"(($c $off) - pmod(($c $off), ${bucketWidth}L)) div ${bucketWidth}L"
    val iv = intervals.withColumn("_bucket",
      // end is exclusive: an interval ending exactly on a bucket edge
      // does not reach into that bucket
      explode(expr(s"sequence(${fdiv(startCol, "")}, ${fdiv(endCol, "- 1")})")))
    val pt = points.withColumn("_bucket", expr(fdiv(ptTime, "")))
    pt.join(iv, keys :+ "_bucket")
      .filter(col(ptTime) >= col(startCol) && col(ptTime) < col(endCol))
      .drop("_bucket")
  }
}
