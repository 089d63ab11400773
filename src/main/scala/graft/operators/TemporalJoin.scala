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
    val (lTagged, rTagged, leftCols) = asofTagged(left, right, keys,
      leftTime, rightTime, payloadCols, matchedTimeCol)
    // rights sort before lefts at equal time → `>=` semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_match"), ignoreNulls = true).over(w))
    asofProject(filled, leftCols, payloadCols, matchedTimeCol)
  }

  /** FORWARD as-of join: for each left row, the EARLIEST right row with
    * `right.time >= left.time`, per key — the "next event" enrichment
    * (next deploy after an alert, next calibration after a reading).
    * Same union+window shape and cost as [[asofJoin]]: one hash
    * shuffle, with the running `last` taken over the DESCENDING time
    * traversal (rights still before lefts at equal time, so a
    * same-timestamp right row is visible — `<=` right-inclusive). */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      matchedTimeCol: String = "asof_time"): DataFrame = {
    val (lTagged, rTagged, leftCols) = asofTagged(left, right, keys,
      leftTime, rightTime, payloadCols, matchedTimeCol)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_match"), ignoreNulls = true).over(w))
    asofProject(filled, leftCols, payloadCols, matchedTimeCol)
  }

  /** NEAREST as-of join: for each left row, whichever of the backward
    * and forward matches is closer in time; ties prefer the BACKWARD
    * (past) match — the convention that never peeks into the future
    * unless the future is strictly closer. Null-safe: one-sided
    * matches win by default. Cost: ONE hash shuffle (both window
    * passes share the key partitioning; Spark plans one Exchange and
    * two Sort+Window passes, asc and desc).
    *
    * Time columns must be INTEGRAL (ns/us unit longs) — the delta
    * comparison subtracts them; a timestamp cast would silently
    * truncate to seconds. */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      matchedTimeCol: String = "asof_time"): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType,
      LongType, ShortType}
    def integral(t: DataType): Boolean = t match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    require(integral(left.schema(leftTime).dataType) &&
      integral(right.schema(rightTime).dataType),
      "asofJoinNearest needs integral time columns (unit longs) for " +
        "the delta comparison")
    val (lTagged, rTagged, leftCols) = asofTagged(left, right, keys,
      leftTime, rightTime, payloadCols, matchedTimeCol)
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = lTagged.unionByName(rTagged)
      .withColumn("_mb", last(col("_match"), ignoreNulls = true).over(wb))
      .withColumn("_mf", last(col("_match"), ignoreNulls = true).over(wf))
    val t = col("_t").cast("long")
    val bt = col("_mb").getField("_mt").cast("long")
    val ft = col("_mf").getField("_mt").cast("long")
    val picked = u.withColumn("_match",
      when(col("_mb").isNull, col("_mf"))
        .when(col("_mf").isNull, col("_mb"))
        .when(t - bt <= ft - t, col("_mb"))
        .otherwise(col("_mf")))
    asofProject(picked, leftCols, payloadCols, matchedTimeCol)
  }

  /** Shared tagging for the as-of family: union-compatible left/right
    * frames with (_t, _side, _match) columns. The matched right row
    * travels as ONE struct (its time + payloads): taking a running
    * last of each payload column independently would resurrect an
    * OLDER row's value whenever the truly-matched row has a NULL
    * payload field — fields from different right rows mixed into one
    * result. A struct from a right row is never null as a whole, so
    * last(ignoreNulls) picks the whole matched row or nothing. */
  private def asofTagged(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      matchedTimeCol: String): (DataFrame, DataFrame, Seq[String]) = {
    require(keys.nonEmpty, "asofJoin requires at least one key column")
    val leftCols = left.columns.toSeq
    require(payloadCols.intersect(leftCols).isEmpty,
      s"payload columns ${payloadCols.intersect(leftCols)} clash with " +
        "left columns — rename the right side first")
    require(!leftCols.contains(matchedTimeCol) &&
      !payloadCols.contains(matchedTimeCol),
      s"matchedTimeCol '$matchedTimeCol' clashes with a left/payload column")
    for (c <- Seq("_t", "_side", "_match", "_mb", "_mf"))
      require(!leftCols.contains(c) && !right.columns.contains(c),
        s"reserved column name '$c' present in an input")
    import org.apache.spark.sql.types.{StructField, StructType}
    val matchType = StructType(
      StructField("_mt", right.schema(rightTime).dataType) +:
        payloadCols.map(c =>
          StructField(c, right.schema(c).dataType)))
    val lTagged = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_match", lit(null).cast(matchType))
      .select((keys :+ "_t" :+ "_side" :+ "_match").map(col) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val rTagged = right
      // a null right time is unmatchable by definition; it would sort
      // first and leak its payload into rows with no real match
      .filter(col(rightTime).isNotNull)
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_match",
        struct(col(rightTime).as("_mt") +: payloadCols.map(col): _*))
      .select((keys :+ "_t" :+ "_side" :+ "_match").map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    (lTagged, rTagged, leftCols)
  }

  private def asofProject(filled: DataFrame, leftCols: Seq[String],
      payloadCols: Seq[String], matchedTimeCol: String): DataFrame =
    filled.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        Seq(col("_match").getField("_mt").as(matchedTimeCol)) ++
        payloadCols.map(c => col("_match").getField(c).as(c)): _*)

  /** As-of join WITH a staleness tolerance: identical to [[asofJoin]]
    * except a match older than `toleranceUs` time units before the
    * left row is rejected — the row keeps its slot with NULL payload,
    * exactly as if no right row existed. The variant every real
    * enrichment needs ("the most recent state, unless it has gone
    * stale"): plain as-of joins silently enrich with arbitrarily
    * ancient state after a right-side outage. Same one-shuffle
    * union+window plan; the tolerance is a pure row-local projection
    * on top (tolerance is in the time columns' own unit). */
  def asofJoinWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      toleranceUs: Long,
      matchedTimeCol: String = "asof_time"): DataFrame = {
    require(toleranceUs >= 0,
      s"tolerance must be non-negative: $toleranceUs")
    val joined = asofJoin(left, right, keys, leftTime, rightTime,
      payloadCols, matchedTimeCol)
    val fresh = col(matchedTimeCol).isNotNull &&
      (col(leftTime) - col(matchedTimeCol)) <= toleranceUs
    val gated = Set(matchedTimeCol) ++ payloadCols
    joined.select(joined.columns.toSeq.map { c =>
      if (gated(c)) when(fresh, col(c)).as(c) else col(c)
    }: _*)
  }

  /** As-of join on the CUSTOM sort-merge operator
    * ([[graft.plan.AsOfJoin]]): same semantics as [[asofJoin]] —
    * differential-tested identical — but planned as a first-class
    * binary node: each side shuffles and sorts at its own natural
    * width and the merge streams both once with O(1) state per key
    * group, where the union+window form sorts |L|+|R| null-padded
    * union rows through one window operator. Registers the strategy
    * on the session idempotently. */
  def asofJoinMerged(
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
    require(!leftCols.contains(matchedTimeCol) &&
      !payloadCols.contains(matchedTimeCol),
      s"matchedTimeCol '$matchedTimeCol' clashes with a left/payload column")
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val spark = left.sparkSession
    graft.plan.AsOfJoin.register(spark)
    // every right-side column re-aliased ⇒ FRESH exprIds: left/right
    // outputs can never conflict, so the analyzer's DeduplicateRelations
    // never re-ids the right subtree (it cannot rewrite the attribute
    // fields of a node it doesn't know, which would orphan them)
    val rProj = right.select(
      ((keys :+ rightTime) ++ payloadCols)
        .map(c => col(c).as("__r_" + c)): _*)
    val lPlan = GraftShim.analyzedPlan(left)
    val rPlan = GraftShim.analyzedPlan(rProj)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      p.output.find(_.name == name).getOrElse(
        sys.error(s"column '$name' not found"))
    val rOut = rPlan.output
    // the exec builds its ordering/grouping from LEFT attribute types
    // and hash-clusters each side on its own keys — an int-vs-bigint
    // key pair would partition the sides differently and return
    // mostly-unmatched rows instead of erroring (the union+window
    // `asofJoin` fails loudly on the same input), so fail here
    keys.zip(rOut.take(keys.size)).foreach { case (k, rAttr) =>
      val lt = attr(lPlan, k).dataType
      require(lt == rAttr.dataType,
        s"asofJoinMerged key '$k': left is $lt but right is " +
          s"${rAttr.dataType} — cast the sides to a common type first")
    }
    locally {
      val lt = attr(lPlan, leftTime).dataType
      val rt = rOut(keys.size).dataType
      require(lt == rt,
        s"asofJoinMerged time columns: left '$leftTime' is $lt but " +
          s"right '$rightTime' is $rt — cast to a common type first")
    }
    val payloadAttrs = rOut.takeRight(payloadCols.size)
    val matchedAttrs =
      AttributeReference(matchedTimeCol,
        rOut(keys.size).dataType, nullable = true)() +:
        payloadCols.zip(payloadAttrs).map { case (name, a) =>
          AttributeReference(name, a.dataType, nullable = true)() }
    GraftShim.ofRows(spark, graft.plan.AsOfJoin.AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), rOut.take(keys.size),
      attr(lPlan, leftTime), rOut(keys.size),
      payloadAttrs, matchedAttrs))
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
    require(!points.columns.contains("_bucket") &&
      !intervals.columns.contains("_bucket"),
      "reserved column name '_bucket' present in an input")
    // integral floor-division (`(a - pmod(a, w)) div w`): `floor(a / w)`
    // would route through a double, whose 53-bit mantissa misbuckets
    // ns-scale epochs (~1e18); this form is exact at any magnitude and
    // floors correctly for negative times too. Identifiers are
    // backtick-quoted (doubling inner backticks) so keyword/special-char
    // column names like `end` parse.
    def q(c: String) = "`" + c.replace("`", "``") + "`"
    def fdiv(c: String, off: String) = {
      val e = s"(${q(c)} $off)"
      s"($e - pmod($e, ${bucketWidth}L)) div ${bucketWidth}L"
    }
    val iv = intervals
      // empty/inverted intervals match nothing; unguarded, sequence()
      // would COUNT DOWN from start's bucket to end's and explode an
      // arbitrarily long descending bucket array per bad row
      .filter(col(endCol) > col(startCol))
      .withColumn("_bucket",
        // end is exclusive: an interval ending exactly on a bucket edge
        // does not reach into that bucket
        explode(expr(
          s"sequence(${fdiv(startCol, "")}, ${fdiv(endCol, "- 1")})")))
    val pt = points.withColumn("_bucket", expr(fdiv(ptTime, "")))
    pt.join(iv, keys :+ "_bucket")
      .filter(col(ptTime) >= col(startCol) && col(ptTime) < col(endCol))
      .drop("_bucket")
  }
}
