package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.functions.TopKAgg

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

    // signed zero: round() of a tiny negative yields -0.0 in IEEE
    // engines that preserve it (DuckDB does; Spark's BigDecimal path
    // normalizes). `+ 0.0` canonicalizes -0.0 → +0.0 so the rendered
    // string ("0.0", not "-0.0") is engine-independent — the oracle SQL
    // applies the identical normalization.
    def r0(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)

    // times stay integral end to end — a double division of an
    // ~1.7e18 ns epoch would lose precision past 2^53
    df.select(
      seriesCols.map(col) ++ Seq(
        col(tieCol),
        col(tsCol).cast("long").as("time_ticks"),
        r0(diff, 4).as("difference"),
        dtNs.cast("long").as("elapsed_ticks"),
        r0(deriv, 6).as("derivative"),
        r0(when(deriv >= 0, deriv), 6).as("nn_derivative"),
        r0(when(count(v).over(maW) === maPoints, avg(v).over(maW)), 6)
          .as(s"ma$maPoints"),
        r0(sum(v).over(cumW), 4).as("cum_sum")): _*)
  }

  /** InfluxQL `fill()` — gap filling of a bucketed per-series frame
    * (`GROUP BY time(...), * fill(null|0|previous|linear)`; the query
    * family users of the reference run against the data it syncs).
    * Input: ONE row per (series, bucket) — i.e. the output of a
    * tumbling-window aggregate — with integral `bucketCol` ticks.
    * Output: one row per GRID tick from each series' first to last
    * bucket, all four fill flavors side by side plus an `is_gap` flag.
    *
    * Shape: gap rows are generated FORWARD from each actual row
    * (`lead` + `sequence` + `explode`) rather than by building a grid
    * frame and left-joining it back — so the whole family costs ONE
    * per-series window (already the aggregate's clustering) and zero
    * additional joins or shuffles, and each fill flavor is a pure
    * projection on the exploded row:
    *  - v_null:   the actual value, null on gap ticks (`fill(null)`);
    *  - v_zero:   `fill(0)`;
    *  - v_prev:   `fill(previous)` — a gap tick's previous actual IS
    *    the row that generated it, so no second window is needed;
    *  - v_linear: `fill(linear)` — the generating row also carries its
    *    `lead` neighbor, so interpolation is per-row arithmetic in a
    *    fixed operand order (bit-identical in any IEEE engine).
    * Leading/trailing edges match InfluxQL without an absolute range:
    * the grid spans [first, last] actual bucket per series, so no
    * edge extrapolation rows exist. Per-gap memory is bounded by the
    * widest single gap (sequence length), not series length. */
  def fillGaps(df: DataFrame, seriesCols: Seq[String], bucketCol: String,
      valueCol: String, stepTicks: Long): DataFrame = {
    require(stepTicks > 0, s"fillGaps needs stepTicks > 0, got $stepTicks")
    // the window runs on the NORMALIZED frame (bucket renamed to "b")
    // — ordering by the caller's bucketCol name only resolved when it
    // was literally "b"
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col("b"))
    val withNext = df.select(
        seriesCols.map(col)
          :+ col(bucketCol).cast("long").as("b")
          :+ col(valueCol).cast("double").as("v"): _*)
      .withColumn("nb", lead(col("b"), 1).over(w))
      .withColumn("nv", lead(col("v"), 1).over(w))
    // contract check (one comparison per row): a duplicate (series,
    // bucket) row would otherwise surface as sequence()'s obscure
    // 'Illegal sequence boundaries' mid-query — fail with the actual
    // contract instead
    // null-bucket rows are exempt: they sorted first, their sequence()
    // is null and explode drops them silently (pre-guard behavior) —
    // only a REAL duplicate (nb == b, both non-null) is a contract
    // violation
    // … and an off-grid neighbor (gap not a positive multiple of
    // stepTicks) would either hit sequence()'s raw boundary error
    // (0 < nb−b < step) or silently emit a misaligned grid — both are
    // the same contract violation, so the guard covers them too
    val checked = withNext.withColumn("nb",
      when(col("b").isNull || col("nb").isNull ||
          (col("nb") > col("b") &&
            (col("nb") - col("b")) % stepTicks === 0),
          col("nb"))
        .otherwise(raise_error(concat(lit("fillGaps: bucket "),
          col("nb").cast("string"), lit(" after "),
          col("b").cast("string"),
          lit(s" is off the $stepTicks-tick grid — input must be one"
            + " row per (series, bucket) with buckets aligned to"
            + " stepTicks")))))
    val exploded = checked.select(
      seriesCols.map(col) ++ Seq(col("b"), col("v"), col("nb"), col("nv"),
        explode(sequence(col("b"),
          coalesce(col("nb") - stepTicks, col("b")),
          lit(stepTicks))).as("t")): _*)
    val actual = when(col("t") === col("b"), col("v"))
    exploded.select(
      seriesCols.map(col) ++ Seq(
        col("t").as("t_tick"),
        (col("t") =!= col("b")).as("is_gap"),
        actual.as("v_null"),
        coalesce(actual, lit(0.0)).as("v_zero"),
        col("v").as("v_prev"),
        when(col("t") === col("b"), col("v")).otherwise(
          col("v") + (col("nv") - col("v")) *
            ((col("t") - col("b")).cast("double") /
              (col("nb") - col("b")).cast("double"))).as("v_linear")): _*)
  }

  /** [[fillGaps]] with an ABSOLUTE grid — true InfluxQL `GROUP BY
    * time(...) fill(...)` edge semantics for a time-bounded query:
    * the grid spans [startTick, endTickExclusive) for EVERY series
    * (InfluxQL emits every interval of the WHERE range), so leading
    * cells before a series' first actual and trailing cells after its
    * last exist too. Leading cells have no previous actual: v_prev
    * and v_linear are NULL there (InfluxQL leaves them null);
    * trailing cells carry the last actual forward for v_prev and
    * NULL for v_linear (nothing to interpolate toward) — exactly the
    * fillGaps trailing row shape.
    *
    * Shape: the interior + trailing cells come from the same
    * forward-generation trick as fillGaps (one per-series window,
    * zero joins); the leading cells come from ONE map-side-combined
    * per-series min aggregate over the (already bucket-sized) frame,
    * exploded and unioned — still no join against a grid frame.
    * Output rows per series = range/step (the InfluxQL contract), so
    * callers size ranges like InfluxQL users do. */
  def fillGapsRange(df: DataFrame, seriesCols: Seq[String],
      bucketCol: String, valueCol: String, stepTicks: Long,
      startTick: Long, endTickExclusive: Long): DataFrame = {
    require(stepTicks > 0, s"stepTicks must be positive: $stepTicks")
    require(endTickExclusive > startTick,
      s"empty range: [$startTick, $endTickExclusive)")
    val lastGrid = startTick +
      ((endTickExclusive - 1 - startTick) / stepTicks) * stepTicks
    val base = df.select(
      seriesCols.map(col)
        :+ col(bucketCol).cast("long").as("b")
        :+ col(valueCol).cast("double").as("v"): _*)
      // contract: aligned to THIS grid and inside the range — an
      // out-of-range bucket would silently vanish from the fill
      .withColumn("b",
        when(col("b").isNull ||
            (col("b") >= startTick && col("b") <= lastGrid &&
              (col("b") - startTick) % stepTicks === 0), col("b"))
          .otherwise(raise_error(concat(
            lit("fillGapsRange: bucket "), col("b").cast("string"),
            lit(s" off the [$startTick, $endTickExclusive) grid at " +
              s"step $stepTicks")))))
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col("b"))
    val withNext = base
      .withColumn("nb", lead(col("b"), 1).over(w))
      .withColumn("nv", lead(col("v"), 1).over(w))
    val mainRows = withNext.select(
      seriesCols.map(col) ++ Seq(col("b"), col("v"), col("nb"), col("nv"),
        explode(sequence(col("b"),
          coalesce(col("nb") - stepTicks, lit(lastGrid)),
          lit(stepTicks))).as("t")): _*)
    // leading cells: one synthetic generator row per series whose
    // first actual sits after the grid start — b/v NULL (no previous
    // actual), neighbor = the first actual (unused by the null/zero
    // flavors; keeps one shared flavor projection below)
    val heads = base.groupBy(seriesCols.map(col): _*)
      .agg(min(struct(col("b"), col("v"))).as("f"))
      .filter(col("f.b") > startTick)
      .select(seriesCols.map(col) ++ Seq(
        lit(null).cast("long").as("b"), lit(null).cast("double").as("v"),
        col("f.b").as("nb"), col("f.v").as("nv"),
        explode(sequence(lit(startTick), col("f.b") - stepTicks,
          lit(stepTicks))).as("t")): _*)
    val actual = when(col("t") === col("b"), col("v"))
    mainRows.unionAll(heads).select(
      seriesCols.map(col) ++ Seq(
        col("t").as("t_tick"),
        coalesce(col("t") =!= col("b"), lit(true)).as("is_gap"),
        actual.as("v_null"),
        coalesce(actual, lit(0.0)).as("v_zero"),
        col("v").as("v_prev"),
        when(col("t") === col("b"), col("v")).otherwise(
          col("v") + (col("nv") - col("v")) *
            ((col("t") - col("b")).cast("double") /
              (col("nb") - col("b")).cast("double"))).as("v_linear")): _*)
  }

  /** InfluxQL `TOP(field, N)` / `BOTTOM(field, N)` selectors, per
    * series: rank 1..k by value DESC (top) / ASC (bottom), timestamp-
    * style ties broken by `idCol` ASC — via the bounded-heap
    * [[graft.functions.TopKAgg]], NOT a row_number window, so every
    * input partition contributes at most O(k) pre-ranked rows per
    * series to the shuffle (the window form would sort each whole
    * series on one reducer — the same single-reducer trap the ANN rank
    * stage had). BOTTOM negates the score (exact for IEEE doubles;
    * Double.compare's -0.0 < 0.0 stays consistent under negation).
    * Output: (series..., sel, rank, id) — sel ∈ {"top", "bottom"}. */
  def topBottom(df: DataFrame, seriesCols: Seq[String], valueCol: String,
      idCol: String, k: Int): DataFrame = {
    // ONE scan + ONE exchange: both bounded heaps ride the same
    // groupBy (separate per-selector aggregations would scan and
    // shuffle the input twice for identical grouping)
    val agged = df
      // null field values are unrankable and would crash the typed
      // (score, id) buffer — excluded, matching InfluxQL's treatment
      // of null fields
      .where(col(valueCol).isNotNull)
      .groupBy(seriesCols.map(col): _*)
      .agg(TopKAgg.topK(k)(col(valueCol), col(idCol).cast("long"))
          .as("tk_top"),
        TopKAgg.topK(k)(negate(col(valueCol)), col(idCol).cast("long"))
          .as("tk_bot"))
    def sel(items: String, label: String): DataFrame = agged
      .select(seriesCols.map(col)
        :+ lit(label).as("sel") :+ posexplode(col(items)): _*)
      .select(seriesCols.map(col) ++ Seq(col("sel"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol)): _*)
    sel("tk_top.items", "top").unionAll(sel("tk_bot.items", "bottom"))
  }

  /** InfluxQL SLIMIT/SOFFSET: keep only the series ranked
    * (soffset, soffset + slimit] in series-key order — series
    * pagination, the other LIMIT axis InfluxQL has that SQL doesn't.
    * Scale shape: TWO-PHASE ranking, no window anywhere — the page of
    * the distinct key set comes from `orderBy(keys).offset(soffset)
    * .limit(slimit)`, which plans as ONE TakeOrderedAndProject
    * (per-partition bounded top-(soffset+slimit) heaps, merge of heap
    * outputs only: Spark's built-in two-phase top-k, the same shape
    * TopKAgg gives the ANN rank stages; the offset is dropped at the
    * merge). Nothing ever concentrates the full key set on one task.
    * The kept keys broadcast back as a null-safe semi join — the data
    * frame itself never shuffles. */
  def seriesLimit(df: DataFrame, seriesCols: Seq[String], slimit: Int,
      soffset: Int = 0): DataFrame = {
    require(slimit > 0 && soffset >= 0,
      s"need slimit > 0, soffset >= 0; got $slimit, $soffset")
    val keys = seriesCols.map(col)
    // nulls-first ascending, matching the row_number form this
    // replaced; offset+limit plan as ONE TakeOrderedAndProject (the
    // distinct key set is ranked exactly once — no second execution
    // whose ordering could disagree, no set-difference pass)
    val kept = df.select(keys: _*).distinct()
      .orderBy(keys: _*).offset(soffset).limit(slimit)
      .select(seriesCols.map(c => col(c).as(s"__k_$c")): _*)
    // null-SAFE equality: a plain equi-join would silently drop a null
    // key's rows — shrinking the page and shifting pagination
    val cond = seriesCols.map(c => col(c) <=> col(s"__k_$c"))
      .reduce(_ && _)
    df.join(broadcast(kept), cond, "left_semi")
  }

  /** Time-series similarity search (the EDBT'19 streaming-similarity
    * setting re-expressed relationally): rank every series by Pearson
    * correlation against one TARGET series, both on a shared bucket
    * grid. Correlation over z-normalized per-bucket aggregates is the
    * standard shape-similarity measure the literature normalizes to
    * (and what corr() computes directly — the normalization cancels in
    * the ratio); DTW-class measures are quadratic per pair and
    * sequential, the wrong cost model for a corpus-wide scan.
    *
    * Scale shape: the target's bucket vector is BUCKET-COUNT-sized
    * (bounded by range/interval) → broadcast; every other series joins
    * it bucket-wise with zero shuffle on the probe side, and corr()
    * partial-aggregates map-side — ONE exchange on the series key for
    * the final merge, however many series exist. Series with undefined
    * correlation (fewer than 2 shared buckets, or zero variance on
    * either side) are dropped — NaN/NULL semantics differ across
    * engines, defined values don't.
    *
    * Input: one row per (series, bucket) with an aggregated value.
    * Output: (series…, n_shared, corr) for series ≠ target. */
  def correlatedSeries(df: DataFrame, seriesCols: Seq[String],
      bucketCol: String, valueCol: String,
      target: Map[String, String]): DataFrame = {
    require(target.keySet == seriesCols.toSet,
      s"target must bind every series column: $seriesCols")
    val isTarget = seriesCols
      .map(c => col(c) === lit(target(c))).reduce(_ && _)
    val t = broadcast(df.filter(isTarget)
      .select(col(bucketCol).as("__b"), col(valueCol).as("__tv")))
    // explicit Pearson moments, NOT the corr() builtin: under ANSI mode
    // (Spark 4 default) corr THROWS DIVIDE_BY_ZERO while aggregating a
    // zero-variance group; the guarded ratio makes degenerate series a
    // null (dropped below) instead of a query-killing exception
    val n = col("__n").cast("double")
    val num = n * col("__sxy") - col("__sx") * col("__sy")
    val den = sqrt((n * col("__sxx") - col("__sx") * col("__sx")) *
      (n * col("__syy") - col("__sy") * col("__sy")))
    df.filter(!isTarget)
      .select(seriesCols.map(col) :+ col(bucketCol).as("__b")
        :+ col(valueCol).cast("double").as("__v"): _*)
      .join(t, "__b")
      .groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col("__v")).as("__sx"), sum(col("__tv")).as("__sy"),
        sum(col("__v") * col("__v")).as("__sxx"),
        sum(col("__tv") * col("__tv")).as("__syy"),
        sum(col("__v") * col("__tv")).as("__sxy"))
      .select(seriesCols.map(col) ++ Seq(col("__n").as("n_shared"),
        when(den > 0, num / den).as("corr")): _*)
      .filter(col("corr").isNotNull && !isnan(col("corr")))
  }

  /** One (bucket, value) point of a series; also the output shape
    * (bucket, ema). */
  case class BV(b: Long, v: Double)
  /** Ema buffer/output wrapper (product-encodable). */
  case class EmaItems(items: Seq[BV])

  /** Sequential-recursion fold per series: collect the series' points,
    * sort by bucket, fold ema₁ = v₁; emaᵢ = α·vᵢ + (1−α)·emaᵢ₋₁.
    * Per-group state is the series' POINT LIST — safe only because the
    * contract bounds it (see [[ema]]). */
  class EmaAggregator(alpha: Double)
      extends Aggregator[BV, EmaItems, EmaItems] {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    override def zero: EmaItems = EmaItems(Nil)
    override def reduce(b: EmaItems, a: BV): EmaItems =
      EmaItems(a +: b.items)
    override def merge(a: EmaItems, b: EmaItems): EmaItems =
      EmaItems(a.items ++ b.items)
    override def finish(r: EmaItems): EmaItems = {
      val sorted = r.items.sortBy(p => (p.b, p.v))
      if (sorted.isEmpty) EmaItems(Nil)
      else {
        var e = sorted.head.v
        val out = Seq.newBuilder[BV]
        out += BV(sorted.head.b, e)
        sorted.tail.foreach { p =>
          e = alpha * p.v + (1 - alpha) * e
          out += BV(p.b, e)
        }
        EmaItems(out.result())
      }
    }
    override def bufferEncoder: Encoder[EmaItems] =
      Encoders.product[EmaItems]
    override def outputEncoder: Encoder[EmaItems] =
      Encoders.product[EmaItems]
  }

  /** InfluxQL `EXPONENTIAL_MOVING_AVERAGE(value, …)` over a BUCKETED
    * per-series frame (the output of a `GROUP BY time(...)` aggregate,
    * one row per (series, bucket)): emaᵢ = α·vᵢ + (1−α)·emaᵢ₋₁, seeded
    * with the first bucket's value. EMA is inherently sequential (each
    * output depends on the previous — no window frame expresses the
    * recursion, and the closed-form (1−α)^(i−j) rewrite overflows for
    * long series), so it runs as a per-series collect-sort-fold
    * aggregate. Per-series state is the BUCKET list — bounded by the
    * time range / interval exactly as in InfluxQL, where these
    * functions apply to `GROUP BY time()` output, NOT raw points;
    * series themselves are unbounded in number and aggregate in
    * parallel. The fold is one fused-order IEEE chain, reproducible by
    * any engine that can express the recursion (the oracle is a DuckDB
    * recursive CTE). Output: (series…, bucketCol, ema). */
  def ema(df: DataFrame, seriesCols: Seq[String], bucketCol: String,
      valueCol: String, alpha: Double): DataFrame = {
    val agg = udaf(new EmaAggregator(alpha), Encoders.product[BV])
    df.groupBy(seriesCols.map(col): _*)
      .agg(agg(col(bucketCol).cast("long"),
        col(valueCol).cast("double")).as("e"))
      .select(seriesCols.map(col) :+ explode(col("e.items")).as("it"): _*)
      .select(seriesCols.map(col) ++ Seq(
        col("it.b").as(bucketCol), col("it.v").as("ema")): _*)
  }

  /** One (bucket, value) point in fixed-point integer units. */
  case class BVL(b: Long, v: Long)
  /** Fixed-point ema buffer/output wrapper (product-encodable). */
  case class EmaFixedItems(items: Seq[BVL])

  /** Fixed-point EMA fold with rational α = num/den over integer-unit
    * values: e₁ = v₁; eᵢ = (num·vᵢ + (den−num)·eᵢ₋₁ + den/2) / den,
    * with `/` the JVM's truncate-toward-zero Long division. The +den/2
    * offset makes the step round-half-up for the non-negative values
    * the micro-unit contract feeds it. EVERY step is exact 64-bit
    * integer arithmetic — no floating point anywhere in the recursion —
    * so any engine that can express the same integer recurrence (DuckDB
    * `//` also truncates toward zero: `SELECT (-7)//4` = -1) reproduces
    * it BIT-identically, however long the chain. This is the
    * cross-engine-deterministic form of [[EmaAggregator]]: the float
    * fold accumulates ~1-ulp-per-step divergence against engines that
    * contract a·x+b·y to fused multiply-add, which over sf0.1-length
    * recurrences crosses decimal rounding boundaries on isolated rows
    * (measured ~1 in 3k); integers cannot drift. */
  class EmaFixedAggregator(num: Long, den: Long)
      extends Aggregator[BVL, EmaFixedItems, EmaFixedItems] {
    require(den > 0 && num > 0 && num <= den,
      s"need 0 < num <= den, got $num/$den")
    override def zero: EmaFixedItems = EmaFixedItems(Nil)
    override def reduce(b: EmaFixedItems, a: BVL): EmaFixedItems =
      EmaFixedItems(a +: b.items)
    override def merge(a: EmaFixedItems, b: EmaFixedItems): EmaFixedItems =
      EmaFixedItems(a.items ++ b.items)
    override def finish(r: EmaFixedItems): EmaFixedItems = {
      val sorted = r.items.sortBy(p => (p.b, p.v))
      if (sorted.isEmpty) EmaFixedItems(Nil)
      else {
        var e = sorted.head.v
        val out = Seq.newBuilder[BVL]
        out += BVL(sorted.head.b, e)
        sorted.tail.foreach { p =>
          e = (num * p.v + (den - num) * e + den / 2) / den
          out += BVL(p.b, e)
        }
        EmaFixedItems(out.result())
      }
    }
    override def bufferEncoder: Encoder[EmaFixedItems] =
      Encoders.product[EmaFixedItems]
    override def outputEncoder: Encoder[EmaFixedItems] =
      Encoders.product[EmaFixedItems]
  }

  /** [[ema]] in exact fixed-point integer units (callers scale doubles
    * to micro-units first: `round(v*1e6, 0).cast("long")`). Same
    * scale/contract shape as [[ema]] — per-series state is the bucket
    * list, series fold in parallel — but the recursion is pure Long
    * arithmetic, bit-reproducible by any engine (see
    * [[EmaFixedAggregator]]). Output: (series…, bucketCol, ema: Long). */
  def emaFixed(df: DataFrame, seriesCols: Seq[String], bucketCol: String,
      valueCol: String, num: Long, den: Long): DataFrame = {
    val agg = udaf(new EmaFixedAggregator(num, den), Encoders.product[BVL])
    df.groupBy(seriesCols.map(col): _*)
      .agg(agg(col(bucketCol).cast("long"),
        col(valueCol).cast("long")).as("e"))
      .select(seriesCols.map(col) :+ explode(col("e.items")).as("it"): _*)
      .select(seriesCols.map(col) ++ Seq(
        col("it.b").as(bucketCol), col("it.v").as("ema")): _*)
  }

  /** One Holt output point: bucket, level, trend, one-step forecast. */
  case class BLTF(b: Long, l: Long, t: Long, f: Long)
  /** Holt output wrapper (product-encodable). */
  case class HoltItems(items: Seq[BLTF])

  /** Fixed-point Holt linear-trend (double exponential) smoothing with
    * rational α = aNum/aDen, β = bNum/bDen over integer-unit values —
    * the deterministic per-series core of InfluxQL's HOLT_WINTERS
    * (without the seasonal term and without its Nelder-Mead parameter
    * fit: parameters here are caller-fixed rationals). Seeds l₁ = v₁,
    * t₁ = 0; then with s = lᵢ₋₁ + tᵢ₋₁:
    *
    *   lᵢ = (aNum·vᵢ + (aDen−aNum)·s  + aDen/2) / aDen
    *   tᵢ = (bNum·(lᵢ−lᵢ₋₁) + (bDen−bNum)·tᵢ₋₁ + bDen/2) / bDen
    *
    * with `/` truncate-toward-zero Long division (JVM `/` ≡ DuckDB
    * `//`, verified on negatives: (-7)//4 = -1 in both). The +den/2
    * offset rounds half-up for non-negative numerators; for negative
    * numerators (a falling trend) the truncation makes the step
    * round-half-toward-zero instead — asymmetric, but the SAME
    * asymmetry in any engine running this integer recursion, which is
    * the contract that matters (see [[EmaFixedAggregator]]: float
    * recurrences drift ~1 ulp/step under FMA contraction; integers
    * cannot). The one-step-ahead forecast fᵢ = lᵢ + tᵢ predicts bucket
    * i+1. Same state shape as [[emaFixed]]: per-series bucket list,
    * series fold in parallel. */
  class HoltFixedAggregator(aNum: Long, aDen: Long, bNum: Long,
      bDen: Long) extends Aggregator[BVL, EmaFixedItems, HoltItems] {
    require(aDen > 0 && aNum > 0 && aNum <= aDen,
      s"need 0 < aNum <= aDen, got $aNum/$aDen")
    require(bDen > 0 && bNum > 0 && bNum <= bDen,
      s"need 0 < bNum <= bDen, got $bNum/$bDen")
    override def zero: EmaFixedItems = EmaFixedItems(Nil)
    override def reduce(b: EmaFixedItems, a: BVL): EmaFixedItems =
      EmaFixedItems(a +: b.items)
    override def merge(a: EmaFixedItems, b: EmaFixedItems): EmaFixedItems =
      EmaFixedItems(a.items ++ b.items)
    override def finish(r: EmaFixedItems): HoltItems = {
      val sorted = r.items.sortBy(p => (p.b, p.v))
      if (sorted.isEmpty) HoltItems(Nil)
      else {
        var l = sorted.head.v
        var t = 0L
        val out = Seq.newBuilder[BLTF]
        out += BLTF(sorted.head.b, l, t, l + t)
        sorted.tail.foreach { p =>
          val s = l + t
          val l2 = (aNum * p.v + (aDen - aNum) * s + aDen / 2) / aDen
          t = (bNum * (l2 - l) + (bDen - bNum) * t + bDen / 2) / bDen
          l = l2
          out += BLTF(p.b, l, t, l + t)
        }
        HoltItems(out.result())
      }
    }
    override def bufferEncoder: Encoder[EmaFixedItems] =
      Encoders.product[EmaFixedItems]
    override def outputEncoder: Encoder[HoltItems] =
      Encoders.product[HoltItems]
  }

  /** [[HoltFixedAggregator]] as a frame transform — callers scale
    * doubles to integer units first (micro-unit contract, as
    * [[emaFixed]]). Output: (series…, bucketCol, level, trend,
    * forecast: Long), forecast = the NEXT bucket's prediction. */
  def holtFixed(df: DataFrame, seriesCols: Seq[String], bucketCol: String,
      valueCol: String, aNum: Long, aDen: Long, bNum: Long,
      bDen: Long): DataFrame = {
    val agg = udaf(new HoltFixedAggregator(aNum, aDen, bNum, bDen),
      Encoders.product[BVL])
    df.groupBy(seriesCols.map(col): _*)
      .agg(agg(col(bucketCol).cast("long"),
        col(valueCol).cast("long")).as("e"))
      .select(seriesCols.map(col) :+ explode(col("e.items")).as("it"): _*)
      .select(seriesCols.map(col) ++ Seq(
        col("it.b").as(bucketCol), col("it.l").as("level"),
        col("it.t").as("trend"), col("it.f").as("forecast")): _*)
  }

  /** One seasonal Holt-Winters output point: bucket, level, trend,
    * seasonal component, next-bucket forecast (all integer units). */
  case class BLTSF(b: Long, l: Long, t: Long, s: Long, f: Long)
  /** Seasonal Holt-Winters output wrapper (product-encodable). */
  case class HwItems(items: Seq[BLTSF])

  /** ADDITIVE SEASONAL Holt-Winters — the full InfluxQL HOLT_WINTERS
    * shape ([[HoltFixedAggregator]] is its deseasonalized core) with
    * fixed rational α, β, γ in place of the reference's Nelder-Mead
    * fit, in exact integer units throughout. Seasonal state is a ring
    * of `season` Longs, zero-seeded (the first cycle learns components
    * from the level residuals — a documented, SQL-reproducible
    * convention; InfluxQL seeds from a first-cycle average, which
    * needs a second pass):
    *
    *   slot  = (i−1) mod m          sPrev = seas(slot)
    *   lᵢ    = (aNum·(vᵢ − sPrev) + (aDen−aNum)·(l+t) + aDen/2) / aDen
    *   tᵢ    = (bNum·(lᵢ − l) + (bDen−bNum)·t + bDen/2) / bDen
    *   sᵢ    = (gNum·(vᵢ − lᵢ) + (gDen−gNum)·sPrev + gDen/2) / gDen
    *   seas(slot) := sᵢ;   forecast = lᵢ + tᵢ + seas(i mod m)
    *
    * Every step is truncate-toward-zero Long division (JVM `/` ≡
    * DuckDB `//`) — bit-reproducible cross-engine at any chain length
    * like the other fixed-point folds. The forecast's seasonal term is
    * by construction the sᵢ emitted m−1 points earlier (or 0 in the
    * first cycle), so a SQL oracle needs only `lag(s, m−1)` AFTER the
    * (l, t, seas-list) recursion — it never reconstructs the ring. */
  class HoltWintersFixedAggregator(aNum: Long, aDen: Long, bNum: Long,
      bDen: Long, gNum: Long, gDen: Long, season: Int)
      extends Aggregator[BVL, EmaFixedItems, HwItems] {
    require(aDen > 0 && aNum > 0 && aNum <= aDen,
      s"need 0 < aNum <= aDen, got $aNum/$aDen")
    require(bDen > 0 && bNum > 0 && bNum <= bDen,
      s"need 0 < bNum <= bDen, got $bNum/$bDen")
    require(gDen > 0 && gNum > 0 && gNum <= gDen,
      s"need 0 < gNum <= gDen, got $gNum/$gDen")
    require(season >= 2, s"season must be >= 2: $season")
    override def zero: EmaFixedItems = EmaFixedItems(Nil)
    override def reduce(b: EmaFixedItems, a: BVL): EmaFixedItems =
      EmaFixedItems(a +: b.items)
    override def merge(a: EmaFixedItems, b: EmaFixedItems): EmaFixedItems =
      EmaFixedItems(a.items ++ b.items)
    override def finish(r: EmaFixedItems): HwItems = {
      val sorted = r.items.sortBy(p => (p.b, p.v))
      if (sorted.isEmpty) HwItems(Nil)
      else {
        val seas = Array.fill(season)(0L)
        var l = sorted.head.v
        var t = 0L
        val out = Seq.newBuilder[BLTSF]
        out += BLTSF(sorted.head.b, l, t, 0L, l + t + seas(1 % season))
        var i = 2
        sorted.tail.foreach { p =>
          val slot = (i - 1) % season
          val sPrev = seas(slot)
          val sm = l + t
          val l2 =
            (aNum * (p.v - sPrev) + (aDen - aNum) * sm + aDen / 2) / aDen
          t = (bNum * (l2 - l) + (bDen - bNum) * t + bDen / 2) / bDen
          val sNew =
            (gNum * (p.v - l2) + (gDen - gNum) * sPrev + gDen / 2) / gDen
          seas(slot) = sNew
          l = l2
          out += BLTSF(p.b, l, t, sNew, l + t + seas(i % season))
          i += 1
        }
        HwItems(out.result())
      }
    }
    override def bufferEncoder: Encoder[EmaFixedItems] =
      Encoders.product[EmaFixedItems]
    override def outputEncoder: Encoder[HwItems] =
      Encoders.product[HwItems]
  }

  /** [[HoltWintersFixedAggregator]] as a frame transform (micro-unit
    * contract, as [[holtFixed]]). Output: (series…, bucketCol, level,
    * trend, seasonal, forecast: Long), forecast = the NEXT bucket's
    * prediction including its seasonal component. */
  def holtWintersFixed(df: DataFrame, seriesCols: Seq[String],
      bucketCol: String, valueCol: String, aNum: Long, aDen: Long,
      bNum: Long, bDen: Long, gNum: Long, gDen: Long,
      season: Int): DataFrame = {
    val agg = udaf(new HoltWintersFixedAggregator(aNum, aDen, bNum, bDen,
      gNum, gDen, season), Encoders.product[BVL])
    df.groupBy(seriesCols.map(col): _*)
      .agg(agg(col(bucketCol).cast("long"),
        col(valueCol).cast("long")).as("e"))
      .select(seriesCols.map(col) :+ explode(col("e.items")).as("it"): _*)
      .select(seriesCols.map(col) ++ Seq(
        col("it.b").as(bucketCol), col("it.l").as("level"),
        col("it.t").as("trend"), col("it.s").as("seasonal"),
        col("it.f").as("forecast")): _*)
  }

  /** Rolling z-score anomaly detection over per-series bucket values —
    * each point is scored against the mean/stddev of its own series'
    * `lookback` PRIOR buckets (the current point never contaminates
    * its own baseline). Inputs are exact integer units (the callers'
    * fixed-point bucket-mean contract, same as [[emaFixed]]); the
    * window statistics (count, sum, sum-of-squares) are then exact
    * Long arithmetic in any accumulation order, and the anomaly test
    * itself never leaves integer space:
    *
    *   z > σ  ⇔  (v·n − Σv)² > σ²·(n·Σv² − (Σv)²)
    *
    * so the flag is bit-deterministic cross-engine at any chain length
    * (the round-6 sf0.1 lesson: float window sums drift under FMA
    * contraction). The reported `z` is the single IEEE expression
    * D/√V over those exact integers — one cast, one sqrt, one divide,
    * each correctly rounded, hence bit-identical in any engine — and
    * is deliberately NOT decimal-rounded (`round(double, s)` half-up
    * disagrees across engines even on identical doubles; see
    * ts_momentum's note). Null until `minPrior` history accumulates
    * and when the baseline is flat (V = 0); a nonzero deviation off a
    * flat baseline still flags (D² > σ²·0).
    *
    * Scale shape: ONE window spec (partition by series, order by
    * bucket) carries all three statistics — a single Exchange + Sort +
    * Window over series-clustered data, no self-join, no global sort.
    * Long-safety: |v| ≤ 10⁶ units with lookback ≤ 10³ keeps
    * σ²·(n·Σv² − (Σv)²) < 2⁶³ (registry use: cent units, lookback 24).
    *
    * @param lookback prior-bucket window size in POINTS
    * @param minPrior minimum prior buckets before scoring (else null)
    * @param sigma    integer z threshold for the flag */
  def rollingAnomalies(df: DataFrame, seriesCols: Seq[String],
      bucketCol: String, valueCol: String, lookback: Int = 24,
      minPrior: Int = 12, sigma: Int = 3): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2: $lookback")
    require(minPrior >= 2 && minPrior <= lookback,
      s"need 2 <= minPrior <= lookback: $minPrior/$lookback")
    require(sigma >= 1, s"sigma must be >= 1: $sigma")
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col(bucketCol))
      .rowsBetween(-lookback, -1)
    val v = col(valueCol)
    val stats = df.select(seriesCols.map(col) ++ Seq(col(bucketCol), v,
      count(v).over(w).as("n_prior"),
      sum(v).over(w).as("sm"),
      sum(v * v).over(w).as("ssq")): _*)
    val d = v * col("n_prior") - col("sm")
    val vv = col("n_prior") * col("ssq") - col("sm") * col("sm")
    val eligible = col("n_prior") >= minPrior
    stats.select(seriesCols.map(col) ++ Seq(col(bucketCol), v,
      col("n_prior"),
      when(eligible && vv > 0,
        d.cast("double") / sqrt(vv.cast("double"))).as("z"),
      (eligible && d * d > lit(sigma.toLong * sigma) * vv)
        .as("is_anomaly")): _*)
  }

  /** One CUSUM output point: bucket, value, the two one-sided sums. */
  case class CusumPt(b: Long, v: Long, sp: Long, sn: Long)
  /** CUSUM output wrapper (product-encodable). */
  case class CusumItems(items: Seq[CusumPt])

  /** Tabular CUSUM fold (change-point detection) in EXACT integer
    * units: target = the series' first bucket value (the EMA seeding
    * convention), drift allowance k, and
    * S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (vᵢ − target − k)),
    * S⁻ᵢ = max(0, S⁻ᵢ₋₁ + (target − vᵢ − k)).
    * Pure Long arithmetic — bit-reproducible by any engine that can
    * express the recurrence (the oracle is a DuckDB recursive CTE),
    * the [[EmaFixedAggregator]] discipline. */
  class CusumAggregator(drift: Long)
      extends Aggregator[BVL, EmaFixedItems, CusumItems] {
    require(drift >= 0, s"drift allowance must be >= 0: $drift")
    override def zero: EmaFixedItems = EmaFixedItems(Nil)
    override def reduce(b: EmaFixedItems, a: BVL): EmaFixedItems =
      EmaFixedItems(a +: b.items)
    override def merge(a: EmaFixedItems, b: EmaFixedItems): EmaFixedItems =
      EmaFixedItems(a.items ++ b.items)
    override def finish(r: EmaFixedItems): CusumItems = {
      val sorted = r.items.sortBy(p => (p.b, p.v))
      if (sorted.isEmpty) CusumItems(Nil)
      else {
        val target = sorted.head.v
        var sp = 0L
        var sn = 0L
        val out = Seq.newBuilder[CusumPt]
        sorted.foreach { p =>
          sp = math.max(0L, sp + (p.v - target - drift))
          sn = math.max(0L, sn + (target - p.v - drift))
          out += CusumPt(p.b, p.v, sp, sn)
        }
        CusumItems(out.result())
      }
    }
    override def bufferEncoder: Encoder[EmaFixedItems] =
      Encoders.product[EmaFixedItems]
    override def outputEncoder: Encoder[CusumItems] =
      Encoders.product[CusumItems]
  }

  /** Change-point detection over a BUCKETED per-series frame via
    * tabular CUSUM (see [[CusumAggregator]]): one-sided positive and
    * negative cumulative deviations from the series' first value with
    * drift allowance `drift`, alarmed where they exceed `threshold` —
    * level-shift detection that a rolling z-score misses (the shift
    * inflates the rolling σ and hides itself; CUSUM accumulates it).
    * Same bounded-state contract as [[emaFixed]]: per-series state is
    * the BUCKET list (GROUP BY time() output, never raw points).
    * Output: (series…, bucketCol, vc, s_pos, s_neg, alarm_pos,
    * alarm_neg). */
  def cusumFixed(df: DataFrame, seriesCols: Seq[String],
      bucketCol: String, valueCol: String, drift: Long,
      threshold: Long): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val agg = udaf(new CusumAggregator(drift), Encoders.product[BVL])
    df.groupBy(seriesCols.map(col): _*)
      .agg(agg(col(bucketCol).cast("long"),
        col(valueCol).cast("long")).as("e"))
      .select(seriesCols.map(col) :+ explode(col("e.items")).as("it"): _*)
      .select(seriesCols.map(col) ++ Seq(
        col("it.b").as(bucketCol), col("it.v").as("vc"),
        col("it.sp").as("s_pos"), col("it.sn").as("s_neg"),
        (col("it.sp") > threshold).as("alarm_pos"),
        (col("it.sn") > threshold).as("alarm_neg")): _*)
  }

  /** Mann–Kendall trend test over a BUCKETED per-series frame: the
    * nonparametric "is there a monotone trend" check (no distribution
    * assumption, robust to outliers — the audit before trusting a
    * linear fit). S = Σ_{i<j} sgn(vⱼ − vᵢ); variance with the tie
    * correction Var·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) kept ×18 so
    * it stays an exact Long; Z = (S − sgn(S)) / √(Var) is the one
    * rounded double.
    *
    * Scale contract: the pairwise join is per-series (b₁ < b₂ within
    * the key) over GROUP BY time() output — series length is bounded
    * by range/interval exactly as the EMA family documents, so the
    * quadratic term is (buckets)², never corpus². Series aggregate in
    * parallel.
    *
    * Output: (series…, n, s, var18, z DOUBLE rounded 4). */
  def mannKendall(df: DataFrame, seriesCols: Seq[String],
      bucketCol: String, centsCol: String): DataFrame = {
    val gc = seriesCols.map(col)
    val base = df.select(gc :+ col(bucketCol).cast("long").as("b") :+
      col(centsCol).cast("long").as("v"): _*)
    val pairs = base.as("a")
      .join(base.as("x"),
        seriesCols.map(c => col(s"a.$c") === col(s"x.$c"))
          .reduce(_ && _) && col("a.b") < col("x.b"))
      .select(seriesCols.map(c => col(s"a.$c")) :+
        signum(col("x.v") - col("a.v")).cast("long").as("sg"): _*)
    val sAgg = pairs.groupBy(gc: _*).agg(sum(col("sg")).as("s"))
    val ties = base.groupBy(gc :+ col("v"): _*)
      .agg(count(lit(1)).as("t"))
      .groupBy(gc: _*)
      .agg(sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .as("tie18"))
    ties.join(sAgg, seriesCols, "left_outer")
      .select(gc ++ Seq(col("n"),
        coalesce(col("s"), lit(0L)).as("s"),
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) -
          col("tie18")).as("var18")): _*)
      .withColumn("z",
        when(col("var18") > 0,
          round((col("s") - signum(col("s")).cast("long"))
            .cast("double") /
            sqrt(col("var18").cast("double") / 18.0), 4)))
  }

  /** Classical additive seasonal decomposition over a BUCKETED
    * per-series frame: value = trend + seasonal + residual. Trend is
    * the centered moving average over one full (ODD) period — defined
    * only where the window is complete, so series edges carry nulls,
    * never a biased partial mean; seasonal is the per-phase mean of
    * the detrended values; the residual is what remains.
    *
    * Determinism: inputs are integer units (cents); means are
    * FLOOR(sum/n) computed as floor(double division) on BOTH engines —
    * detrended values go negative, where Spark's `div` truncates
    * toward zero but SQL's `//` floors, so the explicit shared floor
    * form is the only cross-engine-exact choice (exact while
    * |sum| < 2⁵³, i.e. cent-sums below ~9·10¹⁵ per window/phase).
    *
    * Scale shape: one window per series (partition-bounded), then a
    * (series, phase)-keyed aggregate whose frame is series × period —
    * never the corpus.
    *
    * Output: (series…, bucket, vc, trend, seasonal, resid). */
  def seasonalDecompose(df: DataFrame, seriesCols: Seq[String],
      bucketCol: String, centsCol: String, period: Int): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd and >= 3 (centered MA): $period")
    val sc = seriesCols.map(col)
    val half = period / 2
    val w = Window.partitionBy(sc: _*).orderBy(col(bucketCol))
      .rowsBetween(-half, half)
    def floorMean(sum: Column, n: Column): Column =
      floor(sum.cast("double") / n).cast("long")
    val withTrend = df
      .select(sc ++ Seq(col(bucketCol).cast("long").as("b"),
        col(centsCol).cast("long").as("vc")): _*)
      .withColumn("trend",
        when(count(col("vc")).over(w) === period,
          floorMean(sum(col("vc")).over(w), lit(period))))
      .withColumn("detr", col("vc") - col("trend"))
    val seasonal = withTrend.filter(col("detr").isNotNull)
      .groupBy(sc :+ pmod(col("b"), lit(period.toLong)).as("phase"): _*)
      .agg(floorMean(sum(col("detr")), count(lit(1))).as("seasonal"))
    withTrend
      .withColumn("phase", pmod(col("b"), lit(period.toLong)))
      // left join: a series too short for ANY complete window keeps
      // its rows with null seasonal/resid rather than vanishing
      .join(seasonal, seriesCols :+ "phase", "left_outer")
      .select(sc ++ Seq(col("b"), col("vc"), col("trend"),
        col("seasonal"),
        (col("detr") - col("seasonal")).as("resid")): _*)
  }

  /** Wald–Wolfowitz runs test per series: is the sequence of
    * above/below-median excursions random, or does it cluster
    * (trend/regime) or alternate (over-correction)? The randomness
    * screen beside ts_mk_trend's monotone test and stats_benford's
    * digit audit. Median = exact per-series order statistic on the
    * value-domain frame (winsorizedStats discipline); ties AT the
    * median drop (the classic treatment); runs/N₁/N₂ are exact Longs
    * from one lag window; E[R] = 1 + 2N₁N₂/N and
    * Var·N²(N−1) = 2N₁N₂(2N₁N₂−N) combine in fixed-order DOUBLE,
    * z rounded 4 (NULL when either side is empty or Var = 0).
    *
    * Output: (series…, n, n_above, n_below, n_runs, z_r). */
  def runsTest(df: DataFrame, seriesCols: Seq[String],
      bucketCol: String, centsCol: String): DataFrame = {
    val gc = seriesCols.map(col)
    val base = df.select(gc :+ col(bucketCol).cast("long").as("b") :+
      col(centsCol).cast("long").as("v"): _*)
    val wOrd = Window.partitionBy(gc: _*).orderBy(col("v"))
    val wAll = Window.partitionBy(gc: _*)
    val med = base.groupBy(gc :+ col("v"): _*)
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("n0", sum(col("c")).over(wAll))
      .groupBy(gc: _*)
      .agg(min(when(col("cum") >= expr("(n0 + 1) div 2"), col("v")))
        .as("median_v"))
    val signs = base.join(broadcast(med), seriesCols)
      .filter(col("v") =!= col("median_v"))
      .withColumn("s", when(col("v") > col("median_v"), 1L)
        .otherwise(0L))
      .withColumn("flip",
        when(lag(col("s"), 1).over(
          Window.partitionBy(gc: _*).orderBy(col("b"))).isNull, 1L)
          .when(lag(col("s"), 1).over(
            Window.partitionBy(gc: _*).orderBy(col("b"))) =!=
            col("s"), 1L)
          .otherwise(0L))
    val sums = signs.groupBy(gc: _*)
      .agg(count(lit(1)).as("n"), sum(col("s")).as("n_above"),
        (count(lit(1)) - sum(col("s"))).as("n_below"),
        sum(col("flip")).as("n_runs"))
    def d(c: String) = col(c).cast("double")
    val two = lit(2.0) * d("n_above") * d("n_below")
    val er = lit(1.0) + two / d("n")
    val vr = two * (two - d("n")) /
      (d("n") * d("n") * (d("n") - lit(1.0)))
    sums.select(gc ++ Seq(col("n"), col("n_above"), col("n_below"),
      col("n_runs"),
      when(col("n_above") > 0 && col("n_below") > 0 && vr > 0,
        round((d("n_runs") - er) / sqrt(vr), 4)).as("z_r")): _*)
  }

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson's LTTB,
    * the dashboard decimation standard — Grafana/TSDB UIs render
    * thousands of points from millions with visual extrema kept).
    * Per series: first and last points always survive; the interior
    * splits into `threshold−2` equal index buckets and each bucket
    * keeps the point maximizing the triangle area against the
    * PREVIOUSLY selected point and the NEXT bucket's average — a
    * sequential greedy with lookahead, which is why this is an
    * aggregator fold (the EMA-family per-series buffer contract:
    * series bounded by range/interval) and the registry entry is
    * rows-only with a driver-side reference differential instead of
    * a SQL oracle. Unlike `ema` (fixed-size state) the buffer is
    * O(series length), so the contract is ENFORCED, not just
    * documented: the buffer tracks its count and the first point
    * past `maxSeriesLen` throws with a pre-bucket hint instead of
    * OOMing an executor.
    *
    * Determinism: areas compare as exact cross-multiplied integers
    * (2·area·denominators — no floating point in the argmax; bucket
    * coordinate sums accumulate as BigInt so µs-epoch buckets stay
    * exact at ANY bucket width), ties break to the earliest bucket
    * index, so the selection is identical under any partitioning.
    *
    * Output: (series…, b, v, sel_idx 0..threshold−1). */
  case class LttbItems(items: Seq[BVL])
  case class LttbBuf(n: Long, items: Seq[BVL])
  class LttbAggregator(threshold: Int, maxSeriesLen: Long = 1L << 20)
      extends Aggregator[BVL, LttbBuf, LttbItems] {
    require(threshold >= 3, s"threshold must be >= 3: $threshold")
    require(maxSeriesLen >= threshold,
      s"maxSeriesLen must be >= threshold: $maxSeriesLen")
    private def overflow(): Nothing = throw new IllegalStateException(
      s"lttb: series exceeds the $maxSeriesLen-point buffer " +
        "contract — pre-bucket (GROUP BY time()) to a coarser " +
        "interval before decimating")
    override def zero: LttbBuf = LttbBuf(0L, Nil)
    override def reduce(b: LttbBuf, a: BVL): LttbBuf = {
      if (b.n >= maxSeriesLen) overflow()
      LttbBuf(b.n + 1, a +: b.items)
    }
    override def merge(a: LttbBuf, b: LttbBuf): LttbBuf = {
      if (a.n + b.n > maxSeriesLen) overflow()
      LttbBuf(a.n + b.n, a.items ++ b.items)
    }
    override def finish(r: LttbBuf): LttbItems = {
      val pts = r.items.sortBy(p => (p.b, p.v)).toIndexedSeq
      val n = pts.size
      if (n <= threshold) LttbItems(pts)
      else {
        val out = Seq.newBuilder[BVL]
        out += pts.head
        var prev = pts.head
        val inner = threshold - 2
        // bucket i covers interior indices [1 + i·(n−2)/inner, …)
        def bound(i: Int): Int = 1 + (i.toLong * (n - 2) / inner).toInt
        var i = 0
        while (i < inner) {
          val (lo, hi) = (bound(i), bound(i + 1))
          val (nLo, nHi) =
            if (i + 1 < inner) (bound(i + 1), bound(i + 2))
            else (n - 1, n) // last interior bucket looks at the tail
          // next-bucket average, exact rationals: (Σb/|…|, Σv/|…|) —
          // BigInt sums: a µs-epoch coordinate is ~1.7e15, so ≳5k
          // points per bucket would overflow a raw Long sum
          val cnt = BigInt(nHi - nLo)
          var sb = BigInt(0); var sv = BigInt(0)
          var jj = nLo
          while (jj < nHi) { sb += pts(jj).b; sv += pts(jj).v; jj += 1 }
          // area argmax via cross-multiplied exact integers:
          // 2A·cnt = |(pb−ab)·(cv−av·cnt/cnt)…| — fold cnt in:
          // 2A·cnt = |(prev.b−p.b)·(sv−cnt·prev.v)
          //          −(prev.b−sb/cnt…)| → multiply through by cnt:
          // score(p) = |(prev.b−p.b)·(sv−cnt·prev.v)
          //            −(prev.v−p.v)·(sb−cnt·prev.b)|
          var best = lo
          var bestScore = BigInt(-1)
          (lo until hi).foreach { j =>
            val p = pts(j)
            val s1 = BigInt(prev.b - p.b) * (sv - cnt * prev.v)
            val s2 = BigInt(prev.v - p.v) * (sb - cnt * prev.b)
            val score = (s1 - s2).abs
            if (score > bestScore) { bestScore = score; best = j }
          }
          out += pts(best)
          prev = pts(best)
          i += 1
        }
        out += pts.last
        LttbItems(out.result())
      }
    }
    override def bufferEncoder: Encoder[LttbBuf] =
      Encoders.product[LttbBuf]
    override def outputEncoder: Encoder[LttbItems] =
      Encoders.product[LttbItems]
  }

  /** [[LttbAggregator]] as a per-series operator: downsample each
    * series to ≤ `threshold` visually-representative points; series
    * longer than `maxSeriesLen` fail loudly (pre-bucket first). */
  def lttb(df: DataFrame, seriesCols: Seq[String], bucketCol: String,
      centsCol: String, threshold: Int,
      maxSeriesLen: Long = 1L << 20): DataFrame = {
    val agg = udaf(new LttbAggregator(threshold, maxSeriesLen),
      Encoders.product[BVL])
    df.groupBy(seriesCols.map(col): _*)
      .agg(agg(col(bucketCol).cast("long"),
        col(centsCol).cast("long")).as("e"))
      .select(seriesCols.map(col) :+ posexplode(col("e.items"))
        .as(Seq("sel_idx", "it")): _*)
      .select(seriesCols.map(col) ++ Seq(col("it.b").as(bucketCol),
        col("it.v").as("v"), col("sel_idx").cast("long")
          .as("sel_idx")): _*)
  }

  /** Lagged cross-correlation between two bucketed series: Pearson
    * r(ℓ) of (A_t, B_{t+ℓ}) for each lag ℓ ∈ [−maxLag, maxLag] — the
    * lead/lag discovery tool ("purchases follow clicks by 2 hours"
    * shows up as the argmax lag) behind every pair of KPIs on one
    * dashboard. ts_similar_series ranks WHICH series co-move; this
    * measures WHEN.
    *
    * Scale shape: both inputs are GROUP BY time() bucket frames
    * (range/interval-bounded, the EMA-family contract); the A side
    * fans out ×(2·maxLag+1) via one lag explode and equi-joins B on
    * the shifted bucket — no window, no cross join. All six Pearson
    * sums are exact Longs per lag; r is the corrMatrix fixed-order
    * IEEE combination rounded 4 (NULL when either side is constant
    * over the overlap).
    *
    * Output: (lag, n, r_r) — one row per lag with ≥ 2 overlapping
    * buckets. */
  def crossCorrelation(a: DataFrame, b: DataFrame, bucketCol: String,
      centsCol: String, bucketStep: Long, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 100,
      s"need 1 <= maxLag <= 100: $maxLag")
    require(bucketStep > 0, s"bucketStep must be positive: $bucketStep")
    val aa = a.select(col(bucketCol).cast("long").as("ba"),
      col(centsCol).cast("long").as("va"))
    val bb = b.select(col(bucketCol).cast("long").as("bb"),
      col(centsCol).cast("long").as("vb"))
    val lagged = aa
      .select(col("ba"), col("va"), explode(sequence(
        lit(-maxLag.toLong), lit(maxLag.toLong))).as("lag"))
      .withColumn("bt", col("ba") + col("lag") * lit(bucketStep))
    val sums = lagged.join(bb, col("bt") === col("bb"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("va")).as("sa"),
        sum(col("vb")).as("sb"),
        sum(col("va") * col("va")).as("qa"),
        sum(col("vb") * col("vb")).as("qb"),
        sum(col("va") * col("vb")).as("pab"))
    def d(c: String) = col(c).cast("double")
    val ca = d("n") * d("qa") - d("sa") * d("sa")
    val cb = d("n") * d("qb") - d("sb") * d("sb")
    sums.filter(col("n") >= 2)
      .select(col("lag"), col("n"),
        when(ca > 0 && cb > 0,
          round((d("n") * d("pab") - d("sa") * d("sb")) /
            (sqrt(ca) * sqrt(cb)), 4)).as("r_r"))
  }

  /** Pettitt change-point test over a bucketed per-series frame: the
    * rank-based LOCATION companion to [[mannKendall]] (MK says "a
    * monotone trend exists"; Pettitt says WHERE the level shifted,
    * with no distribution assumption). Uₜ = Σ_{i≤t} Σ_{j>t} sgn(vⱼ−vᵢ);
    * K = max|Uₜ|, the change point is the argmax, and the classic
    * approximation p ≈ 2·exp(−6K²/(n³+n²)) (clamped to 1) is the one
    * rounded double.
    *
    * Scale shape — O(n log n), never the O(n²) pair set: the
    * incremental identity Uₜ = Uₜ₋₁ + Vₜ with
    * Vₜ = (#values > vₜ) − (#values < vₜ) over the WHOLE series
    * (the j=t term is 0, so Vₜ = Σⱼ sgn(vⱼ−vₜ); telescoping against
    * the pair definition proves U exactly). Vₜ comes from the
    * per-series value-domain cumulative-frequency frame (the
    * gini/weightedMedian discipline): with c(v) the count of v and
    * cum_le(v) the running count ≤ v, V(v) = n − 2·cum_le(v) + c(v).
    * One groupBy to the frequency frame, one equi-join of the base
    * rows against it on (series, v), one per-series prefix-sum window
    * — O(n) shuffle rows, no self-join, bit-identical U. All exact
    * Longs.
    *
    * Output: (series…, n, k_stat, loc_b — bucket of the EARLIEST
    * argmax, NULL when n < 2 — p_r). */
  def pettitt(df: DataFrame, seriesCols: Seq[String],
      bucketCol: String, centsCol: String): DataFrame = {
    val gc = seriesCols.map(col)
    val base = df.select(gc :+ col(bucketCol).cast("long").as("b") :+
        col(centsCol).cast("long").as("v"): _*)
      .withColumn("rn", row_number().over(
        Window.partitionBy(gc: _*).orderBy(col("b"))).cast("long"))
    // value-domain frequency frame: V(v) = n − 2·cum_le(v) + c(v)
    val freq = base.groupBy(gc :+ col("v"): _*)
      .agg(count(lit(1)).as("c"))
      .withColumn("cum_le", sum(col("c")).over(
        Window.partitionBy(gc: _*).orderBy(col("v"))))
      .withColumn("ntot", sum(col("c")).over(
        Window.partitionBy(gc: _*)))
      .select(gc ++ Seq(col("v"),
        (col("ntot") - lit(2L) * col("cum_le") + col("c"))
          .as("vt")): _*)
    val u = base.join(freq, seriesCols :+ "v")
      .withColumn("u", sum(col("vt")).over(
        Window.partitionBy(gc: _*).orderBy(col("rn"))))
    val nn = base.groupBy(gc: _*).agg(count(lit(1)).as("n"))
    // K and the earliest argmax via one struct-min (max |u| ⇒ min of
    // (−|u|, t)); only t ≤ n−1 are candidate change points. The u
    // rows carry their bucket, so the argmax yields loc_b directly.
    val kk = u.join(nn, seriesCols)
      .filter(col("rn") < col("n"))
      .groupBy(gc: _*)
      .agg(max(abs(col("u"))).as("k_stat"),
        min(struct((-abs(col("u"))).as("nu"), col("rn").as("t"),
          col("b").as("lb"))).as("am"))
      .select(gc ++ Seq(col("k_stat"), col("am.lb").as("loc_b")): _*)
    nn.join(kk, seriesCols, "left_outer")
      .select(gc ++ Seq(col("n"),
        coalesce(col("k_stat"), lit(0L)).as("k_stat"), col("loc_b"),
        round(least(lit(1.0), lit(2.0) * exp(
          (lit(-6.0) * (coalesce(col("k_stat"), lit(0L)) *
            coalesce(col("k_stat"), lit(0L))).cast("double")) /
          (col("n") * col("n") * col("n") + col("n") * col("n"))
            .cast("double"))), 6).as("p_r")): _*)
  }

  /** BOUNDED Theil–Sen robust trend slope per series: the median of
    * pairwise slopes over pairs at most `maxLag` buckets apart —
    * the robust SLOPE estimate completing [[mannKendall]] (is there a
    * trend) and [[spearmanTrend]] (how monotone) with "how steep",
    * immune to outliers that wreck an OLS fit. The full Theil–Sen
    * pair set is O(n²) (the ts_pettitt lesson); bounding the lag
    * keeps it O(n·L) — for trend estimation the short-lag pairs
    * carry nearly all the information anyway (long-lag slopes are
    * averages of short-lag ones).
    *
    * Each pair's slope is the exact scaled integer
    * trunc((v₂−v₁)·10⁴ / ℓ) (truncation TOWARD ZERO on both engines
    * — Spark's `div` truncates, so the oracle mirrors with an
    * explicit sign split rather than DuckDB's flooring `//`); the
    * median is the lower order statistic off the per-series
    * slope-domain frequency frame (the weightedMedian discipline).
    *
    * Scale shape: the pair generator is one lag explode (×L) + one
    * per-series equi-join on the shifted bucket — never a self-join
    * inequality; everything after runs on the slope value-domain
    * frame.
    *
    * Output: (series…, n_pairs, slope_u — median slope in
    * cents·10⁴ per bucket, NULL when no pairs). */
  def theilSenBounded(df: DataFrame, seriesCols: Seq[String],
      bucketCol: String, centsCol: String, bucketStep: Long,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 100,
      s"need 1 <= maxLag <= 100: $maxLag")
    require(bucketStep > 0, s"bucketStep must be positive: $bucketStep")
    val gc = seriesCols.map(col)
    val base = df.select(gc :+ col(bucketCol).cast("long").as("b") :+
      col(centsCol).cast("long").as("v"): _*)
    val lagged = base
      .select(gc ++ Seq(col("b"), col("v"), explode(sequence(lit(1L),
        lit(maxLag.toLong))).as("l")): _*)
      .withColumn("bt", col("b") + col("l") * lit(bucketStep))
    val right = base.select(gc :+ col("b").as("bt") :+
      col("v").as("v2"): _*)
    val slopes = lagged.join(right, seriesCols :+ "bt")
      .select(gc :+ expr("((v2 - v) * 10000) div l").as("s_u"): _*)
    val wOrd = Window.partitionBy(gc: _*).orderBy(col("s_u"))
    val wAll = Window.partitionBy(gc: _*)
    slopes.groupBy(gc :+ col("s_u"): _*)
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("n", sum(col("c")).over(wAll))
      .groupBy(gc: _*)
      .agg(max(col("n")).as("n_pairs"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("s_u")))
          .as("slope_u"))
  }

  /** Gap detection over a bucketed per-series frame: one row per run
    * of MISSING buckets — where a series that should tick every
    * `step` went silent (the collector-outage / dead-sensor audit;
    * the batch complement of the streaming health monitor's lastOK
    * tracking). A gap row reports the first missing bucket and how
    * many consecutive buckets are absent.
    *
    * One distinct-bucket projection + one per-series lead window on
    * the bucket-bounded frame (EMA-family contract) — O(buckets)
    * rows, gaps only in the output.
    *
    * Output: (series…, gap_start_b, n_missing ≥ 1). */
  def gaps(df: DataFrame, seriesCols: Seq[String], bucketCol: String,
      step: Long): DataFrame = {
    require(step > 0, s"step must be positive: $step")
    val gc = seriesCols.map(col)
    val base = df
      .select(gc :+ col(bucketCol).cast("long").as("b"): _*)
      .distinct()
    base
      .withColumn("nb", lead(col("b"), 1).over(
        Window.partitionBy(gc: _*).orderBy(col("b"))))
      .filter(col("nb").isNotNull && col("nb") - col("b") > step)
      .select(gc ++ Seq((col("b") + step).as("gap_start_b"),
        expr(s"(nb - b) div $step - 1").as("n_missing")): _*)
  }

  /** Spearman rank correlation of each bucketed series against TIME —
    * the monotone-trend STRENGTH meter completing the trend trio:
    * [[mannKendall]] says "a monotone trend exists", [[pettitt]] says
    * where the level shifted, this says HOW monotone the series is on
    * a [−1, 1] scale (robust to outliers and any monotone transform,
    * unlike a Pearson slope). Time ranks are the per-series
    * row_number (buckets are distinct ⇒ no ties); value ranks use
    * doubled midranks off the per-series value-domain frequency frame
    * (2·midrank = 2·cum_lt + c + 1, the pettitt/gini discipline), so
    * every Pearson sum over (2rₓ, 2r_y) is an exact Long on the
    * bucket-bounded frame (EMA-family contract: series bounded by
    * range/interval). ρ is the corrMatrix fixed-order IEEE
    * combination, rounded 4 (NULL when either rank vector is
    * constant).
    *
    * Output: (series…, n, rho_r). */
  def spearmanTrend(df: DataFrame, seriesCols: Seq[String],
      bucketCol: String, centsCol: String): DataFrame = {
    val gc = seriesCols.map(col)
    val base = df.select(gc :+ col(bucketCol).cast("long").as("b") :+
        col(centsCol).cast("long").as("v"): _*)
      .withColumn("rx2", lit(2L) * row_number().over(
        Window.partitionBy(gc: _*).orderBy(col("b"))).cast("long"))
    val freq = base.groupBy(gc :+ col("v"): _*)
      .agg(count(lit(1)).as("c"))
      .withColumn("cum_le", sum(col("c")).over(
        Window.partitionBy(gc: _*).orderBy(col("v"))))
      .select(gc ++ Seq(col("v"),
        (lit(2L) * (col("cum_le") - col("c")) + col("c") + 1L)
          .as("ry2")): _*)
    val sums = base.join(freq, seriesCols :+ "v")
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
        sum(col("rx2") * col("rx2")).as("qx"),
        sum(col("ry2") * col("ry2")).as("qy"),
        sum(col("rx2") * col("ry2")).as("pxy"))
    def d(c: String) = col(c).cast("double")
    val vx = d("n") * d("qx") - d("sx") * d("sx")
    val vy = d("n") * d("qy") - d("sy") * d("sy")
    sums.select(gc ++ Seq(col("n"),
      when(vx > 0 && vy > 0,
        round((d("n") * d("pxy") - d("sx") * d("sy")) /
          (sqrt(vx) * sqrt(vy)), 4)).as("rho_r")): _*)
  }

  /** SAX symbolization of a bucketed per-series frame (Lin et al.,
    * "A Symbolic Representation of Time Series"): each bucket value
    * maps to a small-alphabet symbol by EXACT per-series
    * order-statistic cut points — the data-driven (distribution-free)
    * variant of the classic Gaussian breakpoints, PAA being the
    * caller's bucketing (the GROUP BY time() floor-mean convention
    * every series op here shares). Symbols turn numeric series into
    * strings for motif mining / indexing / cheap similarity — the
    * discretization bridge between the ts_* family and the text
    * n-gram machinery.
    *
    * Cut j (1..alphabet−1) is the ⌈n·j/alphabet⌉-th smallest bucket
    * value (PERCENTILE_DISC), selected on the per-series VALUE-DOMAIN
    * frequency frame (winsorizedStats discipline — no corpus-wide
    * sort); symbol = #cuts strictly below the value, so ties always
    * share a symbol. All exact Longs.
    *
    * Output: (series…, bucket, v, symbol 0..alphabet−1). */
  def saxSymbols(df: DataFrame, seriesCols: Seq[String],
      bucketCol: String, centsCol: String, alphabet: Int): DataFrame = {
    require(alphabet >= 2 && alphabet <= 16,
      s"need 2 <= alphabet <= 16: $alphabet")
    val gc = seriesCols.map(col)
    val base = df.select(gc :+ col(bucketCol).cast("long").as("b") :+
      col(centsCol).cast("long").as("v"): _*)
    val wOrd = Window.partitionBy(gc: _*).orderBy(col("v"))
    val wAll = Window.partitionBy(gc: _*)
    val freq = base.groupBy(gc :+ col("v"): _*)
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("n", sum(col("c")).over(wAll))
    val cutCols = (1 until alphabet).map { j =>
      min(when(col("cum") >=
        expr(s"(n * $j + ${alphabet - 1}) div $alphabet"),
        col("v"))).as(s"cut_$j")
    }
    val cuts = freq.groupBy(gc: _*).agg(cutCols.head, cutCols.tail: _*)
    val symbol = (1 until alphabet)
      .map(j => when(col("v") > col(s"cut_$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    base.join(broadcast(cuts), seriesCols)
      .select(gc ++ Seq(col("b"), col("v"),
        symbol.as("symbol")): _*)
  }

  /** Counter-reset-aware rate (the TSDB `increase`/`rate` convention
    * for cumulative counters): per series, walk samples in time order;
    * a sample BELOW its predecessor is a counter reset (process
    * restart) and contributes its own value — the counter restarted
    * from zero — instead of a negative delta. The monitoring domain
    * the reference lives in (its measurements are exactly such
    * counters) has no reference-side compute for this; north-star
    * engine surface.
    *
    * Scale shape: ONE lag window + one aggregate, both partitioned by
    * the series key — a single hash shuffle, per-series state O(1).
    * Contract (as [[graft.operators.TemporalJoin.asofJoin]]): the
    * input must be unique per (series, time) — pre-bucket duplicates —
    * or the lag order over ties is nondeterministic in any engine.
    *
    * Exact Long cents end to end; the only double is the final
    * cents-per-second rate = increase·10⁶ / span_us (exact integers
    * into one fixed-order IEEE product+division — bit-identical
    * cross-engine — rounded 6 by registry convention). Singleton
    * series have span 0 and a NULL rate.
    *
    * Output: (series…, n, n_resets, increase_c, span_us, rate_cps). */
  def counterRate(df: DataFrame, seriesCols: Seq[String],
      timeUsCol: String, centsCol: String): DataFrame = {
    val sc = seriesCols.map(col)
    val w = Window.partitionBy(sc: _*).orderBy(col("t_us"))
    df.select(sc ++ Seq(col(timeUsCol).cast("long").as("t_us"),
        col(centsCol).cast("long").as("vc")): _*)
      .withColumn("prev", lag(col("vc"), 1).over(w))
      .withColumn("inc",
        when(col("prev").isNull, lit(0L))
          .when(col("vc") >= col("prev"), col("vc") - col("prev"))
          .otherwise(col("vc")))
      .withColumn("reset",
        when(col("prev").isNotNull && (col("vc") < col("prev")), lit(1L))
          .otherwise(lit(0L)))
      .groupBy(sc: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("reset")).as("n_resets"),
        sum(col("inc")).as("increase_c"),
        (max(col("t_us")) - min(col("t_us"))).as("span_us"))
      .withColumn("rate_cps",
        when(col("span_us") > 0,
          round(col("increase_c").cast("double") * 1e6 /
            col("span_us").cast("double"), 6)))
  }
}
