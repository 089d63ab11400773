package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-profiling operators (ANALYZE-style data-quality summaries —
  * north-star; the corpus/table audit step every pipeline runs before
  * training or migration).
  */
object Profiling {

  /** Column profile: per column, the non-null count, exact distinct
    * count, and min/max (stringified so the long-format output has a
    * uniform schema), plus the table row count — as a UNION of
    * per-column aggregates, each a COLUMN-PRUNED scan + two-phase hash
    * aggregate.
    *
    * Deliberately NOT one wide aggregate: multi-column count(DISTINCT)
    * in a single agg plans as an Expand that multiplies every row by
    * (|cols|+1) and SortAggregates full rows — measured 6× slower than
    * this form on the 5-column lineitem profile, and the blowup grows
    * with the column list. With columnar storage the per-column passes
    * read the SAME total bytes as one wide scan (each scan's ReadSchema
    * is its single column — plan-asserted), and each pass is a
    * map-side-combined hash agg with a one-row shuffle. Exact distinct
    * (not HLL) so the result is oracle-comparable; swap
    * approx_count_distinct in at 100 TB when a ±2% answer is acceptable
    * (`agg_approx_distinct` pins that path). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionAll _)

  /** Zipf rank–frequency profile of a value stream: the OLS slope of
    * ln(frequency) on ln(rank) — the standard corpus-health check (a
    * natural-language token stream sits near slope −1; a slope far off
    * flags template spam, boilerplate floods, or tokenizer damage
    * before any training run ingests the corpus).
    *
    * Scale shape: the corpus is touched by ONE map-side-combined
    * groupBy(value) — every later step (ranking window, the five OLS
    * sum aggregates) runs on the VOCABULARY-bounded frequency frame.
    * The ranking window is deliberately unpartitioned: ranks are
    * global by definition, and the frame it sorts is the vocabulary,
    * never the corpus (PlanSpec's registry-wide allowlist documents
    * exactly this bounded-frame argument).
    *
    * Output (one row): n_types BIGINT, n_tokens BIGINT, zipf_slope
    * DOUBLE rounded to 3 decimals (multi-row double aggregate —
    * summation order is engine-dependent, so the raw last ulps are
    * not comparable; the rounded value is).
    */
  def zipfSlope(df: DataFrame, valueCol: String): DataFrame = {
    val freq = df.groupBy(col(valueCol).as("w"))
      .agg(count(lit(1)).as("n"))
    val ranked = freq.withColumn("rank",
        row_number().over(
          Window.orderBy(col("n").desc, col("w"))).cast("long"))
      .select(col("n"), log(col("rank")).as("x"), log(col("n")).as("y"))
    val denom = col("k") * col("sxx") - col("sx") * col("sx")
    ranked.agg(
        count(lit(1)).as("k"), sum(col("n")).as("n_tokens"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("k").as("n_types"), col("n_tokens"),
        // k < 2 (or all-equal ranks, impossible for row_number) makes
        // the OLS denominator 0 — a NaN would hash-diverge from SQL's
        // NULL regr_slope, so degenerate fits are NULL on both sides
        when(denom === 0.0, lit(null).cast("double"))
          .otherwise(
            round((col("k") * col("sxy") - col("sx") * col("sy")) /
              denom, 3))
          .as("zipf_slope"))
  }

  /** Exact per-group decile (or any `buckets`-ile) stratification of an
    * integer metric — the quality-bucketing primitive behind
    * "sample uniformly across length/quality strata": cut points are
    * the PERCENTILE_DISC order statistics (smallest value whose
    * cumulative count reaches ⌈p·n/buckets⌉ — actual data values, no
    * interpolation), a row's bucket is 1 + (number of cut points
    * strictly below its value), and per-bucket stats are exact Longs.
    *
    * Scale shape: the winsorizedStats discipline — the corpus is
    * touched by ONE map-side-combined groupBy((group, value));
    * everything else (cumulative window, cut-point selection, bucket
    * assignment, final rollup) runs on the DISTINCT-VALUE frequency
    * frame, bounded by the value domain per group, never the corpus.
    * The cut-point join fans that frame out ×(buckets−1) — still
    * domain-bounded. No corpus-sized window, no single-reducer sort.
    *
    * Ties land every equal value in the same bucket (buckets are then
    * unequal-sized — the honest answer; an ntile that splits ties by
    * arbitrary row order is not reproducible cross-engine).
    *
    * Output: (group…, bucket BIGINT 1..buckets, n_rows BIGINT,
    * min_v, max_v, sum_v BIGINT).
    */
  def decileStats(df: DataFrame, groupCols: Seq[String],
      valueCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets: $buckets")
    // cast("long") on a non-integral column silently nulls — fail at
    // plan time instead (the capPerKey/ppsSample contract)
    val dt = df.schema(valueCol).dataType
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(dt),
      s"decileStats value column `$valueCol` must be an integral " +
        s"type (callers pre-scale exact decimals), got $dt")
    val gc = groupCols.map(col)
    val freq = df
      .groupBy(gc :+ col(valueCol).cast("long").as("v"): _*)
      .agg(count(lit(1)).as("n_v"))
    val w = Window.partitionBy(gc: _*).orderBy(col("v"))
    val cum = freq.withColumn("cum", sum(col("n_v")).over(w))
    val tot = freq.groupBy(gc: _*).agg(sum(col("n_v")).as("n"))
    // one row per (group, p): the ⌈p·n/buckets⌉ target rank, p<buckets
    val targets = tot.select(gc :+ col("n") :+
        explode(array((1 until buckets).map(lit): _*)).as("p"): _*)
      .select(gc :+ col("p") :+
        expr(s"(p * n + ${buckets - 1}) div $buckets").as("kp"): _*)
    val cuts = cum.join(targets, groupCols)
      .filter(col("cum") >= col("kp"))
      .groupBy(gc :+ col("p"): _*)
      .agg(min(col("v")).as("cut"))
    freq.join(cuts, groupCols)
      .groupBy(gc :+ col("v"): _*)
      .agg(max(col("n_v")).as("n_v"), // constant per (group, v)
        (sum(when(col("v") > col("cut"), 1L).otherwise(0L)) + 1L)
          .as("bucket"))
      .groupBy(gc :+ col("bucket"): _*)
      .agg(sum(col("n_v")).as("n_rows"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        sum(col("n_v") * col("v")).as("sum_v"))
  }

  /** Pairwise Pearson correlation matrix over integer-unit columns in
    * ONE corpus pass: every Σx, Σx², Σx·y accumulates as an exact Long
    * in a single map-side-combined aggregate (callers pre-scale to
    * units whose squares·n stay under 2⁶³), then each pair's
    * correlation is one shared-order IEEE expression over the one-row
    * sums frame — k columns cost one scan, not C(k,2) scans, and the
    * rounded outputs are hash-identical cross-engine. Zero-variance
    * degenerate pairs yield NULL (matching SQL corr()).
    *
    * Output: (col_a, col_b, n BIGINT, corr DOUBLE rounded 4) —
    * one row per unordered pair in input order. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.distinct.size == cols.size,
      s"need >= 2 distinct columns: $cols")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val sumCols =
      Seq(count(lit(1)).as("n")) ++
      cols.flatMap(c => Seq(
        sum(col(c).cast("long")).as(s"s_$c"),
        sum(col(c).cast("long") * col(c).cast("long")).as(s"q_$c"))) ++
      pairs.map { case (a, b) =>
        sum(col(a).cast("long") * col(b).cast("long")).as(s"p_${a}_$b") }
    val sums = df.agg(sumCols.head, sumCols.tail: _*)
    pairs.map { case (a, b) =>
      val num = col("n") * col(s"p_${a}_$b") - col(s"s_$a") * col(s"s_$b")
      val da = col("n") * col(s"q_$a") - col(s"s_$a") * col(s"s_$a")
      val db = col("n") * col(s"q_$b") - col(s"s_$b") * col(s"s_$b")
      sums.select(lit(a).as("col_a"), lit(b).as("col_b"),
        col("n"),
        when(da > 0 && db > 0,
          round(num.cast("double") /
            (sqrt(da.cast("double")) * sqrt(db.cast("double"))), 4))
          .as("corr"))
    }.reduce(_ unionAll _)
  }

  /** Two-sample Kolmogorov–Smirnov distance in EXACT integers: the
    * distribution-drift test between two cohorts of one integer
    * metric ("do clicks and views draw values from the same
    * distribution", "did this week's length distribution move").
    * D = max |F₁ − F₂| is kept as the cross-multiplied integer
    * max|cum₁·n₂ − cum₂·n₁| (no division inside the max — exact and
    * order-independent); the returned `d` is that numerator over
    * n₁·n₂, one rounded double.
    *
    * Scale shape: one map-side-combined groupBy(value) corpus pass
    * with conditional counts; the CDF windows run on the merged
    * DISTINCT-VALUE frame, bounded by the value domain (the
    * registry-allowlisted unpartitioned-window argument).
    *
    * Output (one row): n1, n2, d_num BIGINT, d DOUBLE rounded 6. */
  def ksTest(df: DataFrame, cohortCol: String, valueCol: String,
      cohortA: String, cohortB: String): DataFrame = {
    require(cohortA != cohortB, s"cohorts must differ: $cohortA")
    val f = df
      .filter(col(cohortCol).isin(cohortA, cohortB))
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(sum(when(col(cohortCol) === cohortA, 1L).otherwise(0L))
        .as("na"),
        sum(when(col(cohortCol) === cohortB, 1L).otherwise(0L))
          .as("nb"))
    val wOrd = Window.orderBy(col("v"))
    val wAll = Window.partitionBy()
    f.withColumn("ca", sum(col("na")).over(wOrd))
      .withColumn("cb", sum(col("nb")).over(wOrd))
      .withColumn("n1", sum(col("na")).over(wAll))
      .withColumn("n2", sum(col("nb")).over(wAll))
      .groupBy(col("n1"), col("n2"))
      .agg(max(abs(col("ca") * col("n2") - col("cb") * col("n1")))
        .as("d_num"))
      .select(col("n1"), col("n2"), col("d_num"),
        round(col("d_num").cast("double") /
          (col("n1") * col("n2")).cast("double"), 6).as("d"))
  }

  /** Exact per-group percentile bands (PERCENTILE_DISC order
    * statistics — ⌈p·n⌉-th smallest with multiplicity, actual data
    * values): the dashboard staple "p50/p90/p99 per series per time
    * bucket", computed with the madStats window discipline — one
    * map-side-combined groupBy((group, value)) corpus pass, then every
    * band as a window aggregate over the domain-bounded frequency
    * frame's existing sort; zero joins.
    *
    * @param percentiles (num, den) rational percentiles, paired with
    *                    `names` for the output columns
    * Output: (group…, n, names…) — all exact Longs. */
  def percentileBands(df: DataFrame, groupCols: Seq[String],
      centsCol: String, percentiles: Seq[(Long, Long)],
      names: Seq[String]): DataFrame = {
    require(percentiles.nonEmpty && percentiles.size == names.size,
      s"one name per percentile: $percentiles / $names")
    percentiles.foreach { case (n, d) =>
      require(n > 0 && n <= d, s"percentile must be in (0, 1]: $n/$d") }
    val gc = groupCols.map(col)
    val wOrd = Window.partitionBy(gc: _*).orderBy(col("c"))
    val wAll = Window.partitionBy(gc: _*)
    val cum = df
      .groupBy(gc :+ col(centsCol).cast("long").as("c"): _*)
      .agg(count(lit(1)).as("n_v"))
      .withColumn("cum", sum(col("n_v")).over(wOrd))
      .withColumn("n", sum(col("n_v")).over(wAll))
    val banded = percentiles.zip(names).foldLeft(cum) {
      case (d, ((num, den), name)) =>
        d.withColumn(name,
          min(when(col("cum") >=
            expr(s"(n * $num + ${den - 1}) div $den"), col("c")))
            .over(wAll))
    }
    banded.groupBy(gc: _*)
      .agg(max(col("n")).as("n"),
        names.map(nm => max(col(nm)).as(nm)): _*)
  }

  /** MAD (median-absolute-deviation) robust outlier statistics in
    * EXACT integer units — the heavy-tail-safe twin of z-score
    * flagging (mean/stddev are themselves dragged by the outliers
    * they're meant to catch; median/MAD are not): per group, the
    * median order statistic (⌈n/2⌉-th smallest with multiplicity,
    * PERCENTILE_DISC semantics — an actual data value), the MAD (the
    * same order statistic over |x − median|), and the count of rows
    * with |x − median| > k·MAD.
    *
    * Scale shape: the winsorizedStats discipline twice over — the
    * corpus is touched by ONE map-side-combined groupBy((group,
    * value)); the median, the deviation re-aggregation, the MAD, and
    * the outlier count all run on DISTINCT-VALUE frequency frames
    * bounded by the value domain, never the corpus. All Long
    * arithmetic: every output column hash-exact cross-engine.
    *
    * Output: (group…, n, median_c, mad_c, n_outliers). A degenerate
    * group (MAD = 0, over half the mass on one value) flags every
    * off-median row — the honest reading of the k·MAD fence. */
  def madStats(df: DataFrame, groupCols: Seq[String], centsCol: String,
      k: Long = 3L): DataFrame = {
    require(k >= 1, s"fence multiplier must be >= 1: $k")
    val gc = groupCols.map(col)
    val wAll = Window.partitionBy(gc: _*)
    // each selection stage derives its total / target rank / order
    // statistic as WINDOW aggregates over the SAME partitioning the
    // running sum already sorted — zero joins, one exchange per
    // frequency frame (the joined formulation re-aggregated the
    // corpus per branch: measured 1.6× slower on the sf0.1 bench)
    def orderStat(freqF: DataFrame, valC: String, cntC: String,
        statName: String): DataFrame = {
      val wOrd = Window.partitionBy(gc: _*).orderBy(col(valC))
      freqF
        .withColumn("cum", sum(col(cntC)).over(wOrd))
        .withColumn("n", sum(col(cntC)).over(wAll))
        .withColumn("kmid", expr("(n + 1) div 2"))
        .withColumn(statName,
          min(when(col("cum") >= col("kmid"), col(valC))).over(wAll))
    }
    val freq = df
      .groupBy(gc :+ col(centsCol).cast("long").as("c"): _*)
      .agg(count(lit(1)).as("n_v"))
    val withMed = orderStat(freq, "c", "n_v", "median_c")
    val dev = withMed
      .groupBy(gc :+ abs(col("c") - col("median_c")).as("d"): _*)
      .agg(sum(col("n_v")).as("n_d"),
        max(col("median_c")).as("median_c")) // constant within group
    // orderStat re-derives n (= Σn_d = Σn_v) for the final output
    val withMad = orderStat(dev, "d", "n_d", "mad_c")
    withMad
      .groupBy(gc: _*)
      .agg(max(col("n")).as("n"),
        max(col("median_c")).as("median_c"),
        max(col("mad_c")).as("mad_c"),
        sum(when(col("d") > lit(k) * col("mad_c"), col("n_d"))
          .otherwise(0L)).as("n_outliers"))
  }

  /** Winsorized (outlier-clipped) per-group statistics in EXACT integer
    * units — the robust-scaling primitive a feature/curation pipeline
    * applies before normalization: clip at the empirical trim-quantile
    * ORDER STATISTICS (kLo-th / kHi-th smallest with multiplicity,
    * kLo = ⌈n·trim⌉, kHi = n−kLo+1 — never an interpolated percentile,
    * so bounds are actual data values and stay Long), then aggregate
    * the clamped values.
    *
    * Scale shape: the corpus is touched by ONE map-side-combined
    * groupBy((group, value)) → everything else runs on the
    * DISTINCT-VALUE frequency frame, bounded by the value DOMAIN (cent
    * units ⇒ ~1e6 rows per group at any corpus size), never the
    * corpus. The rank-selection window sorts only that frame — the
    * naive row_number winsorization sorts every group's corpus rows
    * through one reducer, the single-reducer trap PlanSpec pins
    * elsewhere. Bounds and totals are aggregation outputs of
    * group-cardinality size; their joins back are left to AQE (no
    * broadcast pretense on a caller-controlled group count). The clamp
    * folds into Σ n_v·clamp(c) on the frequency frame: exact Long
    * arithmetic in any order, and the mean is the exact half-up
    * integer division into micro-units ((2s·10⁴+n) div (2n), the
    * ts_ema idiom) — every output column hash-exact cross-engine.
    *
    * Output: (group…, n, lo_c, hi_c, wmean_u) — bounds in input cent
    * units, winsorized mean in cent·10⁴ (= micro-base-unit) units.
    *
    * Long-safety: exact while 2·10⁴·Σc < 2⁶³ per group (cent-sum below
    * ~4.6e14 — sf0.1's largest group is ~2e12); past that ANSI mode
    * fails LOUDLY (no silent wrap) — pre-scale to coarser units or
    * widen `sw` to DECIMAL(38,0) before the division.
    *
    * @param centsCol integer-unit value column (callers convert exact
    *                 decimals first: `round(x*100).cast("long")`)
    * @param trimNum/trimDen rational trim fraction per tail (default
    *                 1/20 = 5%); requires 2·trim < 1 */
  def winsorizedStats(df: DataFrame, groupCols: Seq[String],
      centsCol: String, trimNum: Long = 1L,
      trimDen: Long = 20L): DataFrame = {
    require(trimNum > 0 && 2 * trimNum < trimDen,
      s"need 0 < 2*trim < 1: $trimNum/$trimDen")
    val gc = groupCols.map(col)
    val wOrd = Window.partitionBy(gc: _*).orderBy(col("c"))
    val wAll = Window.partitionBy(gc: _*)
    // the madStats/percentileBands window discipline: totals, target
    // ranks and clip bounds all ride window aggregates on the
    // frequency frame's existing sort — no per-branch re-aggregation
    // of the corpus, zero joins
    val cum = df
      .groupBy(gc :+ col(centsCol).cast("long").as("c"): _*)
      .agg(count(lit(1)).as("n_v"))
      .withColumn("cum", sum(col("n_v")).over(wOrd))
      .withColumn("n", sum(col("n_v")).over(wAll))
      .withColumn("klo",
        expr(s"(n * $trimNum + ${trimDen - 1}) div $trimDen"))
      .withColumn("lo_c",
        min(when(col("cum") >= col("klo"), col("c"))).over(wAll))
      .withColumn("hi_c",
        min(when(col("cum") >= col("n") - col("klo") + 1, col("c")))
          .over(wAll))
    cum.groupBy(gc: _*)
      .agg(max(col("n")).as("n"),
        max(col("lo_c")).as("lo_c"), // constant within group
        max(col("hi_c")).as("hi_c"),
        sum(col("n_v") *
          greatest(least(col("c"), col("hi_c")), col("lo_c"))).as("sw"))
      .select(gc ++ Seq(col("n"), col("lo_c"), col("hi_c"),
        expr("(2 * sw * 10000 + n) div (2 * n)").as("wmean_u")): _*)
  }
}
