package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    // combination in DOUBLE with fixed operand order (the linReg
    // pattern): n·p in LONG overflows once n·Σxy crosses 2⁶³ — it did
    // at the r12 sf1 scale probe (6e6 rows × 6e12 product sums under
    // ANSI = ARITHMETIC_OVERFLOW). Doubles of exact ≤2⁵³ sums keep
    // every step bit-identical cross-engine; the oracle mirrors the
    // identical op order.
    def d(c: String) = col(c).cast("double")
    pairs.map { case (a, b) =>
      val num = d("n") * d(s"p_${a}_$b") - d(s"s_$a") * d(s"s_$b")
      val da = d("n") * d(s"q_$a") - d(s"s_$a") * d(s"s_$a")
      val db = d("n") * d(s"q_$b") - d(s"s_$b") * d(s"s_$b")
      sums.select(lit(a).as("col_a"), lit(b).as("col_b"),
        col("n"),
        when(da > 0 && db > 0,
          round(num / (sqrt(da) * sqrt(db)), 4))
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

  /** k-anonymity audit over a quasi-identifier tuple: how many
    * equivalence classes (distinct QI combinations) exist, how small
    * the smallest is, and what fraction of rows sit in classes below
    * the anonymity threshold k — the privacy screen a dataset release
    * runs BEFORE publishing (a row in a class of size < k is
    * re-identifiable by its quasi-identifiers). All exact floored
    * integers.
    *
    * Scale shape: one map-side-combined groupBy(QI) corpus pass, then
    * one aggregate over the class frame — the class frame is bounded
    * by the QI domain, never corpus-sized unless the QI is a key (in
    * which case the audit's answer — everything is at risk — is the
    * point).
    *
    * Output (one row): n_rows, n_classes, min_class, n_small
    * (classes < k), rows_at_risk, risk_bp. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long)
      : DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2: $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"))
      .agg(sum(col("sz")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("sz")).as("min_class"),
        sum(when(col("sz") < k, 1L).otherwise(0L)).as("n_small"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L))
          .as("rows_at_risk"))
      .withColumn("risk_bp",
        expr("(rows_at_risk * 10000) div n_rows"))
  }

  /** Join/groupBy KEY-SKEW audit: the top-k heaviest keys of a
    * prospective shuffle key with their share and skew multiple — the
    * diagnostic that decides WHETHER a 100 TB join needs salting
    * ([[SkewJoin]]) or AQE skew handling before it runs, instead of
    * discovering the hot key from a straggling task. skew_x100 =
    * ⌊cnt·n_keys·100/n_rows⌋ (how many times the uniform per-key load
    * this key carries, ×100) — exact floored integers throughout.
    *
    * Scale shape: one map-side-combined groupBy(key) corpus pass,
    * then TakeOrdered(k) bounded heaps (never a global sort) and one
    * broadcast totals row.
    *
    * Output: (key — stringified, cnt, n_rows, n_keys, share_bp,
    * skew_x100), k rows, count-desc/key-asc deterministic order. */
  def keySkew(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val counts = df
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    counts.orderBy(col("cnt").desc, col("key")).limit(k)
      .crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"), col("n_rows"), col("n_keys"),
        expr("(cnt * 10000) div n_rows").as("share_bp"),
        expr("(cnt * n_keys * 100) div n_rows").as("skew_x100"))
  }

  /** Pairwise Kolmogorov–Smirnov drift MATRIX over every cohort of
    * one integer metric — the all-pairs generalization of [[ksTest]]
    * ("which sources' length distributions diverged from which"),
    * the screen a mixing pipeline runs before trusting per-source
    * weights. Same exact-integer discipline: per pair,
    * D = max|F_a − F_b| kept as the cross-multiplied integer
    * max|cum_a·n_b − cum_b·n_a| (contract: n_a·n_b fits a Long, the
    * ksTest bound), one rounded division at the end.
    *
    * Scale shape: ONE map-side-combined groupBy((cohort, value))
    * corpus pass; everything after runs on the completed
    * cohort×domain grid (zero-filled via one broadcast-able
    * cohort-totals frame and a left join), whose per-cohort CDF
    * windows are PARTITIONED by cohort over the merged value domain.
    * The pair expansion is an equi-join of the grid to itself ON the
    * value (k rows per side per value → |domain|·k² pair rows,
    * bounded by |cohorts|²·|domain| — never corpus-sized).
    *
    * Output: (g_a, g_b — g_a < g_b, n_a, n_b, d_num, d_r) — one row
    * per unordered cohort pair. */
  def ksMatrix(df: DataFrame, cohortCol: String, valueCol: String)
      : DataFrame = {
    val f = df
      .groupBy(col(cohortCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val dom = f.select(col("v")).distinct()
    val gs = f.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val grid = dom.crossJoin(broadcast(gs))
      .join(f, Seq("g", "v"), "left_outer")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("g")).orderBy(col("v"))))
    grid.as("a")
      .join(grid.as("b"),
        col("a.v") === col("b.v") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g_a"), col("b.g").as("g_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .agg(max(abs(col("a.cum") * col("b.n") -
        col("b.cum") * col("a.n"))).as("d_num"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        col("d_num"),
        round(col("d_num").cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("d_r"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) between two cohorts of one
    * integer metric — the DISTRIBUTION-FREE location companion to
    * [[welchT]]: "do cohort A's values tend to be larger", with no
    * normality assumption, robust to the heavy tails that wreck a
    * t-test. Ranks come from the MERGED value-domain frequency frame
    * with midrank tie handling kept integer by doubling: a value with
    * cum_lt smaller values and tie-group size t occupies ranks
    * cum_lt+1 … cum_lt+t, so 2·midrank = 2·cum_lt + t + 1 exactly.
    * 2R_a = Σ c_a·(2·cum_lt + t + 1) and 2U = 2R_a − n_a(n_a+1) stay
    * exact Longs; the normal approximation uses the tie-corrected
    * variance σ² = n_a·n_b·((n+1) − Σ(t³−t)/(n(n−1)))/12 and
    * z = (2U − n_a·n_b)/(2σ) — fixed-order IEEE on exact sums,
    * rounded 4 (NULL when σ² ≤ 0). CONTRACT: Σ(t³−t) must fit a Long
    * (largest tie group ≲ 2×10⁶ rows — the ksTest n₁·n₂ bound's
    * cousin).
    *
    * Scale shape: one map-side-combined groupBy(value) corpus pass
    * with conditional counts; the running sums ride the merged
    * DISTINCT-VALUE frame (value-domain bounded — the
    * registry-allowlisted unpartitioned-window argument).
    *
    * Output (one row): n_a, n_b, u2 = 2U_a BIGINT, z_r. */
  def mannWhitney(df: DataFrame, cohortCol: String, valueCol: String,
      cohortA: String, cohortB: String): DataFrame = {
    require(cohortA != cohortB, s"cohorts must differ: $cohortA")
    val f = df
      .filter(col(cohortCol).isin(cohortA, cohortB))
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(sum(when(col(cohortCol) === cohortA, 1L).otherwise(0L))
        .as("ca"),
        sum(when(col(cohortCol) === cohortB, 1L).otherwise(0L))
          .as("cb"))
      .withColumn("t", col("ca") + col("cb"))
    val wOrd = Window.orderBy(col("v"))
    val wAll = Window.partitionBy()
    val sums = f
      .withColumn("cum_le", sum(col("t")).over(wOrd))
      .withColumn("cum_lt", col("cum_le") - col("t"))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .groupBy(col("na"), col("nb"))
      .agg(sum(col("ca") * (lit(2L) * col("cum_lt") + col("t")
        + 1L)).as("r2a"),
        sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
    def d(c: Column) = c.cast("double")
    val n = col("na") + col("nb")
    val u2 = col("r2a") - col("na") * (col("na") + 1L)
    val varU = d(col("na")) * d(col("nb")) *
      (d(n) + 1.0 - d(col("ties")) / (d(n) * (d(n) - 1.0))) / 12.0
    sums.select(col("na").as("n_a"), col("nb").as("n_b"),
      u2.as("u2"),
      when(col("na") > 0 && col("nb") > 0 && n > 1 && varU > 0,
        round((d(u2) - d(col("na")) * d(col("nb"))) /
          (lit(2.0) * sqrt(varU)), 4)).as("z_r"))
  }

  /** Kruskal–Wallis H over k cohorts of one integer metric — the
    * rank-based (distribution-free) one-way ANOVA: "does ANY cohort's
    * distribution sit higher", the [[anovaF]] companion exactly as
    * [[mannWhitney]] companions [[welchT]]. Per-cohort doubled rank
    * sums 2R_i come exact off the merged value-domain frame (midrank
    * ties, the mannWhitney identity); H = [12/(n(n+1))·Σ R_i²/n_i −
    * 3(n+1)] / (1 − Σ(t³−t)/(n³−n)) combines the k exact (n_i, 2R_i)
    * pairs in DOUBLE (k-row sum, order engine-dependent ⇒ rounded 4,
    * the anovaF precedent; same Σ(t³−t) Long contract as mannWhitney).
    *
    * Scale shape: one groupBy((cohort, value)) corpus pass, one
    * groupBy(value) merge to the value-domain frame, one equi-join of
    * the two BOUNDED frames; the only unpartitioned window rides the
    * merged DISTINCT-VALUE frame (registry-allowlisted).
    *
    * Output (one row): k, n, h_r (NULL when k < 2, n ≤ k, or the tie
    * correction degenerates). */
  def kruskalWallis(df: DataFrame, cohortCol: String,
      valueCol: String): DataFrame = {
    val f = df
      .select(col(cohortCol).as("g"), col(valueCol).cast("long")
        .as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val m = f.groupBy(col("v")).agg(sum(col("c")).as("t"))
      .withColumn("cum_le", sum(col("t")).over(Window.orderBy(col("v"))))
      .withColumn("cum_lt", col("cum_le") - col("t"))
    val per = f.join(m, "v")
      .groupBy(col("g"))
      .agg(sum(col("c")).as("n_i"),
        sum(col("c") * (lit(2L) * col("cum_lt") + col("t") + 1L))
          .as("r2_i"))
    def d(c: Column) = c.cast("double")
    val one = per.agg(count(lit(1)).as("k"), sum(col("n_i")).as("n"),
      sum(d(col("r2_i")) * d(col("r2_i")) /
        (lit(4.0) * d(col("n_i")))).as("rr"))
      .crossJoin(broadcast(m.agg(
        sum(col("t") * col("t") * col("t") - col("t")).as("ties"))))
    val h0 = lit(12.0) / (d(col("n")) * (d(col("n")) + 1.0)) *
      col("rr") - lit(3.0) * (d(col("n")) + 1.0)
    val corr = lit(1.0) - d(col("ties")) /
      (d(col("n")) * d(col("n")) * d(col("n")) - d(col("n")))
    one.select(col("k"), col("n"),
      when(col("k") > 1 && col("n") > col("k") && corr > 0,
        round(h0 / corr, 4)).as("h_r"))
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

  /** Per-group ordinary-least-squares fit of y on x: slope, intercept,
    * R² — the parametric companion to the Theil–Sen/Mann–Kendall
    * robust-trend family (fit the line once the MK test says a trend
    * exists). ONE map-side-combined pass accumulates the six exact
    * Long sums (n, Σx, Σy, Σx², Σy², Σxy); the normal-equation
    * combination runs in DOUBLE with a fixed operand order (the raw
    * sums can overflow Long when cross-multiplied at corpus scale —
    * doubles of exact ≤2⁵³ sums keep every step bit-identical
    * cross-engine), rounded 6 by registry convention. Degenerate
    * groups (zero x-variance / y-variance) yield NULL fits, matching
    * SQL regr_slope semantics.
    *
    * Inputs must be integral (the capPerKey/decileStats contract): a
    * fractional column would silently truncate under cast("long"). */
  def linReg(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val gc = groupCols.map(col)
    val s = df
      .select(gc ++ Seq(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y")): _*)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("qx"),
        sum(col("y") * col("y")).as("qy"),
        sum(col("x") * col("y")).as("pxy"))
    def d(c: String) = col(c).cast("double")
    val sxx = d("n") * d("qx") - d("sx") * d("sx")
    val syy = d("n") * d("qy") - d("sy") * d("sy")
    val sxy = d("n") * d("pxy") - d("sx") * d("sy")
    s.select(gc ++ Seq(col("n"),
      when(sxx > 0, round(sxy / sxx, 6)).as("slope_r"),
      when(sxx > 0,
        round((d("sy") - (sxy / sxx) * d("sx")) / d("n"), 6))
        .as("icept_r"),
      when(sxx > 0 && syy > 0, round(sxy * sxy / (sxx * syy), 6))
        .as("r2_r")): _*)
  }

  /** Per-group Shannon entropy of a discrete value stream (nats) —
    * the corpus-health twin of [[zipfSlope]]: near-zero entropy per
    * source flags template spam / constant-field damage; anomalously
    * high entropy flags binary junk or tokenizer breakage.
    *
    * One map-side-combined groupBy(value) touches the corpus; the
    * entropy H = ln(N) − (Σ c·ln c)/N runs entirely on the
    * vocabulary-bounded frequency frame. Σ c·ln c is a multi-row
    * double aggregate (summation order engine-dependent) ⇒ the result
    * is rounded 6 (registry convention).
    *
    * Output: (group…, n_types, n_tokens, entropy_nats_r). */
  def entropyBy(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val gc = groupCols.map(col)
    df.groupBy(gc :+ col(valueCol).as("v"): _*)
      .agg(count(lit(1)).as("c"))
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("clogc"))
      .select(gc ++ Seq(col("n_types"), col("n_tokens"),
        round(log(col("n_tokens").cast("double")) -
          col("clogc") / col("n_tokens").cast("double"), 6)
          .as("entropy_nats_r")): _*)
  }

  /** Per-group Herfindahl–Hirschman concentration of a cents measure
    * over contributing keys — "is this segment's revenue one whale or
    * a long tail", the mix-health screen a training-data pipeline
    * runs per source before trusting per-source statistics. Exact
    * integer end to end: per-key shares in floored basis points
    * ((rev·10⁴) div total — truncation IS floor for non-negative
    * revenues, identical in both engines), HHI = Σ share_bp² (0 =
    * atomized … 10⁸ = monopoly).
    *
    * Scale: one groupBy(group, key) pass over the fact rows, then all
    * share arithmetic on the key-cardinality frame; the per-group
    * totals frame is group-cardinality-bounded and broadcast.
    *
    * Output: (group…, n_keys, tot_c, top_share_bp, hhi_bp2). */
  def hhi(df: DataFrame, groupCols: Seq[String], keyCol: String,
      centsCol: String): DataFrame = {
    val gc = groupCols.map(col)
    val per = df
      .groupBy(gc :+ col(keyCol): _*)
      .agg(sum(col(centsCol).cast("long")).as("rev"))
    val tot = per.groupBy(gc: _*)
      .agg(sum(col("rev")).as("tot_c"), count(lit(1)).as("n_keys"))
    per.join(broadcast(tot), groupCols)
      .select(gc ++ Seq(col("n_keys"), col("tot_c"),
        expr("(rev * 10000) div tot_c").as("share_bp")): _*)
      .groupBy(gc ++ Seq(col("n_keys"), col("tot_c")): _*)
      .agg(max(col("share_bp")).as("top_share_bp"),
        sum(col("share_bp") * col("share_bp")).as("hhi_bp2"))
  }

  /** Per-group Gini coefficient of a cents measure over contributing
    * keys — the inequality companion to [[hhi]] (HHI reacts to the
    * top of the distribution; Gini weighs the whole Lorenz curve).
    * G = (2·Σᵢ i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted key
    * totals, computed WITHOUT ranking individuals: on the value-domain
    * frequency frame, a value v with count c and inclusive cumulative
    * count cum occupies ranks (cum−c, cum], whose rank-weighted sum is
    * v·c·(2·cum−c+1)/2 — so the whole rank term folds into one pass
    * over the frequency frame. Per-term products combine in DOUBLE
    * (each factor an exact Long; the all-equal corner overflows Long
    * at corpus scale), summed order-dependently ⇒ G rounded 6.
    * 0 = perfectly equal, → 1 = one key holds everything.
    *
    * Output: (group…, n_keys, tot_c, gini_r). */
  def gini(df: DataFrame, groupCols: Seq[String], keyCol: String,
      centsCol: String): DataFrame = {
    val gc = groupCols.map(col)
    val per = df.groupBy(gc :+ col(keyCol): _*)
      .agg(sum(col(centsCol).cast("long")).as("rev"))
    val wOrd = Window.partitionBy(gc: _*).orderBy(col("rev"))
    val freq = per.groupBy(gc :+ col("rev"): _*)
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wOrd))
    def d(c: Column) = c.cast("double")
    val term = d(col("rev")) * d(col("c")) *
      (lit(2.0) * d(col("cum")) - d(col("c")) + lit(1.0))
    val sums = freq.groupBy(gc: _*)
      .agg(sum(col("c")).as("n_keys"),
        sum(col("rev") * col("c")).as("tot_c"),
        sum(term).as("s1x2"))
    sums.select(gc ++ Seq(col("n_keys"), col("tot_c"),
      when(col("tot_c") > 0 && col("n_keys") > 0,
        round(col("s1x2") /
          (d(col("n_keys")) * d(col("tot_c"))) -
          (d(col("n_keys")) + lit(1.0)) / d(col("n_keys")), 6))
        .as("gini_r")): _*)
  }

  /** Welch's two-sample t statistic between two cohorts of a cents
    * measure — the mean-shift drift test companion to the
    * distribution-shape KS test ([[ksTest]]): "did the average move",
    * robust to unequal variances and sizes. One map-side-combined
    * pass accumulates exact Long (n, Σx, Σx²) per cohort; the
    * t = (m₁−m₂)/√(v₁/n₁+v₂/n₂) and Welch–Satterthwaite df
    * combinations run in fixed-operand-order DOUBLE from those exact
    * sums (bit-identical cross-engine), rounded 4 / 2. Cohorts with
    * n < 2 yield NULL (no variance estimate).
    *
    * Output (one row): n1, n2, mean1_u, mean2_u (half-up micro-unit
    * integer means), t_r, df_r. */
  def welchT(df: DataFrame, cohortCol: String, centsCol: String,
      cohortA: String, cohortB: String): DataFrame = {
    val s = df.filter(col(cohortCol).isin(cohortA, cohortB))
      .groupBy(col(cohortCol))
      .agg(count(lit(1)).as("n"),
        sum(col(centsCol).cast("long")).as("sx"),
        sum(col(centsCol).cast("long") * col(centsCol).cast("long"))
          .as("qx"))
    def side(tag: String, c: String) = max(when(
      col(cohortCol) === (if (tag == "1") cohortA else cohortB),
      col(c)))
    val one = s.agg(
      side("1", "n").as("n1"), side("1", "sx").as("sx1"),
      side("1", "qx").as("qx1"),
      side("2", "n").as("n2"), side("2", "sx").as("sx2"),
      side("2", "qx").as("qx2"))
    def d(c: String) = col(c).cast("double")
    // vᵢ = (nᵢ·Σx² − (Σx)²) / (nᵢ·(nᵢ−1)) — sample variance from
    // exact sums; each step one IEEE op, same operand order both
    // engines.
    val v1 = (d("n1") * d("qx1") - d("sx1") * d("sx1")) /
      (d("n1") * (d("n1") - 1.0))
    val v2 = (d("n2") * d("qx2") - d("sx2") * d("sx2")) /
      (d("n2") * (d("n2") - 1.0))
    val se1 = v1 / d("n1")
    val se2 = v2 / d("n2")
    one.select(col("n1"), col("n2"),
      expr("(2 * sx1 * 10000 + n1) div (2 * n1)").as("mean1_u"),
      expr("(2 * sx2 * 10000 + n2) div (2 * n2)").as("mean2_u"),
      when(col("n1") > 1 && col("n2") > 1,
        round((d("sx1") / d("n1") - d("sx2") / d("n2")) /
          sqrt(se1 + se2), 4)).as("t_r"),
      when(col("n1") > 1 && col("n2") > 1,
        round((se1 + se2) * (se1 + se2) /
          (se1 * se1 / (d("n1") - 1.0) + se2 * se2 / (d("n2") - 1.0)),
          2)).as("df_r"))
  }

  /** Per-group WEIGHTED (lower) median: the smallest value whose
    * cumulative weight reaches half the group's total — "the quantity
    * at which half the REVENUE sits", the business-weighted answer
    * the plain median can't give. Same value-domain discipline as
    * every order statistic here: one groupBy((group, value)) pass
    * sums weights, the cumulative window sorts the value DOMAIN, and
    * the pick is exact integer arithmetic (2·cum ≥ total — no
    * halves, no doubles).
    *
    * Output: (group…, n_vals, tot_w, wmedian). */
  def weightedMedian(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String): DataFrame = {
    val gc = groupCols.map(col)
    val wOrd = Window.partitionBy(gc: _*).orderBy(col("v"))
    val wAll = Window.partitionBy(gc: _*)
    df.select(gc ++ Seq(col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w")): _*)
      .groupBy(gc :+ col("v"): _*)
      .agg(sum(col("w")).as("wv"))
      .withColumn("cum", sum(col("wv")).over(wOrd))
      .withColumn("tot_w", sum(col("wv")).over(wAll))
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_vals"), max(col("tot_w")).as("tot_w"),
        min(when(lit(2) * col("cum") >= col("tot_w"), col("v")))
          .as("wmedian"))
  }

  /** Population Stability Index between a reference cohort and a
    * comparison cohort of a cents measure — the binned drift metric
    * model monitoring actually alarms on (rule of thumb: < 0.1 stable,
    * > 0.25 shifted). Bins are the REFERENCE cohort's exact decile cut
    * points (PERCENTILE_DISC on its value-domain frequency frame, the
    * winsorizedStats discipline), so "the population moved" is
    * measured against where the reference actually sat, not fixed
    * grids. An EMPTY reference cohort leaves every cut NULL — Spark's
    * `v > NULL` buckets everything into bin 0 while a SQL oracle's
    * NULL comparisons drop out, so the degenerate case is rejected
    * loudly up front (one limit(1) probe, the equidepth-histogram
    * eager-cuts precedent) instead of letting the two engines
    * disagree by construction. PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ) with ADD-ONE smoothed bin
    * counts (the standard empty-bin guard — PSI is undefined at q=0;
    * smoothing is applied to BOTH cohorts so identical cohorts still
    * score exactly 0). Bin shares are one IEEE division of exact
    * Longs; the 10-term sum is rounded 6 (registry convention).
    *
    * Output: one row per bin (bin 0..9, n_ref, n_cmp) plus the psi_r
    * total repeated per row (the long format keeps every column
    * integer-or-rounded and the per-bin attribution visible — WHICH
    * bins moved is the actionable part). */
  def psi(df: DataFrame, cohortCol: String, centsCol: String,
      refCohort: String, cmpCohort: String): DataFrame = {
    val vals = df
      .filter(col(cohortCol).isin(refCohort, cmpCohort))
      .select(col(cohortCol).as("g"), col(centsCol).cast("long")
        .as("v"))
    require(vals.filter(col("g") === refCohort).limit(1).count() > 0,
      s"psi: reference cohort '$refCohort' is empty — decile cut " +
        "points are undefined")
    val wOrd = Window.orderBy(col("v"))
    // reference-cohort decile cuts: value-domain frame, bounded by the
    // distinct-value count (allowlisted unpartitioned window)
    val refFreq = vals.filter(col("g") === refCohort)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(lit(1))))
    val cutCols = (1 until 10).map(j => min(when(col("cum") >=
      expr(s"(n * $j + 9) div 10"), col("v"))).as(s"cut_$j"))
    val cuts = refFreq.agg(cutCols.head, cutCols.tail: _*)
    val bin = (1 until 10)
      .map(j => when(col("v") > col(s"cut_$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    val binned = vals.crossJoin(broadcast(cuts))
      .select(col("g"), bin.as("bin"))
      .groupBy(col("bin"))
      .agg(sum(when(col("g") === refCohort, 1L).otherwise(0L))
        .as("n_ref"),
        sum(when(col("g") === cmpCohort, 1L).otherwise(0L))
          .as("n_cmp"))
    // add-one smoothing on a fixed 10-bin grid: absent bins surface
    // with zero counts rather than vanishing
    val grid = binned.sparkSession.range(10)
      .select(col("id").as("bin"))
    val full = grid.join(binned, Seq("bin"), "left_outer")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cmp"), lit(0L)).as("n_cmp"))
    val tot = full.agg((sum(col("n_ref")) + 10L).as("tr"),
      (sum(col("n_cmp")) + 10L).as("tc"))
    val p = (col("n_ref") + lit(1L)).cast("double") /
      col("tr").cast("double")
    val q = (col("n_cmp") + lit(1L)).cast("double") /
      col("tc").cast("double")
    val withTerm = full.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cmp"),
        ((p - q) * log(p / q)).as("term"))
    val psiTotal = withTerm.agg(round(sum(col("term")), 6).as("psi_r"))
    withTerm.select(col("bin"), col("n_ref"), col("n_cmp"))
      .crossJoin(broadcast(psiTotal))
  }

  /** One-way ANOVA F over k cohorts of a cents measure — "does ANY
    * cohort mean differ", the k-group generalization of [[welchT]]
    * (run this first; pairwise t-tests after an insignificant F are
    * the classic multiple-comparison trap). One map-side-combined
    * pass per cohort accumulates exact Long (nᵢ, Σxᵢ); the
    * between/within sums of squares combine those exact sums in
    * DOUBLE (Σ Sᵢ²/nᵢ is a k-row double sum — order engine-dependent
    * ⇒ SS rounded 2, F rounded 4, the entropy precedent). Output one
    * row: (k, n, ssb_r, ssw_r, f_r); F is NULL when k < 2, n ≤ k, or
    * SSW = 0 (degenerate).
    *
    * Scale shape: the corpus is touched once; everything after runs
    * on the k-row cohort frame. */
  def anovaF(df: DataFrame, cohortCol: String, centsCol: String)
      : DataFrame = {
    val per = df
      .select(col(cohortCol).as("g"),
        col(centsCol).cast("long").as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_i"), sum(col("x")).as("s_i"),
        sum(col("x") * col("x")).as("q_i"))
    def d(c: Column) = c.cast("double")
    val one = per.agg(
      count(lit(1)).as("k"), sum(col("n_i")).as("n"),
      sum(col("s_i")).as("s"), sum(col("q_i")).as("q"),
      sum(d(col("s_i")) * d(col("s_i")) / d(col("n_i"))).as("sb"))
    val ssb = col("sb") - d(col("s")) * d(col("s")) / d(col("n"))
    val ssw = d(col("q")) - col("sb")
    one.select(col("k"), col("n"),
      round(ssb, 2).as("ssb_r"), round(ssw, 2).as("ssw_r"),
      when(col("k") > 1 && col("n") > col("k") && ssw > 0,
        round((ssb / (d(col("k")) - 1.0)) /
          (ssw / (d(col("n")) - d(col("k")))), 4)).as("f_r"))
  }
}
