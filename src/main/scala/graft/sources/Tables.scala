package graft.sources

import graft.functions.TimeFuncs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Parquet measurement/table reader.
  *
  * The reference's only data source is the InfluxDB 1.x HTTP API with
  * hard-coded ns precision (/root/reference/pkg/agent/client.go:329-485).
  * Our primary storage is Parquet, whose time column may physically be
  * int64 ns epochs, TIMESTAMP(NANOS) (surfacing as Long via
  * `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP(MICROS) or
  * TIMESTAMP_NTZ — the engine's authoritative time key is ALWAYS a
  * lossless Long ns epoch, derived at the load boundary
  * (SURVEY.md §7.3 hard part 1). Naive timestamps are interpreted as
  * UTC, matching DuckDB's `epoch_ns` on naive parquet timestamps.
  *
  * Filter pushdown contract: ns-bound time predicates are applied to the
  * RAW physical column (timestamp literals for timestamp-typed storage),
  * so they land in the parquet scan's PushedFilters for row-group
  * skipping — [[load]] keeps the raw column as `<name>_raw` beside the
  * derived ns Long for exactly this purpose, and [[timeRange]] prefers it.
  */
object Tables {

  /** Companion-column suffix: `load` keeps the raw physical time column
    * as `ts_raw` so range predicates stay pushable after ns-derivation. */
  final val RawSuffix = "_raw"

  /** Must hold before reading any ns-timestamp parquet. `nanosAsLong`
    * is engine-internal (no user-visible semantics beyond letting
    * TIMESTAMP(NANOS) parquet surface losslessly) and is safe to set
    * idempotently; the session time zone is NOT — silently flipping it
    * mid-session would change the rendering of unrelated timestamp
    * expressions — so it is pinned ONCE at session construction
    * ([[graft.Sessions.bootstrap]], every entry point) and ASSERTED
    * here: a session that skipped the documented bootstrap fails
    * loudly instead of having its time zone hijacked. */
  def ensureNsConf(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tz = spark.conf.get("spark.sql.session.timeZone")
    if (tz != "UTC") throw new IllegalStateException(
      s"graft requires spark.sql.session.timeZone=UTC (Long-ns epoch " +
        s"derivation from naive timestamps is TZ-sensitive); found " +
        s"'$tz'. Pin it at session construction — " +
        s"graft.Sessions.bootstrap(spark) does.")
  }

  /** Long-ns-epoch view of `df`'s time column, whatever its physical
    * type. Naive (NTZ) timestamps are read as UTC (session TZ is pinned
    * by [[ensureNsConf]]), matching the DuckDB oracle's `epoch_ns`. */
  def nsCol(df: DataFrame, name: String): Column =
    nsColOf(df.schema(name).dataType, name)

  private def nsColOf(dt: DataType, name: String): Column = dt match {
    case LongType         => col(name)
    case TimestampType    => unix_micros(col(name)) * lit(1000L)
    case TimestampNTZType =>
      unix_micros(col(name).cast(TimestampType)) * lit(1000L)
    case other => throw new IllegalArgumentException(
      s"unsupported time column type for `$name`: $other")
  }

  /** Replace `name` with its Long-ns view in place (schema otherwise
    * unchanged; no companion column added). No-op when already Long.
    * If a `<name>_raw` companion is present it is DROPPED on rewrite:
    * the companion's whole contract is "still the physical column
    * `name` was derived from" (see [[timeRange]]), and after this
    * rewrite that can no longer be guaranteed for downstream
    * transforms — losing pushdown is recoverable, filtering on a stale
    * raw column is silent data loss. */
  def withNsTime(df: DataFrame, name: String = "ts"): DataFrame =
    if (!df.columns.contains(name)) df
    else df.schema(name).dataType match {
      case LongType => df
      case dt =>
        val out = df.withColumn(name, nsColOf(dt, name))
        val raw = name + RawSuffix
        if (df.columns.contains(raw)) out.drop(raw) else out
    }

  /** Timestamp literal (folded constant → pushable) carrying `us` µs
    * epoch in the column's own type. */
  private def usLit(dt: DataType, us: Long): Column = dt match {
    case TimestampType    => timestamp_micros(lit(us))
    case TimestampNTZType => timestamp_micros(lit(us)).cast(TimestampNTZType)
    case other => throw new IllegalArgumentException(
      s"usLit: not a timestamp type: $other")
  }

  /** Exact ⌈ns/1000⌉ without the `ns + 999` overflow trap: an
    * open-ended range using Long.MaxValue as a sentinel bound sits
    * within 999 of overflow, where the add-then-divide form wraps to a
    * huge NEGATIVE µs literal and silently drops every row. Quotient
    * magnitude is ≤ |ns|/1000, so the +1 correction cannot overflow. */
  private def ceilDivUs(ns: Long): Long = {
    val q = Math.floorDiv(ns, 1000L)
    if (q * 1000L == ns) q else q + 1L
  }

  /** The raw (pushable) column to range-filter on, and its type: the
    * `<timeCol>_raw` companion when present, else `timeCol` itself.
    *
    * INVARIANT (callers of [[timeRange]]/[[nsAfter]]/[[nsAtLeast]]/
    * [[nsBefore]]): a `<timeCol>_raw` companion is trusted to be the
    * unmodified physical column `timeCol` was derived from at
    * [[load]]. Any transform that re-derives or shifts `timeCol` after
    * load MUST drop the companion (as [[withNsTime]] does on rewrite) —
    * otherwise the range predicate filters on the stale raw column. */
  private def filterTarget(df: DataFrame, timeCol: String)
      : (Column, DataType) = {
    val rawName = timeCol + RawSuffix
    if (df.columns.contains(rawName))
      (col(rawName), df.schema(rawName).dataType)
    else (col(timeCol), df.schema(timeCol).dataType)
  }

  /** Pushable `time > ns` (strict) predicate. For µs-precision storage:
    * `us·1000 > ns  ⟺  us > ns floorDiv 1000`. */
  def nsAfter(df: DataFrame, timeCol: String, ns: Long): Column = {
    val (c, dt) = filterTarget(df, timeCol)
    dt match {
      case LongType => c > lit(ns)
      case tdt      => c > usLit(tdt, Math.floorDiv(ns, 1000L))
    }
  }

  /** Pushable `time >= ns` predicate (`us·1000 >= ns ⟺ us >= ceil`). */
  def nsAtLeast(df: DataFrame, timeCol: String, ns: Long): Column = {
    val (c, dt) = filterTarget(df, timeCol)
    dt match {
      case LongType => c >= lit(ns)
      case tdt      => c >= usLit(tdt, ceilDivUs(ns))
    }
  }

  /** Pushable `time < ns` predicate (`us·1000 < ns ⟺ us < ceil`). */
  def nsBefore(df: DataFrame, timeCol: String, ns: Long): Column = {
    val (c, dt) = filterTarget(df, timeCol)
    dt match {
      case LongType => c < lit(ns)
      case tdt      => c < usLit(tdt, ceilDivUs(ns))
    }
  }

  /** Fan a compute-heavy narrow stage out to the session's cores when
    * the upstream produced fewer partitions than the session can run
    * (optimization guide §2.5, the unsplittable-input case: the bench
    * SFs are single-row-group parquet files, so every scan is ONE
    * task and any per-row kernel above it — image/audio synthesis and
    * decode, shingling, MinHash — would run single-threaded while 31
    * cores idle; measured 2.5 s single-task stages at sf0.1).
    * Decided at PLAN time from the physical partition count: at scale
    * the scan already yields >= parallelism splits and NO exchange is
    * added, so this cannot pessimize a real deployment. When it
    * fires, the round-robin exchange moves only the kernel's INPUT
    * columns — call it before payload synthesis / fingerprinting and
    * after source filters (which stay pushed at the scan, below the
    * exchange). Row-to-partition assignment is deterministic under
    * retries (sort-before-repartition, the Spark default); callers
    * must be order-insensitive downstream (aggregates/joins/maps —
    * every use here), never first()-without-order. */
  def fanOutForKernel(df: DataFrame): DataFrame = {
    // micro-batches built from driver-local rows (index-ingest steps,
    // test fixtures) stay put: their kernels see a handful of rows
    // and the exchange costs more than it buys (measured +80% on the
    // dedup_inc_* harnesses when they were fanned) — storage-backed
    // inputs are the under-partitioned case this helper exists for
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val localOnly = leaves.nonEmpty && leaves.forall(
      _.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    if (localOnly) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.min(target, 16)) df
    else df.repartition(target)
  }

  /** Read `<dir>/<name>.parquet`. Any timestamp-typed `ts` column is
    * normalized to the authoritative Long ns epoch, with the raw
    * physical column kept as `ts_raw` so [[timeRange]] predicates still
    * reach the parquet scan. int64-ns storage passes through untouched. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureNsConf(spark)
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        raw.withColumn("ts" + RawSuffix, col("ts"))
          .withColumn("ts", nsCol(raw, "ts"))
      case _ => raw
    }
  }

  /** The `events` table in canonical measurement form: authoritative
    * `time_ns` Long plus a derived µs `time` timestamp for windowing
    * (SURVEY.md §1.3). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw
      .withColumn("time_ns", col("ts"))
      .withColumn("time", TimeFuncs.nsToTimestamp(col("time_ns")))
  }

  /** Time-range scan with ns bounds pushed to the Parquet scan — for
    * timestamp-typed storage the bounds are folded timestamp literals on
    * the raw column (the `_raw` companion when the frame carries one),
    * so they land in PushedFilters whatever the physical time type.
    * Half-open `[startNs, endNs)` by default; `strictBounds` reproduces
    * the reference's doubly-exclusive `time > s AND time < e`
    * (/root/reference/pkg/agent/sync.go:162). */
  def timeRange(
      df: DataFrame,
      timeCol: String,
      startNs: Long,
      endNs: Long,
      strictBounds: Boolean = false): DataFrame =
    if (strictBounds)
      df.filter(nsAfter(df, timeCol, startNs) && nsBefore(df, timeCol, endNs))
    else
      df.filter(nsAtLeast(df, timeCol, startNs) && nsBefore(df, timeCol, endNs))

  /** Row-density histogram feeding ChunkPlanner.planAdaptive: rows per
    * `cellNs`-grain cell over the window — ONE pushed-down scan + count
    * aggregation, result bounded by duration/cellNs cells (driver-safe
    * by choosing a coarse cell: a year at 1h grain is 8,760 rows). */
  def cellCounts(
      df: DataFrame,
      timeCol: String,
      startNs: Long,
      endNs: Long,
      cellNs: Long): Map[Long, Long] = {
    require(cellNs > 0, s"cellNs must be positive: $cellNs")
    // integer `div`, not `/`: double division of a year-scale ns delta
    // exceeds 2^53 and would mis-bucket boundary rows
    timeRange(df, timeCol, startNs, endNs)
      .withColumn("__ns", nsCol(df, timeCol))
      .groupBy(expr(s"(__ns - ${startNs}L) div ${cellNs}L").as("cell"))
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }
}
