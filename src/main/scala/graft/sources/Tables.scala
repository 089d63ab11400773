package graft.sources

import graft.functions.TimeFuncs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet measurement/table reader.
  *
  * The reference's only data source is the InfluxDB 1.x HTTP API with
  * hard-coded ns precision (/root/reference/pkg/agent/client.go:329-485).
  * Our primary storage is Parquet; nanosecond timestamp columns (Spark has
  * only µs TimestampType) are read as `Long` ns epochs via
  * `spark.sql.legacy.parquet.nanosAsLong` — keeping the authoritative
  * ns-precision time key lossless (SURVEY.md §7.3 hard part 1).
  */
object Tables {

  /** Must be set before reading any ns-timestamp parquet; runtime-settable
    * session conf, safe to call repeatedly. */
  def ensureNsConf(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Read `<dir>/<name>.parquet`. ns-timestamp columns surface as Long. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureNsConf(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The `events` table in canonical measurement form: authoritative
    * `time_ns` Long plus a derived µs `time` timestamp for windowing
    * (SURVEY.md §1.3). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw
      .withColumn("time_ns", col("ts").cast(LongType))
      .withColumn("time", TimeFuncs.nsToTimestamp(col("time_ns")))
  }

  /** Time-range scan with ns bounds pushed to the Parquet scan.
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
      df.filter(col(timeCol) > startNs && col(timeCol) < endNs)
    else
      df.filter(col(timeCol) >= startNs && col(timeCol) < endNs)

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
      .groupBy(expr(s"(`$timeCol` - ${startNs}L) div ${cellNs}L")
        .as("cell"))
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }
}
