package graft

import java.nio.file.Files

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** The time-representation contract, pinned against ALL physical time
  * types the storage layer may hand us. The testdata's `events.ts` has
  * already changed physical type between rounds (TIMESTAMP(NANOS)
  * surfacing as Long → TIMESTAMP(MICROS) surfacing as TIMESTAMP_NTZ),
  * silently breaking every ts-as-Long consumer at the driver gate — this
  * spec makes the next storage change a unit-test failure instead. */
class TimeTypeSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val UsA = 1704412800123456L // 2024-01-05 00:00:00.123456 UTC
  private val UsB = 1704412800123457L

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_timetype_$tag").toString + "/t"

  test("load(events) presents ts as the canonical Long ns epoch with a " +
    "pushable ts_raw companion, whatever the parquet physical type") {
    val df = Tables.load(spark, SparkSpec.Sf0001, "events")
    assert(df.schema("ts").dataType === LongType)
    assert(df.columns.contains("ts_raw"))
    // ns values are exactly the µs epoch × 1000 (naive read as UTC)
    val bad = df.select((col("ts") - expr("unix_micros(cast(ts_raw as " +
      "timestamp)) * 1000")).as("d")).filter(col("d") =!= 0L).count()
    assert(bad === 0L)
  }

  test("nsCol is identity on Long, exact µs→ns on TIMESTAMP and " +
    "TIMESTAMP_NTZ") {
    val long = Seq((1L, UsA * 1000L)).toDF("id", "ts")
    assert(Tables.withNsTime(long).schema("ts").dataType === LongType)
    assert(Tables.withNsTime(long).select("ts").as[Long].head ===
      UsA * 1000L)

    val tz = Seq((1L, UsA)).toDF("id", "us")
      .select(col("id"), timestamp_micros(col("us")).as("ts"))
    assert(tz.schema("ts").dataType === TimestampType)
    assert(Tables.withNsTime(tz).select("ts").as[Long].head === UsA * 1000L)

    val ntz = tz.select(col("id"), col("ts").cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType === TimestampNTZType)
    assert(Tables.withNsTime(ntz).select("ts").as[Long].head === UsA * 1000L)
  }

  test("timeRange ns→µs boundary math is exact on µs-precision storage, " +
    "including ns bounds that split a microsecond") {
    val df = Seq(UsA, UsB).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    def n(s: Long, e: Long, strict: Boolean = false) =
      Tables.timeRange(df, "ts", s, e, strict).count()
    val nsA = UsA * 1000L
    // half-open [s, e): inclusive start, exclusive end, at exact edges
    assert(n(nsA, nsA + 1000L) === 1L)
    assert(n(nsA + 1000L, nsA + 2000L) === 1L)
    // a start bound INSIDE µs A (nsA+1 .. nsA+999) excludes A under >=;
    // an end bound inside A still ADMITS A (its ns value nsA < nsA+999)
    assert(n(nsA + 1L, nsA + 2000L) === 1L) // only B
    assert(n(nsA, nsA + 999L) === 1L)       // A in: nsA ∈ [nsA, nsA+999)
    // strict bounds: ts > s excludes the start edge itself
    assert(n(nsA, nsA + 2000L, strict = true) === 1L)  // A excluded, B in
    assert(n(nsA - 1L, nsA + 2000L, strict = true) === 2L)
  }

  test("timeRange bounds on timestamp storage land in the parquet scan's " +
    "PushedFilters as folded timestamp literals") {
    val dir = tmp("push")
    Seq(UsA, UsB).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"), col("us").as("v"))
      .write.parquet(dir)
    val raw = spark.read.parquet(dir)
    val scanned = Tables.timeRange(raw, "ts", UsA * 1000L, UsB * 1000L)
    scanned.collect(): Unit
    val plan = scanned.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    assert(pushed.contains("GreaterThanOrEqual(ts") &&
      pushed.contains("LessThan(ts"), plan.take(2000))
  }

  test("load-normalized frames keep range-filter pushdown via ts_raw") {
    val df = Tables.load(spark, SparkSpec.Sf0001, "events")
    val scanned = Tables.timeRange(df, "ts",
      1704412800000000000L, 1704499200000000000L)
    scanned.collect(): Unit
    // Catalyst substitutes the ts_raw alias back to the base scan
    // attribute when pushing the filter below the ns-projection, so the
    // pushed filter lands on `ts` itself — name-stable with the pre-
    // normalization plans PlanSpec pins.
    val pushed = scanned.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("GreaterThanOrEqual(ts,") &&
      pushed.contains("LessThan(ts,"), pushed)
  }
}
