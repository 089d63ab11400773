package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Newline-delimited JSON source with malformed-record quarantine —
  * the first thing 100 TB of crawl data actually contains is lines
  * that are not JSON (truncated uploads, interleaved logs, encoding
  * damage). The clean-corpus read path is `source_jsonl_roundtrip`;
  * this adds the production posture: NO line is silently dropped — a
  * record either parses under the explicit schema or lands in
  * `_corrupt_record` with its raw bytes preserved for triage.
  *
  * Shape: `spark.read.text` (splittable line scan) + one row-local
  * `from_json` projection. Deliberately NOT `spark.read.json`'s
  * PERMISSIVE mode: filtering its corrupt column requires caching the
  * whole frame first (Spark forbids corrupt-column-only references on
  * the direct read — a 100 TB cache to count bad lines), while the
  * `from_json` form is a pure projection any downstream
  * filter/aggregate composes with, scan-bound at any scale. The
  * explicit schema also skips inference's full extra pass over the
  * data. */
object Jsonl {

  final val CorruptCol = "_corrupt_record"

  /** Read `path` as JSONL under `schema`; output carries the schema's
    * columns plus [[CorruptCol]] (null ⇔ the line parsed). A malformed
    * line yields a row with null data columns and its raw text in
    * [[CorruptCol]]; a parse-able line with type damage (e.g. a string
    * where a long belongs) also quarantines — the damaged field alone
    * cannot be trusted, so the raw line is preserved. */
  def readQuarantined(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains $CorruptCol")
    val withCorrupt = schema.add(CorruptCol, StringType, nullable = true)
    spark.read.text(path)
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("j"))
      .select(schema.fieldNames.toIndexedSeq.map(f => col(s"j.`$f`")) :+
        col(s"j.`$CorruptCol`").as(CorruptCol): _*)
  }

  /** Quarantine summary: one row per status (`clean` / `quarantined`)
    * with row count and the clean side's id checksum — the triage
    * number an ingestion job alerts on. One partial+final aggregate
    * over the scan. */
  def quarantineSummary(df: DataFrame, idCol: String): DataFrame =
    df.groupBy(when(col(CorruptCol).isNull, lit("clean"))
        .otherwise(lit("quarantined")).as("status"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(idCol)).as("id_sum"))
}
