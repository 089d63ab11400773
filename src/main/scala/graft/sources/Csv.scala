package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** CSV source with malformed-record quarantine — the third plane of
  * the malformed-input trio (JSONL: [[Jsonl]]; line protocol:
  * `LineProtocol.decodeTypedQuarantined`). Same contract: NO line is
  * silently dropped — a record either parses under the explicit
  * schema or lands in `_corrupt_record` with its raw bytes preserved.
  *
  * Shape: `spark.read.text` + one row-local `from_csv` projection —
  * the same deliberate choice as Jsonl (the DataFrameReader's
  * PERMISSIVE corrupt column cannot be filtered without caching the
  * whole frame; the from_csv form is a pure projection, scan-bound at
  * any scale, and the explicit schema skips inference's extra pass).
  */
object Csv {

  /** Shared with [[Jsonl.CorruptCol]] so quarantine summaries/filters
    * compose across source formats. */
  final val CorruptCol = Jsonl.CorruptCol

  /** Read `path` as headerless CSV under `schema`; output carries the
    * schema's columns plus [[CorruptCol]] (null ⇔ the line parsed).
    * Type damage in any field and extra trailing fields both
    * quarantine the whole raw line (a partially-trusted record is not
    * trusted). */
  def readQuarantined(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains $CorruptCol")
    val withCorrupt = schema.add(CorruptCol, StringType, nullable = true)
    spark.read.text(path)
      .select(from_csv(col("value"),
        withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("c"))
      .select(schema.fieldNames.toIndexedSeq.map(f =>
        // CSV PERMISSIVE keeps the fields it COULD parse on a damaged
        // line; a partially-trusted record is not trusted, so data
        // columns are nulled whenever the corrupt marker is set (the
        // raw line in CorruptCol retains everything for triage)
        when(col(s"c.`$CorruptCol`").isNull, col(s"c.`$f`"))
          .otherwise(lit(null)).as(f)) :+
        col(s"c.`$CorruptCol`").as(CorruptCol): _*)
  }
}
