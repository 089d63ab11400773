package graft.sources

import graft.model.{FieldSch, FieldType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** InfluxDB line-protocol codec.
  *
  * The reference moves points as decoded JSON result-sets and re-encodes
  * them via the influx client's `client.Point`
  * (/root/reference/pkg/agent/client.go:392-478, 471-476); line protocol
  * is the wire format underneath. Our engine keeps data in Parquet but
  * ships this codec so a user can emit/ingest real Influx wire data.
  *
  * Format: `measurement,tag1=v1,tag2=v2 field1=1.5,field2=3i,field3="s" ts`
  *
  * Encoding rules implemented (public line-protocol spec):
  *  - measurement: escape `,` and space;
  *  - tag keys/values: escape `,`, `=`, space; tags sorted by key;
  *  - field values: float plain, integer with `i` suffix, unsigned with
  *    `u` suffix, boolean true/false, string double-quoted with `\` and
  *    `"` escaped;
  *  - NULL fields are dropped entirely (absent ≠ null in Influx — the
  *    reference skips null JSON values, client.go:428-429);
  *  - timestamp: ns epoch.
  *
  * Everything is built from codegen'd `Column` ops — the encoder is a
  * projection, so it runs distributed with no UDFs.
  */
object LineProtocol {

  private def escTag(c: Column): Column =
    regexp_replace(c, "([,= ])", "\\\\$1")

  private def escMeasurement(c: Column): Column =
    regexp_replace(c, "([, ])", "\\\\$1")

  private def escFieldString(c: Column): Column =
    concat(lit("\""),
      regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
      lit("\""))

  /** Render one field's `key=value` fragment (null → null, dropped by
    * concat_ws downstream). */
  private def fieldFragment(name: String, dt: DataType, ft: FieldType)
      : Column = {
    val v = col(name)
    val rendered = ft match {
      case FieldType.Integer  => concat(v.cast("long").cast("string"), lit("i"))
      case FieldType.Unsigned =>
        concat(v.cast(DecimalType(20, 0)).cast("string"), lit("u"))
      case FieldType.Bool     => v.cast("boolean").cast("string")
      case FieldType.Str      => escFieldString(v.cast("string"))
      case FieldType.Float    => v.cast("double").cast("string")
    }
    when(v.isNull, lit(null.asInstanceOf[String]))
      .otherwise(concat(lit(escapeKey(name) + "="), rendered))
  }

  private def escapeKey(k: String): String =
    k.replaceAll("([,= ])", "\\\\$1")

  /** Encode rows to line-protocol strings.
    *
    * @param measurement measurement name (literal)
    * @param tagCols     tag columns (values stringified; encoded sorted
    *                    by tag key as Influx canonicalizes)
    * @param fields      field name → declared Influx type
    * @param timeNsCol   ns-epoch Long column
    */
  def encode(
      df: DataFrame,
      measurement: String,
      tagCols: Seq[String],
      fields: Map[String, FieldSch],
      timeNsCol: String): DataFrame = {
    val meas = escMeasurement(lit(measurement))
    val tagPart = tagCols.sorted.map { t =>
      when(col(t).isNull, lit(null.asInstanceOf[String]))
        .otherwise(concat(lit("," + escapeKey(t) + "="),
          escTag(col(t).cast("string"))))
    }
    val schema = df.schema
    val fieldFrags = fields.toSeq.sortBy(_._1).map { case (n, f) =>
      fieldFragment(n, schema(n).dataType, f.ftype)
    }
    val line = concat(
      concat(Seq(meas) ++ tagPart: _*),
      lit(" "),
      concat_ws(",", fieldFrags: _*), // nulls dropped (client.go:428-429)
      lit(" "),
      col(timeNsCol).cast("string"))
    df.select(line.as("line"))
  }

  /** A decoded line-protocol point: the engine analog of
    * `client.Point(name, tags, fields, ts)` (client.go:471-476). Field
    * values stay raw strings here (with type suffix/quotes stripped) --
    * apply `TypeCoercion` with a field schema to get typed columns,
    * mirroring the reference's two-step decode (client.go:392-478). */
  final case class LinePoint(
      measurement: String,
      tags: Map[String, String],
      fields: Map[String, String],
      timeNs: Long)

  /** Parse one line. Hand-rolled scanner (escape- and quote-aware; a
    * regex/split pipeline cannot handle spaces inside quoted string
    * fields). Distributed use: `ds.map(LineProtocol.parseLine)` -- plain
    * Scala in the partition, per SURVEY.md §7.2. */
  def parseLine(line: String): LinePoint = {
    val n = line.length
    var i = 0
    val sb = new StringBuilder

    def scanUntil(stops: Set[Char], inQuotes: Boolean = false): String = {
      sb.clear()
      var quoted = false
      while (i < n && (quoted || !stops.contains(line.charAt(i)))) {
        val c = line.charAt(i)
        if (c == '\\' && i + 1 < n) {
          val next = line.charAt(i + 1)
          if (quoted) {
            if (next == '"' || next == '\\') { sb.append(next); i += 2 }
            else { sb.append(c); i += 1 }
          } else if (next == ',' || next == '=' || next == ' ') {
            sb.append(next); i += 2
          } else { sb.append(c); i += 1 }
        } else if (inQuotes && c == '"') {
          quoted = !quoted; i += 1
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    val measurement = scanUntil(Set(',', ' '))
    var tags = Map.empty[String, String]
    while (i < n && line.charAt(i) == ',') {
      i += 1
      val k = scanUntil(Set('='))
      i += 1
      val v = scanUntil(Set(',', ' '))
      tags += (k -> v)
    }
    require(i < n && line.charAt(i) == ' ', s"malformed line: $line")
    i += 1
    var fields = Map.empty[String, String]
    var done = false
    while (!done) {
      val k = scanUntil(Set('='))
      i += 1
      val v = scanUntil(Set(',', ' '), inQuotes = true)
      fields += (k -> v)
      if (i < n && line.charAt(i) == ',') i += 1 else done = true
    }
    val ts =
      if (i < n && line.charAt(i) == ' ') line.substring(i + 1).trim.toLong
      else 0L
    LinePoint(measurement, tags, fields, ts)
  }
}
