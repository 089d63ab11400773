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
    // null tags are OMITTED from the line, not nulled-through: concat is
    // null-propagating, so each fragment is coalesced to "" — otherwise a
    // single null tag would silently null the whole encoded line.
    val tagPart = tagCols.sorted.map { t =>
      coalesce(
        concat(lit("," + escapeKey(t) + "="), escTag(col(t).cast("string"))),
        lit(""))
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
    // a point with no non-null field is invalid in line protocol (the
    // reference never emits one either: null JSON values are skipped and
    // an all-null row yields no point, client.go:428-429) — drop it
    // rather than emit a malformed `meas  ts` line.
    df.filter(fields.keys.map(col(_).isNotNull).reduce(_ || _))
      .select(line.as("line"))
  }

  /** A decoded line-protocol point: the engine analog of
    * `client.Point(name, tags, fields, ts)` (client.go:471-476). Field
    * values stay raw strings here (quotes stripped, type suffix kept) --
    * `decodeTyped` applies the per-field coercion matrix to get typed
    * columns, mirroring the reference's two-step decode
    * (client.go:392-478). */
  final case class LinePoint(
      measurement: String,
      tags: Map[String, String],
      fields: Map[String, String],
      timeNs: Long,
      /** False when the line carried NO timestamp — valid LP that
        * InfluxDB stamps with server receive time; consumers that
        * cannot stamp (the strict /write plane) must refuse instead
        * of letting the 0L default collapse a batch onto epoch 0. */
      hasTime: Boolean = true,
      /** Field keys whose value arrived double-quoted on the wire.
        * The scanner consumes the quote marks, so without this flag a
        * quoted numeric/boolean literal (`v="123"`, `v="true"`) is
        * indistinguishable from the bare one — and InfluxDB types
        * quoted values as STRINGS (client.go:453-461). Auto-create
        * type inference must consult this, not the raw text. */
      quotedFields: Seq[String] = Nil)

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
    var quoted = List.empty[String]
    var done = false
    while (!done) {
      val k = scanUntil(Set('='))
      require(i < n && line.charAt(i) == '=',
        s"malformed field set (no '='): $line")
      i += 1
      if (i < n && line.charAt(i) == '"') quoted ::= k
      val v = scanUntil(Set(',', ' '), inQuotes = true)
      fields += (k -> v)
      if (i < n && line.charAt(i) == ',') i += 1 else done = true
    }
    val ts =
      if (i < n && line.charAt(i) == ' ')
        Some(line.substring(i + 1).trim.toLong)
      else None
    LinePoint(measurement, tags, fields, ts.getOrElse(0L),
      hasTime = ts.isDefined, quotedFields = quoted.reverse)
  }

  /** Typed coercion of one raw field value, per the declared Influx type —
    * the engine's version of the reference's decode matrix
    * (client.go:430-459):
    *  - float    → DoubleType (vt.Float64, client.go:434-440);
    *  - integer  → strip `i` suffix → LongType (vt.Int64, 441-446);
    *  - unsigned → strip `u` suffix → DecimalType(20,0) — full uint64
    *    range incl. values > Long.MaxValue (strconv.ParseUint, 447-452;
    *    SURVEY.md §7.3 hard part 5);
    *  - boolean  → t/T/true/True/TRUE | f/F/false/False/FALSE (the line
    *    protocol's accepted boolean literals) → BooleanType;
    *  - string   → passthrough (quotes/escapes already handled by the
    *    scanner, 453-461).
    * Absent fields (null map lookup) stay null → dropped on re-encode. */
  def coerceField(raw: Column, ft: FieldType): Column = ft match {
    case FieldType.Float    => raw.cast("double")
    case FieldType.Integer  => regexp_replace(raw, "i$", "").cast("long")
    case FieldType.Unsigned =>
      regexp_replace(raw, "u$", "").cast(DecimalType(20, 0))
    case FieldType.Bool =>
      when(lower(raw).isin("t", "true"), lit(true))
        .when(lower(raw).isin("f", "false"), lit(false))
        .otherwise(lit(null).cast("boolean"))
    case FieldType.Str => raw
  }

  /** Total variant of parseLine: malformed input → None instead of a
    * throw. The streaming ingestion path uses this — a single poison
    * line must not crash-loop a checkpointed query forever. */
  def parseLineOpt(line: String): Option[LinePoint] =
    if (line == null || line.trim.isEmpty) None
    else scala.util.Try(parseLine(line)).toOption

  /** Decode a column of line-protocol strings into a typed DataFrame:
    * `measurement, tag_<k>..., <field columns typed per schema>, time_ns`.
    * The scanner runs as plain Scala inside the partition (`Dataset.map`,
    * SURVEY.md §7.2 — quote/escape-aware scanning isn't regex-expressible);
    * the coercion matrix is codegen'd Column ops on top. Malformed and
    * blank lines are DROPPED (parseLineOpt): in a continuous pipeline a
    * poison line would otherwise wedge the stream — the checkpoint
    * re-reads the same file on every restart. */
  def decodeTyped(
      lines: DataFrame,
      lineCol: String,
      tagKeys: Seq[String],
      fields: Map[String, FieldSch]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val pts = lines.select(col(lineCol)).as[String]
      .flatMap(parseLineOpt(_)).toDF()
    val tagCols = tagKeys.map(k => col("tags")(k).as(s"tag_$k"))
    val fieldCols = fields.toSeq.sortBy(_._1).map { case (n, f) =>
      coerceField(col("fields")(n), f.ftype).as(n)
    }
    pts.select(
      (col("measurement") +: tagCols) ++ fieldCols
        :+ col("timeNs").as("time_ns"): _*)
  }

  /** [[decodeTyped]] with malformed-record QUARANTINE instead of the
    * silent drop — the [[Jsonl]] posture for the line-protocol plane:
    * every NON-BLANK input line yields exactly one output row, either
    * typed columns (parse succeeded, `_corrupt_record` null) or null
    * data columns with the raw line preserved in `_corrupt_record`
    * for triage. Blank/whitespace lines remain dropped (separator
    * noise, not records — decodeTyped's continuous-pipeline
    * convention). Same plan shape as decodeTyped: partition-local
    * scanner + codegen'd coercion projection, zero exchanges. */
  def decodeTypedQuarantined(
      lines: DataFrame,
      lineCol: String,
      tagKeys: Seq[String],
      fields: Map[String, FieldSch]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val pts = lines.select(col(lineCol)).as[String]
      .filter((l: String) => l != null && l.trim.nonEmpty)
      .map { l =>
        parseLineOpt(l) match {
          case Some(p) => (p.measurement, p.tags, p.fields,
            Option(p.timeNs), Option.empty[String])
          case None => (null: String, null: Map[String, String],
            null: Map[String, String], Option.empty[Long], Option(l))
        }
      }
      .toDF("measurement", "tags", "fields", "timeNs",
        Jsonl.CorruptCol)
    val tagCols = tagKeys.map(k => col("tags")(k).as(s"tag_$k"))
    val fieldCols = fields.toSeq.sortBy(_._1).map { case (n, f) =>
      coerceField(col("fields")(n), f.ftype).as(n)
    }
    pts.select(
      (col("measurement") +: tagCols) ++ fieldCols
        :+ col("timeNs").as("time_ns") :+ col(Jsonl.CorruptCol): _*)
  }
}
