package graft.api

import graft.model.FieldType
import graft.sources.{LineProtocol, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The InfluxDB 1.x `/write` plane: line-protocol text in, idempotent
  * point upsert into the engine's chunk-partitioned measurements —
  * together with /query this makes the engine a drop-in stand-in for
  * the API surface the reference's own client consumes (client.go
  * reads AND writes InfluxDB 1.x).
  *
  * Semantics pinned:
  *  - last write wins per (series key, timestamp) — within a batch
  *    the LATER line overrides (InfluxDB's own behavior), and any
  *    incoming point overrides a stored one
  *    ([[graft.operators.CopyJob.upsertPoints]]);
  *  - a line's keys resolve against the measurement's PARQUET schema:
  *    a key may arrive as an LP tag (always strings on the wire) or
  *    an LP field — either coerces to the stored column type (tags
  *    via CAST, fields via the full suffix-aware coercion matrix);
  *  - STRICT batches: any malformed non-blank line refuses the whole
  *    write (a pinned deviation from InfluxDB's partial-write 400 —
  *    silently persisting half a batch is how replicas diverge), and
  *    EVERY batch-level precondition (line shape, timestamps,
  *    measurement existence, sink layout) is validated BEFORE the
  *    first point persists — a refused batch leaves storage untouched;
  *  - timestampless lines refuse: valid LP that InfluxDB stamps with
  *    server receive time, but under last-write-wins upsert the 0L
  *    default would silently collapse the batch onto epoch 0 — a
  *    strict-batch plane has no business inventing timestamps;
  *  - measurements auto-create on first write (InfluxDB 1.x
  *    semantics, the plane the reference's copy loop exercises on a
  *    fresh slave): tags become string columns, fields take the LP
  *    literal's type (`i`→long, `u`→uint64 decimal, t/f→boolean,
  *    numeric→double, else string — client.go:430-459 in reverse),
  *    time lands as the canonical ns-epoch Long, and the series key
  *    is the line's tag set (InfluxDB's own series identity).
  *    `autoCreate = false` restores the schema-first refusal for
  *    deployments that prefer declared schemas over first-line type
  *    inference (a quoted "123" infers float — the quote marks are
  *    consumed by the scanner).
  */
final class WriteService(
    spark: SparkSession,
    root: String,
    /** measurement → series key columns (the tag set identity). A
      * measurement absent here defaults to its string columns. */
    seriesCols: Map[String, Seq[String]] = Map.empty,
    chunkNs: Long = 86400000000000L,
    timeCol: String = "ts",
    autoCreate: Boolean = true) {

  /** Write one line-protocol batch; returns points written. */
  def write(body: String): Long = {
    val lines = body.split('\n').map(_.stripSuffix("\r"))
      .filter(_.trim.nonEmpty).toSeq
    require(lines.nonEmpty, "empty write body")
    val points = lines.zipWithIndex.map { case (l, i) =>
      val p = LineProtocol.parseLineOpt(l).getOrElse(
        throw new IllegalArgumentException(
          s"malformed line protocol at line ${i + 1}: $l"))
      require(p.hasTime, s"line ${i + 1} has no timestamp — the " +
        "strict /write plane does not stamp server time (a " +
        "timestampless batch would collapse onto epoch 0 under " +
        s"last-write-wins): $l")
      p -> i.toLong
    }
    val schema = new graft.catalog.Catalog(spark).getSchema(root)
    val byMeasurement = points.groupBy(_._1.measurement).toSeq
      .sortBy(_._1)
    // resolve + validate EVERY measurement before writing ANY: the
    // strict-batch contract is atomic refusal, so an unknown 'zzz'
    // must not leave 'aaa' half-persisted (per-measurement writes are
    // ordered by name — the require would otherwise fire mid-batch)
    val resolved = byMeasurement.map { case (m, pts) =>
      val known = (for {
        d <- schema; rp <- d.rps; mm <- rp.measurements
        if mm.name == m
      } yield (d.name, rp.name)).headOption
      require(known.isDefined || autoCreate,
        s"unknown measurement '$m' — create it first (schema-first " +
          "writes; autoCreate disabled)")
      val path = known.map { case (db, rp) =>
        measurementPath(db, rp, m)
      }
      path.foreach(requireChunkLayout(m, _)) // pre-validate, all-or-none
      (m, path, pts)
    }
    resolved.foreach {
      case (m, Some(path), pts) => writeMeasurement(m, path, pts)
      case (m, None, pts)       => createMeasurement(m, pts)
    }
    points.size.toLong
  }

  private def measurementPath(db: String, rp: String, m: String)
      : String = {
    val conf = spark.sessionState.newHadoopConf()
    val flat = s"$root/$m.parquet"
    val hp = new org.apache.hadoop.fs.Path(flat)
    if (hp.getFileSystem(conf).exists(hp)) flat
    else s"$root/$db/$rp/$m.parquet"
  }

  private def ftypeOf(dt: DataType): FieldType = dt match {
    case DoubleType | FloatType       => FieldType.Float
    case LongType | IntegerType |
         ShortType | ByteType         => FieldType.Integer
    case d: DecimalType if d.scale == 0 => FieldType.Unsigned
    case BooleanType                  => FieldType.Bool
    case _                            => FieldType.Str
  }

  /** The upsert needs the chunk-partitioned sink layout (mixing
    * __bucket dirs into a flat parquet dir would corrupt partition
    * discovery). Separated from the write so the batch pre-pass can
    * validate all targets before any of them is touched. */
  private def requireChunkLayout(m: String, path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(hp) || !fs.listStatus(hp).exists(st =>
        st.isFile && st.getPath.getName.startsWith("part-")),
      s"measurement '$m' is a flat parquet — /write needs the " +
        "chunk-partitioned sink layout (copy/replicate it first)")
  }

  /** First write to an unknown measurement: infer the schema from the
    * batch (InfluxDB 1.x auto-create). Tags → string columns; each
    * field takes its LP literal type from the FIRST line carrying it;
    * time is the canonical ns Long. Created flat (`root/<m>.parquet`)
    * in the chunk-partitioned layout, series key = the tag set. */
  private def createMeasurement(m: String,
      pts: Seq[(LineProtocol.LinePoint, Long)]): Unit = {
    import spark.implicits._
    val tagKeys = pts.flatMap(_._1.tags.keys).distinct.sorted
    val fieldKeys = pts.flatMap(_._1.fields.keys).distinct.sorted
      .filterNot(tagKeys.contains)
    require(!tagKeys.contains(timeCol) && !fieldKeys.contains(timeCol),
      s"auto-create: '$timeCol' collides with the time column")
    val fieldTypes: Map[String, FieldType] = fieldKeys.map { k =>
      val raw = pts.iterator.map(_._1.fields.get(k))
        .collectFirst { case Some(v) => v }.get
      k -> inferFieldType(raw)
    }.toMap
    val df0 = pts.map { case (p, i) =>
      (p.tags, p.fields, p.timeNs, i)
    }.toDF("tags", "fields", "timeNs", "__line")
    val cols: Seq[Column] =
      (col("timeNs").as(timeCol) +:
        tagKeys.map(k => col("tags")(k).as(k))) ++
        fieldKeys.map(k =>
          LineProtocol.coerceField(col("fields")(k), fieldTypes(k))
            .as(k)) :+ col("__line")
    val key = seriesCols.getOrElse(m,
      if (tagKeys.nonEmpty) tagKeys else fieldKeys.take(1))
    val job = new graft.operators.CopyJob(spark)
    job.upsertPoints(s"$root/$m.parquet", df0.select(cols: _*),
      graft.operators.CopyJob.Config(0L, 0L, chunkNs,
        timeCol = timeCol),
      keyCols = key): Unit
  }

  /** LP literal → stored type (the client.go:430-459 coercion matrix
    * in reverse): `NNNi` integer, `NNNu` unsigned, t/f/true/false
    * boolean, bare numeric float, anything else string. */
  private def inferFieldType(raw: String): FieldType =
    if (raw.matches("-?\\d+i")) FieldType.Integer
    else if (raw.matches("\\d+u")) FieldType.Unsigned
    else if (Set("t", "true", "f", "false")(raw.toLowerCase))
      FieldType.Bool
    else if (raw.matches("-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?"))
      FieldType.Float
    else FieldType.Str

  private def writeMeasurement(m: String, path: String,
      pts: Seq[(LineProtocol.LinePoint, Long)]): Unit = {
    import spark.implicits._
    val target = spark.read.parquet(path).drop("__bucket")
    val df0 = pts.map { case (p, i) =>
      (p.tags, p.fields, p.timeNs, i)
    }.toDF("tags", "fields", "timeNs", "__line")
    val cols: Seq[Column] = target.schema.fields.toSeq.map { f =>
      if (f.name == timeCol) {
        val c = f.dataType match {
          case TimestampType | TimestampNTZType =>
            expr("timestamp_micros(timeNs div 1000)").cast(f.dataType)
          case _ => col("timeNs").cast(f.dataType)
        }
        c.as(timeCol)
      } else {
        // the key may arrive as LP tag (string) or LP field (raw
        // string with type suffix) — whichever is present wins
        val fromField =
          LineProtocol.coerceField(col("fields")(f.name),
            ftypeOf(f.dataType)).cast(f.dataType)
        val fromTag = col("tags")(f.name).cast(f.dataType)
        coalesce(fromField, fromTag).as(f.name)
      }
    } :+ col("__line")
    val decoded = df0.select(cols: _*)
    val key = seriesCols.getOrElse(m,
      target.schema.fields.toSeq
        .filter(_.dataType == StringType).map(_.name))
    val job = new graft.operators.CopyJob(spark)
    job.upsertPoints(path, decoded,
      graft.operators.CopyJob.Config(0L, 0L, chunkNs,
        timeCol = timeCol),
      keyCols = key): Unit
  }
}
