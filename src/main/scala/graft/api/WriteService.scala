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
  *    silently persisting half a batch is how replicas diverge);
  *  - the measurement must already exist (schema-first: auto-creating
  *    from one line's type guesses is how InfluxDB deployments end up
  *    with float columns full of would-be integers); unknown
  *    measurements refuse loudly.
  */
final class WriteService(
    spark: SparkSession,
    root: String,
    /** measurement → series key columns (the tag set identity). A
      * measurement absent here defaults to its string columns. */
    seriesCols: Map[String, Seq[String]] = Map.empty,
    chunkNs: Long = 86400000000000L,
    timeCol: String = "ts") {

  /** Write one line-protocol batch; returns points written. */
  def write(body: String): Long = {
    val lines = body.split('\n').map(_.stripSuffix("\r"))
      .filter(_.trim.nonEmpty).toSeq
    require(lines.nonEmpty, "empty write body")
    val points = lines.zipWithIndex.map { case (l, i) =>
      LineProtocol.parseLineOpt(l).getOrElse(
        throw new IllegalArgumentException(
          s"malformed line protocol at line ${i + 1}: $l")) -> i.toLong
    }
    val schema = new graft.catalog.Catalog(spark).getSchema(root)
    points.groupBy(_._1.measurement).toSeq.sortBy(_._1).foreach {
      case (m, pts) =>
        val known = (for {
          d <- schema; rp <- d.rps; mm <- rp.measurements
          if mm.name == m
        } yield (d.name, rp.name)).headOption
        require(known.isDefined, s"unknown measurement '$m' — " +
          "create it first (schema-first writes; no auto-create)")
        val (db, rp) = known.get
        writeMeasurement(m, measurementPath(db, rp, m), pts)
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

  private def writeMeasurement(m: String, path: String,
      pts: Seq[(LineProtocol.LinePoint, Long)]): Unit = {
    import spark.implicits._
    // upsert needs the chunk-partitioned sink layout (mixing __bucket
    // dirs into a flat parquet dir would corrupt partition discovery)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.listStatus(hp).exists(st =>
        st.isFile && st.getPath.getName.startsWith("part-")),
      s"measurement '$m' is a flat parquet — /write needs the " +
        "chunk-partitioned sink layout (copy/replicate it first)")
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
