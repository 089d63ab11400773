package graft.catalog

import java.io.File

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Catalog discovery with regex filtering and rename rewrite.
  *
  * The reference discovers its schema dynamically at runtime by walking
  * databases → retention policies → measurements → fields with `SHOW`
  * queries, applying user regexes at each level
  * (`GetSchema`, /root/reference/pkg/agent/hacluster.go:75-162; db filter
  * 85-99, rp filter 108-121, measurement filter 129-143), and then applies
  * `-newdb`/`-newrp` renames (/root/reference/pkg/agent/agent.go:157-167,
  * 220-229). The `_internal` system database is always excluded
  * (client.go:169-171).
  *
  * Engine mapping: a storage root is a directory tree
  * `root/<db>/<rp>/<measurement>.parquet`; a flat `root/<m>.parquet`
  * layout (the driver's TESTDATA) surfaces as db="default", rp="autogen".
  * Fields come from the Parquet footer schema instead of SHOW FIELD KEYS.
  */
final class Catalog(spark: SparkSession) {

  /** SHOW DATABASES analog (client.go:158-183). */
  def databases(root: String): Seq[String] = {
    val subdirs = listDirs(root)
    val dbs = if (subdirs.nonEmpty) subdirs.map(_.getName) else Seq("default")
    dbs.filter(_ != "_internal").sorted // _internal exclusion client.go:169-171
  }

  /** SHOW MEASUREMENTS analog: parquet tables under a (db, rp) dir, or the
    * flat root (client.go:271-310). */
  def measurements(dir: String): Seq[String] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet"))
      .sorted.toSeq

  /** SHOW FIELD KEYS analog: Parquet footer schema → FieldSch map, using
    * the inverse of the §1.2 type mapping. */
  def fields(path: String): Map[String, FieldSch] = {
    val schema = spark.read.parquet(path).schema
    schema.fields.map { f =>
      val ft = f.dataType match {
        case DoubleType | FloatType       => FieldType.Float
        case LongType | IntegerType       => FieldType.Integer
        case _: DecimalType               => FieldType.Unsigned
        case BooleanType                  => FieldType.Bool
        case _                            => FieldType.Str
      }
      f.name -> FieldSch(f.name, ft)
    }.toMap
  }

  /** Full GetSchema analog: walk root, apply regex filters at each level,
    * then the rename rewrite. Flat roots surface as default/autogen.
    * (hacluster.go:75-162 + agent.go:157-167.) */
  def getSchema(
      root: String,
      dbRegex: String = ".*",
      rpRegex: String = ".*",
      measRegex: String = ".*",
      newDb: String = "",
      newRp: String = ""): Seq[DbSchema] = {
    val dbRe = dbRegex.r
    val rpRe = rpRegex.r
    val measRe = measRegex.r
    val hierarchical = listDirs(root).nonEmpty

    def measurementsOf(dir: String): Seq[MeasurementSch] =
      measurements(dir)
        .filter(m => measRe.findFirstIn(m).isDefined) // hacluster.go:140-143
        .map(m => MeasurementSch(m, fields(s"$dir/$m.parquet")))

    val dbs =
      if (!hierarchical) {
        val ms = measurementsOf(root)
        if (ms.isEmpty) Nil
        else Seq(DbSchema("default", "", "autogen", "",
          Seq(RetentionPolicy("autogen", 0L, 0L, 1, isDefault = true, ms))))
      } else {
        databases(root)
          .filter(d => dbRe.findFirstIn(d).isDefined) // hacluster.go:85-99
          .flatMap { db =>
            val rpDirs = listDirs(s"$root/$db").map(_.getName)
              .filter(rp => rpRe.findFirstIn(rp).isDefined) // hacluster.go:108-121
              .sorted
            val rps = rpDirs.map { rp =>
              RetentionPolicy(rp, 0L, 0L, 1,
                isDefault = rp == rpDirs.head,
                measurementsOf(s"$root/$db/$rp"))
            }
            if (rps.isEmpty) None
            else Some(DbSchema(db, "", rps.head.name, "", rps))
          }
      }

    // rename rewrite (agent.go:157-167, 220-229): only meaningful when a
    // single db/rp matched, same restriction as the reference CLI.
    dbs.map { d =>
      d.copy(
        newName = newDb,
        newDefaultRp = if (newRp.nonEmpty) newRp else d.newDefaultRp)
    }
  }

  private def listDirs(path: String): Seq[File] =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).sortBy(_.getName).toSeq
}
