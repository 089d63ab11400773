package graft

import graft.sources.{Csv, Jsonl}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-input quarantine for the CSV ingestion path (the trio's
  * third plane): no line silently dropped, quarantined records
  * all-or-nothing (PERMISSIVE's partially-parsed fields are nulled —
  * a partially-trusted record is not trusted). */
class CsvQuarantineSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("n", LongType)))

  private def write(lines: Seq[String]): String = {
    val dst =
      java.nio.file.Files.createTempDirectory("graft_csv_q").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dst, "part.csv"),
      lines.mkString("\n").getBytes("UTF-8")): Unit
    dst
  }

  test("clean lines roundtrip; type damage and surplus fields " +
    "quarantine the WHOLE line (partially-parsed fields nulled, raw " +
    "line preserved); clean + quarantined == total") {
    val dst = write(Seq(
      "1,alpha beta,10",
      "2,gamma,20",
      "notanumber,delta,30",      // id damage
      "3,epsilon,notanumber",     // numeric-field damage, id parseable
      "4,zeta,40,surplus"))       // extra trailing field
    val r = Csv.readQuarantined(spark, dst, schema)
    assert(r.count() === 5)
    val clean = r.filter(col(Csv.CorruptCol).isNull).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSet
    assert(clean === Set((1L, "alpha beta", 10L), (2L, "gamma", 20L)))
    val q = r.filter(col(Csv.CorruptCol).isNotNull).collect()
    assert(q.map(_.getString(3)).toSet === Set(
      "notanumber,delta,30", "3,epsilon,notanumber", "4,zeta,40,surplus"))
    // all-or-nothing: even the parseable doc_id of a damaged line is
    // nulled in the typed columns
    assert(q.forall(x => x.isNullAt(0) && x.isNullAt(1) && x.isNullAt(2)))
  }

  test("quoted separators survive the roundtrip as data, not damage; " +
    "the quarantine summary composes across source formats") {
    val d = Seq((1L, "with, comma", 5L), (2L, "plain", 6L))
      .toDF("doc_id", "text", "n")
    val dst =
      java.nio.file.Files.createTempDirectory("graft_csv_rt").toString
    d.write.mode("overwrite").option("header", "false").csv(dst)
    val r = Csv.readQuarantined(spark, dst, schema)
    assert(r.filter(col(Csv.CorruptCol).isNotNull).count() === 0)
    assert(r.select("text").collect().map(_.getString(0)).toSet ===
      Set("with, comma", "plain"))
    val summary = Jsonl.quarantineSummary(r, "doc_id").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(summary === Map("clean" -> 2L))
  }
}
