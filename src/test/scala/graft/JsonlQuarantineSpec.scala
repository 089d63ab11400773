package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-input quarantine for the JSONL ingestion path: no line is
  * silently dropped — it parses under the explicit schema or lands in
  * `_corrupt_record` with its raw bytes. */
class JsonlQuarantineSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_jsonl_q").toString

  test("planted corrupt lines quarantine with raw bytes preserved; " +
    "clean lines roundtrip; clean + quarantined == total lines") {
    val d = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "delta eps"))
      .toDF("doc_id", "text")
    val dst = tmpDir()
    d.write.mode("overwrite").json(dst)
    val bad = Seq(
      """{"doc_id": 99, "text": "truncated""",
      "utterly not json",
      "{{")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dst, "part-bad.json"),
      bad.mkString("\n").getBytes("UTF-8")): Unit

    val r = Jsonl.readQuarantined(spark, dst, d.schema)
    assert(r.count() == 6) // 3 clean + 3 planted, none dropped
    val clean = r.filter(col(Jsonl.CorruptCol).isNull)
    assert(clean.select("doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet ==
      Set((1L, "alpha beta"), (2L, "gamma"), (3L, "delta eps")))
    // quarantined rows carry the raw line, data columns null
    val q = r.filter(col(Jsonl.CorruptCol).isNotNull).collect()
    assert(q.map(_.getString(2)).toSet == bad.toSet)
    assert(q.forall(_.isNullAt(0)))
  }

  test("type damage (string where a long belongs) also quarantines — " +
    "the raw line is preserved even though the record is valid JSON") {
    val dst = tmpDir()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dst, "part.json"),
      Seq("""{"doc_id": "not-a-number", "text": "t"}""",
        """{"doc_id": 7, "text": "ok"}""")
        .mkString("\n").getBytes("UTF-8")): Unit
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val r = Jsonl.readQuarantined(spark, dst, schema)
    val byText = r.collect()
      .map(x => Option(x.getString(2)).isDefined -> x).toMap
    assert(r.count() == 2)
    val damaged = byText(true)
    assert(damaged.getString(2).contains("not-a-number"))
    val ok = byText(false)
    assert(ok.getLong(0) == 7L && ok.getString(1) == "ok")
  }

  test("quarantineSummary: one row per status with clean id checksum") {
    val d = Seq((10L, "a"), (20L, "b")).toDF("doc_id", "text")
    val dst = tmpDir()
    d.write.mode("overwrite").json(dst)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dst, "part-bad.json"),
      "nope".getBytes("UTF-8")): Unit
    val s = Jsonl.quarantineSummary(
        Jsonl.readQuarantined(spark, dst, d.schema), "doc_id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(s("clean") == (2L, Some(30L)))
    assert(s("quarantined") == (1L, None))
  }
}
