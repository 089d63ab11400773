package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The self-defending correctness gate (round-7 incident: the driver's
  * correctness JSON OMITS queries with no result, so 39 analysis-failing
  * queries silently vanished for a full round). [[Verify.run]] must
  * leave an explicit failure-marker parquet in a broken query's slot —
  * a visible red row at compare time — never an empty slot. */
class VerifyGateSpec extends AnyFunSuite {

  test("a deliberately-broken query leaves a failure-marker parquet " +
    "and a registry.json entry — never an omission") {
    val spark = SparkSpec.spark
    val out = java.nio.file.Files
      .createTempDirectory("graft_verify_gate").toString
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_query" -> ((s, _) => s.range(3).toDF("id")),
      "broken_query" -> ((_, _) =>
        throw new RuntimeException("deliberate gate-spec failure")),
      "broken_no_oracle" -> ((s, _) =>
        // fails at ACTION time (ANSI divide-by-zero), not plan time —
        // the marker must also catch mid-write failures
        s.range(3).selectExpr("id / 0 AS x")))
    Verify.run(spark, queries,
      Map("ok_query" -> "SELECT * FROM range(3)",
        "broken_query" -> "SELECT 1 AS one"),
      sfDir = "/nonexistent", outDir = out)

    // the healthy query dumped normally
    assert(spark.read.parquet(s"$out/ok_query").count() == 3)
    // both broken slots hold the marker, with the message preserved
    for (q <- Seq("broken_query", "broken_no_oracle")) {
      val m = spark.read.parquet(s"$out/$q")
      assert(m.columns.toSeq ==
        Seq("__verify_failed_query", "__verify_error"), q)
      assert(m.collect().map(_.getString(0)).toSeq == Seq(q))
    }
    assert(spark.read.parquet(s"$out/broken_query").collect()
      .head.getString(1).contains("deliberate gate-spec failure"))

    // registry.json lists every attempted key and the oracled subset
    val reg = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$out/registry.json"))
    for (q <- Seq("ok_query", "broken_query", "broken_no_oracle"))
      assert(reg.contains("\"" + q + "\""), reg)
    assert(reg.contains("\"oracled\""), reg)
    // a marker parquet must never be mistaken for a healthy dump: its
    // schema collides with no oracle schema by construction
    assert(!spark.read.parquet(s"$out/ok_query").columns
      .contains("__verify_error"))
  }

  test("stale output from a previous run is removed before re-dump — a " +
    "query that breaks between runs cannot false-pass on old parquet") {
    val spark = SparkSpec.spark
    val out = java.nio.file.Files
      .createTempDirectory("graft_verify_stale").toString
    val good: Map[String, (SparkSession, String) => DataFrame] =
      Map("q" -> ((s, _) => s.range(5).toDF("id")))
    Verify.run(spark, good, Map.empty, "/nonexistent", out)
    assert(spark.read.parquet(s"$out/q").count() == 5)
    val broken: Map[String, (SparkSession, String) => DataFrame] =
      Map("q" -> ((_, _) => throw new RuntimeException("now broken")))
    Verify.run(spark, broken, Map.empty, "/nonexistent", out)
    val m = spark.read.parquet(s"$out/q")
    assert(m.columns.contains("__verify_error"))
    assert(m.count() == 1)
  }
}
