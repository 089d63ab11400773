package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-query repeat-bench: `runMain graft.BenchOne <query> [reps]` —
  * the iteration tool behind Bench. Repeated warm runs separate a
  * query's data cost from fixed per-session costs (codegen compilation,
  * JIT, parquet footer caching): a query whose warm time collapses is
  * overhead-bound at this scale factor and needs no plan work. */
object BenchOne {

  private def materialize(df: DataFrame): Long = {
    val cols = df.columns.map(c => col(c).cast("string"))
    df.select(xxhash64(cols: _*).as("h"))
      .agg(coalesce(expr("bit_xor(h)"), lit(0L)))
      .collect()(0).getLong(0): Long
  }

  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse(
      sys.error("usage: BenchOne <query> [reps]"))
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(query,
      sys.error(s"unknown query '$query'"))
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      materialize(fn(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      val df = fn(spark, sfDir)
      df.collect(): Unit
      println(df.queryExecution.executedPlan.toString)
    }
    println(s"""{"query":"$query","sf":"$sfDir","times":[${
      times.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
