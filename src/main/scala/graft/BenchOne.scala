package graft

/** Single-query repeat-bench: `runMain graft.BenchOne <query> [reps]` —
  * the iteration tool behind Bench. Repeated warm runs separate a
  * query's data cost from fixed per-session costs (codegen compilation,
  * JIT, parquet footer caching): a query whose warm time collapses is
  * overhead-bound at this scale factor and needs no plan work.
  * `SPARK_GRAFT_EXPLAIN=1` additionally prints the executed plan of the
  * materialized (benched) aggregation after the timed runs.
  * Session config and the materialization contract are Bench's own
  * (shared code), so numbers are comparable. */
object BenchOne {

  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse(
      sys.error("usage: BenchOne <query> [reps]"))
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session()
    val fn = SparkEntry.queries.getOrElse(query,
      sys.error(s"unknown query '$query'"))
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      Bench.materialize(fn(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    // Locale.ROOT: a comma-decimal default locale would print "1,234"
    // and silently corrupt the JSON array
    val ts = times.map(t =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(t)))
    println(s"""{"query":"$query","sf":"$sfDir","times":[${
      ts.mkString(",")}]}""")
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      // the plan of the scalar aggregation actually benched — executes
      // one more scalar collect, never the raw result set to the driver
      val m = Bench.materializedFrame(fn(spark, sfDir))
      m.collect(): Unit
      println(m.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
