package graft

/** Optimization-round instrumentation (guide §1.2/§7.2): dump
  * `explain("formatted")` for a set of registry queries to files, so
  * plan-shape claims (Exchange count, join strategy, PushedFilters)
  * are committed evidence rather than prose. Usage:
  *
  *   sbt "runMain graft.PlanExplain <outDir> <q1,q2,...|all>"
  *
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench (same
  * session config, so the plans match what the bench actually runs).
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_plans")
    val which: Option[Set[String]] =
      args.lift(1).filter(_ != "all")
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = Bench.session()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => which.forall(_.contains(kv._1)))
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/$name.txt"),
            txt.getBytes("UTF-8"))
          println(s"[plan] $name ok")
        } catch { case e: Throwable =>
          System.err.println(s"[plan] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
