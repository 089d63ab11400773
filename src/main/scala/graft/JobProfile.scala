package graft

/** Optimization-round instrumentation (guide §1/§7.1 without a live
  * UI): run one registry query end-to-end and print every Spark job
  * it submitted — id, wall ms, #tasks, description — so a multi-job
  * E2E harness's time can be attributed to its operator steps.
  * Usage: `runMain graft.JobProfile <query> [reps]` (last rep is the
  * profiled one — prior reps warm codegen/JIT like Bench's cold rep).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse(
      sys.error("usage: JobProfile <query> [reps]"))
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session()
    val fn = SparkEntry.queries.getOrElse(query,
      sys.error(s"unknown query '$query'"))
    for (_ <- 1 until reps) Bench.materialize(fn(spark, sfDir))
    val jobs = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentHashMap[
      Int, Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart)
          : Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty(
            "spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.name))
          .getOrElse("")
        jobs.put(js.jobId,
          (js.time, desc.take(120),
            js.stageInfos.map(_.numTasks).sum)): Unit
      }
      override def onJobEnd(
          je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        done.put(je.jobId, je.time): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    Bench.materialize(fn(spark, sfDir))
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500) // listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    val rows = jobs.asScala.toSeq.sortBy(_._1)
    println(f"QUERY $query wall=$wall%.3f s jobs=${rows.size}")
    var prevEnd = 0L
    for ((id, (start, desc, tasks)) <- rows) {
      val end = done.getOrDefault(id, start)
      val gap = if (prevEnd > 0) start - prevEnd else 0L
      prevEnd = math.max(prevEnd, end)
      println(f"JOB $id%4d ${end - start}%6d ms gap=$gap%5d ms " +
        f"tasks=$tasks%4d  $desc")
    }
    spark.stop()
  }
}
