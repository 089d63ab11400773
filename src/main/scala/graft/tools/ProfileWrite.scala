package graft.tools

import graft.operators.CopyJob
import org.apache.spark.sql.functions._

/** Throwaway phase profiler for the sync_write_upsert path: times the
  * bulk copy, the target collect, and each ws.write() separately so
  * the regression hunt (r13 verdict item 2) attacks the real cost.
  * Not part of the registry; kept under tools/ for re-use when the
  * write plane changes again. */
object ProfileWrite {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = graft.Bench.session()
    val StartNs = 1704067200000000000L
    val DayNs = 86400000000000L
    val EndNs = StartNs + 30 * DayNs
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-22s ${(System.nanoTime - t0) / 1e9}%.3f s")
      r
    }
    for (rep <- 1 to 3) {
      println(s"[profile] === rep $rep ===")
      val job = new CopyJob(spark)
      val cfg = CopyJob.Config(StartNs, EndNs, chunkNs = 5 * DayNs,
        timeCol = "ts")
      val root = java.nio.file.Files
        .createTempDirectory("graft_prof_wr").toString
      t("copyMeasurement") {
        job.copyMeasurement(s"$dir/events.parquet",
          s"$root/events.parquet", cfg)
      }
      val targets = t("collect targets") {
        job.readCopied(s"$root/events.parquet")
          .select(col("event_id"), col("ts"))
          .orderBy(col("event_id")).limit(2).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
      }
      val ws = new graft.api.WriteService(spark, root,
        seriesCols = Map("events" -> Seq("event_id")),
        chunkNs = 5 * DayNs)
      val overrides = targets.map { case (id, ts) =>
        s"events,event_type=override,user_id=999 " +
          s"event_id=${id}i,value=42.25 $ts"
      }
      val batch = (overrides ++ Seq(
        s"events,event_type=apiwrite,user_id=7 " +
          s"event_id=888888801i,value=1.5 ${StartNs + DayNs}",
        s"events,event_type=apiwrite,user_id=8 " +
          s"event_id=888888802i,value=2.5 ${EndNs + DayNs}"))
        .mkString("\n")
      t("write #1")(ws.write(batch))
      t("write #2")(ws.write(batch))
      t("readback hash") {
        graft.Bench.materializedFrame(
          job.readCopied(s"$root/events.parquet")).collect()
      }
    }
    spark.stop()
  }
}
