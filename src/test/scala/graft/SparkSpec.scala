package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (Test/fork single JVM). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Sessions.bootstrap(s)
  }
  val Sf0001 = "/root/testdata/sf0.001"
  // the bench-scale fixture — used where a quality floor must be
  // pinned at the corpus size the driver actually benches (ANN recall)
  val Sf01 = "/root/testdata/sf0.1"
}
