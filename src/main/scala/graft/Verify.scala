package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * SELF-DEFENDING GATE (round-7 incident): the driver's correctness
  * JSON OMITS queries it finds no result for, so a query that fails at
  * analysis time silently vanishes from the gate — 39 time-based
  * queries disappeared for a full round behind a green-looking file.
  * Two defenses here: (1) a query that cannot execute leaves an
  * explicit FAILURE-MARKER parquet in its slot (columns
  * `__verify_failed_query`/`__verify_error`), so the oracle compare
  * goes visibly red instead of absent; (2) `registry.json` records
  * every attempted key, and `tools/oracle_check.py` fails any registry
  * key with no result dump — the result count can never silently
  * shrink below the registry count again. */
object Verify {

  /** Dump each query in `queries` to `outDir/<name>` (parquet), never
    * omitting a slot: failures write the marker parquet instead. Also
    * dumps `oracle_sql.json` (the full oracle map) and `registry.json`
    * (the keys THIS run attempted + which of them are oracled).
    * Extracted from main so VerifyGateSpec can drive it with a
    * deliberately-broken query. */
  def run(spark: SparkSession,
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracleSql: Map[String, String],
      sfDir: String, outDir: String,
      subset: Option[Set[String]] = None): Unit = {
    new java.io.File(outDir).mkdirs()
    val attempted = queries
      .filter { case (name, _) => subset.forall(_.contains(name)) }
    attempted.foreach { case (name, fn) =>
      // drop any previous run's output FIRST: a query failing before its
      // write would otherwise leave stale parquet that false-passes the
      // oracle compare
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(s"$outDir/$name"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // the marker's columns can never match any oracle schema, so
        // the compare reports a RED row for this key instead of the
        // key evaporating from the gate
        try {
          import org.apache.spark.sql.functions.lit
          spark.range(1).select(
              lit(name).as("__verify_failed_query"),
              lit(Option(e.toString).getOrElse("unknown").take(2000))
                .as("__verify_error"))
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        }
        catch { case e2: Throwable =>
          System.err.println(
            s"[verify] $name marker write ALSO failed: ${e2.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json): Unit
    def arr(xs: Iterable[String]): String =
      xs.toSeq.sorted.map(q).mkString("[", ",", "]")
    val registry = s"""{"queries": ${arr(attempted.keys)}, """ +
      s""""oracled": ${arr(attempted.keySet intersect oracleSql.keySet)}}"""
    Files.writeString(Paths.get(s"$outDir/registry.json"), registry): Unit
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query subset (local iteration
    // tool; the driver always passes exactly two args → full dump)
    val (sfDir, outDir) = (args(0), args(1))
    val subset: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.bootstrap(spark): Unit
    run(spark, SparkEntry.queries, SparkEntry.oracleSql, sfDir, outDir,
      subset)
    spark.stop()
  }
}
