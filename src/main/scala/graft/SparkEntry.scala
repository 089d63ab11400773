package graft

import graft.queries.{BehaviorQueries, ParityQueries, PipelineQueries, ProbeQueries, Q, QlQueries, QueryDef, RelationalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: every implemented operator from SURVEY.md §2 (plus the
  * north-star pipeline operators) has an entry in `queries`, and an
  * equivalent DuckDB oracle in `oracleSql` when the semantics are
  * ANSI-SQL-expressible (driver hash-compares both at sf0.01).
  */
object SparkEntry {

  val all: Map[String, QueryDef] = Q.merge(
    ParityQueries.defs, RelationalQueries.defs, PipelineQueries.defs,
    BehaviorQueries.defs, QlQueries.defs, ProbeQueries.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: the reference's workhorse — a chunked time-range scan of the
    * events measurement (SURVEY.md §3.1). */
  def entry(spark: SparkSession): DataFrame =
    all("s5_chunked_union").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (catalog discovery, HLL internals, approximate ANN). */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
