package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A verifiable query: the Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle query over the
  * same parquet tables. Column names/types are aligned on both sides —
  * the driver's comparator sorts columns by name and hashes values.
  *
  * Cross-engine determinism rules used throughout:
  *  - integer-producing functions are cast to BIGINT on both sides
  *    (Spark `size`/`year`/`row_number` return int, DuckDB bigint);
  *  - multi-row double aggregates (sum/avg of non-integral doubles) are
  *    rounded on both sides — summation order is engine-dependent;
  *  - sums of integral doubles (e.g. l_quantity) are exact in IEEE double
  *    and cast to BIGINT unrounded;
  *  - per-row arithmetic (one IEEE op per step, same operand order) is
  *    bit-identical across engines and left unrounded;
  *  - every hash is md5 (lowercase hex in both engines);
  *  - top-k queries order by (rounded measure, unique key) so ties are
  *    deterministic.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Registry helper: name → QueryDef maps merged by SparkEntry. */
  def merge(ms: Map[String, QueryDef]*): Map[String, QueryDef] =
    ms.reduce(_ ++ _)
}
