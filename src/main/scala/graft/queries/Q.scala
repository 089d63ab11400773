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
  /** Registry helper: name → QueryDef maps merged by SparkEntry.
    *
    * Throws on duplicate names: a plain `++` silently keeps the last
    * definition, which once hid a defined-but-never-verified query
    * (`stats_key_skew` shadowed its sibling for several rounds). The
    * registry is the correctness gate's source of truth, so a collision
    * is a build error, not a quiet overwrite.
    */
  def merge(ms: Map[String, QueryDef]*): Map[String, QueryDef] = {
    val names = ms.flatMap(_.keys)
    val dups = names.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate query names across registry maps: ${dups.toSeq.sorted.mkString(", ")}")
    ms.reduce(_ ++ _)
  }

  /** Duplicate-checking `Map(...)` for the per-file registries. A Scala
    * `Map` literal collapses repeated keys at construction (last wins),
    * which `merge` can never observe — entries must flow through varargs
    * of pairs to be countable before dedup.
    */
  def m(entries: (String, QueryDef)*): Map[String, QueryDef] = {
    val dups = entries.map(_._1).groupBy(identity)
      .collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate query names within a registry map: ${dups.toSeq.sorted.mkString(", ")}")
    entries.toMap
  }
}
