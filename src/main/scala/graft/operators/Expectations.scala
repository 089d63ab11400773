package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the dbt-test / Great
  * Expectations contract shape): a table ships with a checklist —
  * not-null, unique, range, enum membership, referential integrity —
  * and every load emits one verdict row per check. The
  * config-driven counterpart to the ad-hoc `stats_*` audits: the
  * checks are DATA, so the same runner serves every table.
  *
  * Scale shape: all ROW-LOCAL checks (not-null / range / enum) fuse
  * into ONE aggregate pass over the table (conditional sums — the
  * scan is shared, adding a check adds a column, not a pass);
  * `Unique` adds one exact-distinct aggregate on its key columns;
  * each `FkExists` adds one left-anti join against its parent (the
  * stats_fk_orphans shape — prepend a bloom prefilter at 100 TB).
  *
  * Output: (check, n_rows, n_violations, pass) — one row per check,
  * stable order = declaration order (rank column dropped after sort).
  */
object Expectations {

  sealed trait Check { def name: String }
  /** Column must never be NULL. */
  final case class NotNull(col: String) extends Check {
    val name = s"not_null:$col" }
  /** Column tuple must be unique across the table (violations =
    * surplus rows beyond the first of each duplicated tuple).
    * Tuples with ANY NULL component are excluded from the check —
    * the dbt/Great-Expectations `unique` convention (NULL ≠ NULL;
    * compose with NotNull to reject them) — so violations are
    * counted over non-NULL tuples only. */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique:${cols.mkString(",")}" }
  /** Numeric column must sit in [lo, hi] (NULLs pass — compose with
    * NotNull to also reject them). */
  final case class InRange(col: String, lo: Long, hi: Long)
      extends Check { val name = s"range:$col" }
  /** Column value must be one of `values` (NULLs pass, as InRange). */
  final case class InSet(col: String, values: Seq[String])
      extends Check { val name = s"in_set:$col" }
  /** Every non-NULL FK value must exist in the parent column. */
  final case class FkExists(col: String, parent: DataFrame,
      parentCol: String) extends Check { val name = s"fk:$col" }
  /** Data freshness: max(col) must reach asOf − maxLag (all three in
    * ONE caller-chosen epoch unit — the check is unit-agnostic). The
    * verdict is table-level: 0 or 1 violations. An EMPTY table is
    * STALE by definition (nothing has arrived), the one check where
    * empty ≠ pass — a feed that stopped entirely must not report
    * fresh. `col` must be numeric (derive an epoch column first for
    * timestamp storage — ANSI mode rejects a raw timestamp→long
    * cast). */
  final case class Fresh(col: String, asOf: Long, maxLag: Long)
      extends Check {
    require(maxLag >= 0, s"maxLag must be >= 0: $maxLag")
    val name = s"fresh:$col" }

  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names — each check must be distinguishable")
    // coalesce: sum over an EMPTY table is NULL — an empty table must
    // pass (0 violations), not emit a NULL verdict
    val rowLocal = checks.collect {
      case c @ NotNull(cl) =>
        c.name -> coalesce(
          sum(when(col(cl).isNull, 1L).otherwise(0L)), lit(0L))
      case c @ InRange(cl, lo, hi) =>
        c.name -> coalesce(sum(when(col(cl).isNotNull &&
          (col(cl).cast("long") < lo || col(cl).cast("long") > hi),
          1L).otherwise(0L)), lit(0L))
      case c @ InSet(cl, vs) =>
        c.name -> coalesce(sum(when(col(cl).isNotNull &&
          !col(cl).isin(vs: _*), 1L).otherwise(0L)), lit(0L))
    }
    val fused: DataFrame = {
      val aggs = count(lit(1)).as("n_rows") +:
        rowLocal.map { case (n, e) => e.as(s"v_$n") }
      df.agg(aggs.head, aggs.tail: _*)
    }
    val rowLocalRows = rowLocal.map { case (n, _) =>
      fused.select(lit(n).as("check_name"), col("n_rows"),
        col(s"v_$n").as("n_violations"))
    }
    val otherRows = checks.collect {
      case c @ Unique(cols) =>
        // violations over non-NULL tuples only (dbt/GE semantics):
        // countDistinct already drops any-NULL tuples, so the
        // subtrahend must too, or every NULL-keyed row counts as a
        // violation. coalesce: empty table passes, never NULL verdict.
        val nonNull = cols.map(col(_).isNotNull).reduce(_ && _)
        df.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(when(nonNull, 1L).otherwise(0L)), lit(0L))
            .as("n_nonnull"),
          countDistinct(cols.head, cols.tail: _*).as("n_distinct"))
          .select(lit(c.name).as("check_name"), col("n_rows"),
            (col("n_nonnull") - col("n_distinct")).as("n_violations"))
      case c @ Fresh(cl, asOf, maxLag) =>
        df.agg(count(lit(1)).as("n_rows"),
            max(col(cl).cast("long")).as("mx"))
          .select(lit(c.name).as("check_name"), col("n_rows"),
            when(col("mx").isNotNull && col("mx") >= asOf - maxLag,
              0L).otherwise(1L).as("n_violations"))
      case c @ FkExists(cl, parent, pcl) =>
        val child = df.select(col(cl)).filter(col(cl).isNotNull)
        child.agg(count(lit(1)).as("n_rows"))
          .crossJoin(broadcast(
            child.join(parent.select(col(pcl).as(cl)), Seq(cl),
              "left_anti").agg(count(lit(1)).as("n_violations"))))
          .select(lit(c.name).as("check_name"), col("n_rows"),
            col("n_violations"))
    }
    val order = checks.map(_.name).zipWithIndex.toMap
    val orderCol = order.foldLeft(lit(-1)) { case (acc, (n, i)) =>
      when(col("check_name") === n, i).otherwise(acc)
    }
    (rowLocalRows ++ otherRows)
      .reduce(_ unionAll _)
      .withColumn("pass", col("n_violations") === 0L)
      .withColumn("ord", orderCol)
      .orderBy(col("ord")).drop("ord")
  }
}
