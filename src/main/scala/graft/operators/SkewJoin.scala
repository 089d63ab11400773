package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual escape hatch when AQE's
  * skew-join splitting can't apply (aggregations, or joins whose skewed
  * side feeds from an exchange AQE won't re-plan). Not present in the
  * reference (its only shuffle analog is the per-measurement worker
  * pool); required equipment for the 100 TB posture: one hot key (a
  * common shingle, an empty-string tag, a null-ish id) otherwise pins a
  * single reducer while 999 executors idle.
  *
  * Pattern: explode the hot side's key space by a salt in [0, factor),
  * replicate the other side across every salt, shuffle on (key, salt),
  * un-salt afterwards. Aggregations instead do a two-phase
  * partial-on-salt → final-on-key reduction.
  */
object SkewJoin {

  /** Per-row salt independent of row CONTENT: monotonically_increasing_id
    * is unique per row, so even fully identical duplicate rows — the
    * canonical hot-key payload — spread across all `factor` salts. (A
    * content hash would give every duplicate the same salt and pin one
    * reducer anyway.)
    *
    * Determinism note: the id depends on partition layout, so a retried
    * map task over a shuffled upstream may assign different salts.
    * Spark's indeterminate-stage handling (SPARK-23207) rolls back and
    * re-runs the downstream stages wholesale in that case, preserving
    * correctness at the cost of a larger retry. */
  private[operators] def saltCol(factor: Int) =
    pmod(monotonically_increasing_id(), lit(factor.toLong))

  /** Inner equi-join with the LEFT side salted (use when `left`'s key
    * distribution is skewed): left rows get a per-row salt, right rows
    * are replicated across all `factor` salts — the hot key's work
    * spreads over `factor` reducers. */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      factor: Int): DataFrame = {
    require(factor > 0)
    val salted = left.withColumn("__salt", saltCol(factor))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt) — spreading a hot key over `factor` reducers — then
    * final combine on key. The caller supplies both phases and the final
    * phase must be the MERGE of the partial one: sum/min/max merge with
    * themselves, but count's merge is SUM of the partial counts (a final
    * count would return the number of salt groups, not rows). */
  def saltedAgg(
      df: DataFrame,
      key: String,
      factor: Int,
      partial: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
      finalAgg: org.apache.spark.sql.RelationalGroupedDataset => DataFrame)
      : DataFrame = {
    require(factor > 0)
    val salted = df.withColumn("__salt", saltCol(factor))
    val part = partial(salted.groupBy(col(key), col("__salt")))
    finalAgg(part.groupBy(col(key)))
  }
}
