package graft.plan

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** As-of join as a FIRST-CLASS plan node: logical node + strategy +
  * sort-merge physical operator (the SparkSessionExtensions/
  * extraStrategies pattern extension libraries use for operators the
  * engine lacks — Spark has no native as-of join).
  *
  * Why a custom operator when the union+window composition
  * ([[graft.operators.TemporalJoin.asofJoin]]) is already correct and
  * single-shuffle: the window form funnels BOTH sides through ONE
  * sort of |L|+|R| union rows, each right row null-padded to the left
  * schema and each left row dragging a null match struct through the
  * sort — at 100 TB that's sort buffers sized by the union row width ×
  * both cardinalities. The merge exec keeps the sides separate (each
  * sorted at its own natural width), streams them once with O(1) state
  * per key group (one buffered match), and inherits the left side's
  * partitioning unchanged. Semantics are IDENTICAL to the composed
  * form (differential-tested in TemporalJoinSpec): per key, each left
  * row matches the latest right row with time ≤ its time (`>=` tie
  * rule), null right times unmatchable, null left times unmatched,
  * null keys group together like SQL GROUP BY.
  *
  * Time columns are ns-epoch LongType (the engine's authoritative time
  * representation, SURVEY.md §1.2); keys may be any natural-orderable
  * types. */
object AsOfJoin {

  /** Logical node. `right` must be pre-projected to
    * `rightKeys ++ rightTime ++ payload` (the API wrapper in
    * TemporalJoin does this); `matchedOutput` are the FRESH nullable
    * attributes this node produces: matched right time, then payloads. */
  case class AsOfJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKeys: Seq[Attribute],
      rightKeys: Seq[Attribute],
      leftTime: Attribute,
      rightTime: Attribute,
      payload: Seq[Attribute],
      matchedOutput: Seq[Attribute])
      extends BinaryNode {
    override def output: Seq[Attribute] = left.output ++ matchedOutput
    override def producedAttributes: AttributeSet =
      AttributeSet(matchedOutput)
    override protected def withNewChildrenInternal(
        l: LogicalPlan, r: LogicalPlan): LogicalPlan =
      copy(left = l, right = r)
  }

  /** Planning rule (snippet-standard `Strategy` shape): co-cluster both
    * sides on the keys, sort each by (keys, time), merge. */
  object AsOfJoinStrategy
      extends org.apache.spark.sql.execution.SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, rk, lt, rt, pay, matched) =>
        AsOfJoinExec(lk, rk, lt, rt, pay, matched,
          planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Optimizer rule for the custom node: Catalyst's own
    * PushDownPredicates cannot see through a node it doesn't know, so
    * a Filter sitting on an as-of join would keep the time-range /
    * key predicates OFF the parquet scan. Left-only conjuncts push
    * into the LEFT child (each left row's match depends only on that
    * row — filtering left rows early is semantics-preserving);
    * predicates on the matched columns stay above (they depend on the
    * join result). From the left child Catalyst's standard rules take
    * over and drive the predicate down to the scan's PushedFilters. */
  object AsOfJoinFilterPushdown
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
      with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
    import org.apache.spark.sql.catalyst.expressions.And
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, a: AsOfJoinPlan) =>
        val (pushable, rest) = splitConjunctivePredicates(cond)
          .partition(p => p.deterministic &&
            p.references.subsetOf(a.left.outputSet))
        if (pushable.isEmpty) f
        else {
          val pushed =
            a.copy(left = Filter(pushable.reduce(And), a.left))
          rest.reduceOption(And)
            .map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  /** Idempotent session registration (experimental.extraStrategies /
    * extraOptimizations — the public injection points;
    * SparkSessionExtensions offers the same hooks at builder time via
    * injectPlannerStrategy / injectOptimizerRule). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations
        .contains(AsOfJoinFilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfJoinFilterPushdown
  }

  /** Sort-merge as-of join: children co-clustered on the join keys and
    * sorted by (keys…, time ASC); one forward pass over each side per
    * partition; state = one buffered (key, matched-part) pair. */
  case class AsOfJoinExec(
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTime: Expression,
      rightTime: Expression,
      payload: Seq[Expression],
      matchedOutput: Seq[Attribute],
      left: SparkPlan,
      right: SparkPlan)
      extends BinaryExecNode {

    require(leftTime.dataType == LongType && rightTime.dataType == LongType,
      "as-of join times must be ns-epoch LongType")

    override def output: Seq[Attribute] = left.output ++ matchedOutput
    override def producedAttributes: AttributeSet =
      AttributeSet(matchedOutput)

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) ::
        ClusteredDistribution(rightKeys) :: Nil

    private def ordering(keys: Seq[Expression], time: Expression) =
      keys.map(SortOrder(_, Ascending)) :+ SortOrder(time, Ascending)

    override def requiredChildOrdering: Seq[Seq[SortOrder]] =
      Seq(ordering(leftKeys, leftTime), ordering(rightKeys, rightTime))

    // left rows pass through in order with matched columns appended
    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = left.outputOrdering

    override protected def doExecute(): RDD[InternalRow] = {
      val matchedWidth = 1 + payload.size
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
        val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
        val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
        val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
        // the matched part a right row contributes: (its time, payload…)
        val rValProj =
          UnsafeProjection.create(rightTime +: payload, right.output)
        val keyOrd =
          RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
        val outProj = UnsafeProjection.create(output, output)
        val nullMatched = new GenericInternalRow(matchedWidth)
        val joined = new JoinedRow

        var rNext: InternalRow = null          // lookahead right row
        var matchKey: UnsafeRow = null         // key of buffered match
        var matched: UnsafeRow = null          // buffered matched part

        def advanceRight(lKey: UnsafeRow, lTime: Long): Unit = {
          var done = false
          while (!done) {
            if (rNext == null && rIter.hasNext) rNext = rIter.next()
            if (rNext == null) done = true
            else {
              val rKey = rKeyProj(rNext)
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp < 0) rNext = null // key can never match again
              else if (cmp == 0) {
                val tRow = rTimeProj(rNext)
                if (tRow.isNullAt(0)) rNext = null // unmatchable
                else if (tRow.getLong(0) <= lTime) {
                  matchKey = rKey.copy()
                  matched = rValProj(rNext).copy()
                  rNext = null
                } else done = true
              } else done = true
            }
          }
        }

        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          val tRow = lTimeProj(lRow)
          val m =
            if (tRow.isNullAt(0)) nullMatched // null left time: no match
            else {
              advanceRight(lKey, tRow.getLong(0))
              if (matchKey != null && keyOrd.compare(matchKey, lKey) == 0)
                matched
              else nullMatched
            }
          outProj(joined(lRow, m))
        }
      }
    }

    override protected def withNewChildrenInternal(
        l: SparkPlan, r: SparkPlan): SparkPlan =
      copy(left = l, right = r)
  }
}
