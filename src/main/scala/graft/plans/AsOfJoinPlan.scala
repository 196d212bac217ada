package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as native Catalyst surface (the (c) tier of
  * the custom-operator preference order): a logical node, a planner
  * strategy, and a physical merge exec, registered through
  * [[GraftExtensions]].
  *
  * Semantics: for each left row, the latest right row with the same key
  * and right.ts <= left.ts (inner: unmatched left rows drop). The same
  * contract as graft.operators.AsOf.asOfJoin — the compositional
  * union+window formulation — but executed as a first-class operator:
  * each side shuffles on its key and sorts by (key, ts) once, then a
  * per-partition streaming merge holds ONE candidate right row at a
  * time. No union materialization, no window-function state, and the
  * carried right columns are projected exactly once per emitted row.
  * At 100 TB the cost profile is a sort-merge join's: one exchange +
  * one sort per side, O(n+m) merge, spill-free row-at-a-time state.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightCarry: Seq[Attribute],
    outer: Boolean = false) extends BinaryNode {
  // LEFT OUTER as-of: unmatched (or null-key/ts) left rows survive with
  // null carry columns — so the carry attributes must be nullable
  override def output: Seq[Attribute] =
    left.output ++ (if (outer) rightCarry.map(_.withNullability(true)) else rightCarry)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]; injected via
  * SparkSessionExtensions.injectPlannerStrategy. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ AsOfJoin(l, r, lk, rk, lt, rt, _, outer) =>
      // use the LOGICAL node's output carry (nullability already adjusted
      // for outer) so exec output matches what the analyzer resolved
      AsOfJoinExec(lk, rk, lt, rt, j.output.drop(l.output.length), outer,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Per-partition streaming merge: children are co-partitioned on the
  * join key (EnsureRequirements inserts the exchanges from
  * requiredChildDistribution, exactly as for a sort-merge join) and
  * sorted by (key, ts). The merge advances the right iterator past all
  * rows at or before the current left row's timestamp, holding only the
  * most recent same-key row — O(1) state, so an arbitrarily large right
  * side never buffers. */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightCarry: Seq[Attribute],
    outer: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightCarry

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val allOut = output
    val leftOut = left.output
    val rightOut = right.output

    val isOuter = outer
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bindReference takes nullability from the INPUT schema: under
      // outer the right side must bind nullable or codegen would skip
      // the null check on the all-null padding row
      val rightIn = if (isOuter) rightOut.map(_.withNullability(true)) else rightOut
      val project = UnsafeProjection.create(allOut, leftOut ++ rightIn)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // all-null right side emitted for unmatched left rows in outer mode
      val nullRight: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightOut.length)
      var heldRow: InternalRow = null
      var heldKey: Any = null

      lIter.flatMap { lRow =>
        val lK = lKeyB.eval(lRow)
        val lT = lTsB.eval(lRow)
        if (lK == null || lT == null) {
          // null key/ts match nothing and must not advance the right side
          // (later left rows may need it); outer keeps the bare left row
          if (isOuter) Iterator.single(project(joined(lRow, nullRight)))
          else Iterator.empty
        } else {
          // consume right rows that are (key < lK) or (key == lK, ts <= lT);
          // hold the latest same-key one as the current match candidate
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rK = rKeyB.eval(rBuf.head)
            val c = if (rK == null) -1 else keyOrd.compare(rK, lK)
            if (c < 0) { rBuf.next() } // smaller or null key: discard
            else if (c == 0) {
              val rT = rTsB.eval(rBuf.head)
              if (rT == null) { rBuf.next() } // null right ts: never a match
              else if (tsOrd.compare(rT, lT) <= 0) {
                heldRow = rBuf.next().copy()
                heldKey = rKeyB.eval(heldRow)
              } else advancing = false
            } else advancing = false
          }
          if (heldRow != null && heldKey != null && keyOrd.compare(heldKey, lK) == 0) {
            Iterator.single(project(joined(lRow, heldRow)))
          } else if (isOuter) {
            Iterator.single(project(joined(lRow, nullRight)))
          } else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
