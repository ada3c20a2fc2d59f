package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join — tier (c) of the custom-operator ladder
  * (SURVEY.md §7): a whole-operator extension with its own
  * `LogicalPlan` node, planner `SparkStrategy`, physical `SparkPlan`,
  * and an optimizer `Rule[LogicalPlan]`, wired through the public
  * `spark.experimental` extension points so it works on ANY session
  * (including the driver's, which we don't construct).
  *
  * Semantics match `graft.operators.AsOfJoin.asOf` (union-tag + window
  * form) exactly: for every left row, the right row with the same key
  * and the greatest ts <= left.ts; null payload when none exists; right
  * side must be unique per (key, ts). Rows with a null key or null ts
  * never match (SQL ASOF semantics — mirrors DuckDB's ASOF LEFT JOIN).
  *
  * Why a custom operator instead of the composed form: the window
  * formulation interleaves |L|+|R| rows through ONE sort but then
  * carries every payload column as a running `last(_, ignoreNulls)`
  * window — payload width multiplies the window state. The native exec
  * is the classic streamed merge: each side is hash-partitioned on its
  * key and sorted (key, ts), then a single forward pass per partition
  * emits exactly one output row per left row with O(1) state (the
  * current candidate right row). No window buffering, no tag column,
  * no post-filter — and Catalyst still handles distribution/ordering
  * (EnsureRequirements inserts the exchanges/sorts and reuses
  * pre-sorted children, e.g. bucketed tables, for free).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinNode → AsOfJoinExec. Installed via
  * `spark.experimental.extraStrategies` (public API, per-session). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, payload) =>
      AsOfJoinExec(lk, rk, lts, rts, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: a deterministic Filter over only-left columns
  * commutes with the as-of join (the join emits exactly one row per
  * left row, and matching is per-left-row), so push it below the node
  * where it can keep sinking into the scan. Without this rule Catalyst
  * treats the custom node as a black box and leaves the filter above
  * the join — filtering AFTER the shuffle instead of before it. */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, j: AsOfJoinNode)
        if cond.deterministic && cond.references.subsetOf(j.left.outputSet) =>
      j.copy(left = Filter(cond, j.left))
  }
}

/** Physical sort-merge as-of join. Children are clustered on their key
  * and sorted by (key, ts); a single forward merge per co-partition
  * pair emits one row per left row. Linear in |L|+|R|, O(1) state. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  // one row out per left row, partitioned exactly as the left child
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(leftKeys, left.output)
      val rKeyGen = UnsafeProjection.create(rightKeys, right.output)
      val lTsBound = BindReferences.bindReference(leftTs, left.output)
      val rTsBound = BindReferences.bindReference(rightTs, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      val payloadGen = UnsafeProjection.create(payload, right.output)
      val nullPayload = new GenericInternalRow(payload.length)
      val joined = new JoinedRow
      // bind against the NULLABLE payload attrs (output nullability):
      // misses emit a null payload row even when the right-side column
      // was non-nullable, and the projection must null-check it
      val resultGen = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        // streamed right cursor + the current best candidate; candidate
        // rows are copied because sorted-iterator rows are reused
        private var rCur: InternalRow = _
        private var cand: InternalRow = _
        private var candKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyGen(l)
          if (candKey != null && keyOrd.compare(candKey, lk) != 0) {
            cand = null; candKey = null
          }
          val lTsVal = lTsBound.eval(l)
          if (!lk.anyNull && lTsVal != null) {
            var done = false
            while (!done) {
              if (rCur == null) {
                if (rIter.hasNext) rCur = rIter.next() else done = true
              }
              if (rCur != null) {
                val rk = rKeyGen(rCur)
                if (rk.anyNull) { rCur = null } // null keys never match
                else {
                  val c = keyOrd.compare(rk, lk)
                  if (c < 0) { rCur = null }        // before our key: discard
                  else if (c > 0) { done = true }   // future key: hold
                  else {
                    val rTsVal = rTsBound.eval(rCur)
                    if (rTsVal == null) { rCur = null }
                    else if (tsOrd.lteq(rTsVal, lTsVal)) {
                      // newer at-or-before match supersedes the previous
                      cand = rCur.copy(); candKey = lk.copy(); rCur = null
                    } else done = true              // future ts: hold
                  }
                }
              }
            }
          }
          numOutputRows += 1
          val p = if (cand != null) payloadGen(cand) else nullPayload
          resultGen(joined(l, p))
        }
      }
    }
  }
}

/** Public entry: the DataFrame-level API over the native operator.
  * Mirrors `AsOfJoin.asOf`'s contract and output naming
  * (left columns + `asof_<payload>`), so the two forms are drop-in
  * interchangeable (AsOfNativeSpec pins them equal row-for-row). */
object AsOfJoinNative {

  private def ensureInstalled(ss: org.apache.spark.sql.SparkSession): Unit = {
    // idempotent per-session install through the PUBLIC experimental
    // hooks — works on externally-constructed sessions too
    if (!ss.experimental.extraStrategies.exists(_ eq AsOfJoinStrategy))
      ss.experimental.extraStrategies ++= Seq(AsOfJoinStrategy)
    if (!ss.experimental.extraOptimizations.exists(_ eq PushFilterThroughAsOfJoin))
      ss.experimental.extraOptimizations ++= Seq(PushFilterThroughAsOfJoin)
  }

  /** left: (key, ts, ...), right: (key, ts, ...payload) unique per
    * (key, ts). Output: every left row + `asof_<payload>` columns. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payloadCols: Seq[String]): DataFrame = {
    val ss = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    ensureInstalled(ss)
    val lPlan = left.queryExecution.analyzed
    // Self-join hygiene: re-alias every right column with fresh exprIds
    // (left and right often derive from the same scan — q70 joins
    // events to events — and duplicate ids would bind ambiguously).
    // Payload columns pick up their output name here.
    val rAliases = right.queryExecution.analyzed.output.map { a =>
      val name = if (a.name == key || a.name == ts) a.name else s"asof_${a.name}"
      Alias(a, name)()
    }
    val rPlan = Project(rAliases, right.queryExecution.analyzed)
    val rOut = rPlan.output
    def rCol(n: String): Attribute = rOut.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"right side is missing column $n"))
    def lCol(n: String): Attribute = lPlan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"left side is missing column $n"))
    val node = AsOfJoinNode(
      lPlan, rPlan,
      leftKeys = Seq(lCol(key)), rightKeys = Seq(rCol(key)),
      leftTs = lCol(ts), rightTs = rCol(ts),
      payload = payloadCols.map(c => rCol(s"asof_$c")))
    org.apache.spark.sql.classic.Dataset.ofRows(ss, node)
  }
}
