package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** J7 as a CUSTOM WHOLE-OPERATOR (SURVEY.md §7.3's "only if needed" rung,
  * implemented as the capability demonstration): logical node + planner
  * strategy + physical sort-merge execution, registered through
  * functions.GraftExtensions.
  *
  * Semantics: for every left row, the greatest right `ts` with
  * rightKey == leftKey and rightTs <= leftTs (nulls when no such row) —
  * the tick-data "latest quote at or before the trade" join.
  *
  * DIRECTION (round 7, matching DuckDB ASOF JOIN's >= / <= option
  * surface and pandas merge_asof's `direction=`): `forward = true`
  * flips the search to the SMALLEST right ts with rightTs >= leftTs —
  * "the next quote at or after the trade". Same merge pass, same
  * required distribution/ordering; only the advance condition and the
  * answer row differ (the forward answer is the first unconsumed right
  * row, which may serve several left rows, so it is peeked, not
  * consumed).
  *
  * TIE CONTRACT: selectable via `inclusive` (default true =
  * `rightTs <= leftTs`, or `>=` under forward — the pandas merge_asof /
  * DuckDB ASOF JOIN default): a right row at exactly the left row's
  * timestamp matches. `inclusive = false` gives strict inequality — the
  * window-composed twin's (Queries.j7Asof) semantics when each right
  * timestamp is unique per key. The two contracts only differ on
  * same-key equal-ts pairs; Queries.j7cAsofTies oracle-exercises the
  * inclusive one on data that actually contains such collisions, and
  * AsOfJoinSpec pins both.
  *
  * NULL CONTRACT: left rows with a null key or null ts get a null as-of
  * value (never matched); right rows with a null key or null ts are
  * ignored (can never be "the latest quote").
  *
  * Identical results to the window composition in Queries.j7Asof
  * (spec-asserted); the physical difference is ONE pass over each sorted
  * side per partition (the window route carries every right row through
  * the left's window sort).
  *
  * Scale shape: both children hash-clustered on the key and sorted by
  * (key, ts) — exactly a SortMergeJoin's requirements, so EnsureRequirements
  * plans the same co-partitioned exchanges, and the merge itself is
  * streaming with O(1) state (last right ts seen for the current key).
  * Keys/ts are LongType in this first cut (the engine's tick keys).
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    asofAttr: AttributeReference,
    inclusive: Boolean,
    forward: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asofAttr
  // asofAttr is minted by this operator, not derived from the children
  override def producedAttributes: AttributeSet = AttributeSet(asofAttr)
  // every left column passes through (so ColumnPruning must keep them);
  // from the right side only key+ts are consumed (prunable to those)
  override def references: AttributeSet =
    left.outputSet ++
      AttributeSet(Seq(leftKey, rightKey, leftTs, rightTs).flatMap(_.references))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Build the joined DataFrame. Expressions are resolved against the
    * analyzed children, so the node enters the optimizer fully bound. */
  def apply(leftDf: DataFrame, rightDf: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      outCol: String, inclusive: Boolean = true,
      forward: Boolean = false): DataFrame = {
    val spark = leftDf.sparkSession
    // self-register the strategy for sessions not built with
    // GraftExtensions (experimental.extraStrategies is the public hook)
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val l = leftDf.queryExecution.analyzed
    // the analyzer's DeduplicateRelations only handles built-in nodes; if
    // both sides share a lineage (self-join), re-alias the right side so
    // its output gets fresh expression IDs
    val rRaw = rightDf.queryExecution.analyzed
    val r =
      if (l.outputSet.intersect(rRaw.outputSet).isEmpty) rRaw
      else rightDf.select(rightDf.columns.map(c => rightDf(c).as(c)): _*)
        .queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${p.output}"))
    val node = AsOfJoin(l, r,
      attr(l, keyCol), attr(r, keyCol),
      attr(l, leftTsCol), attr(r, rightTsCol),
      AttributeReference(outCol, LongType, nullable = true)(), inclusive,
      forward)
    org.apache.spark.sql.GraftSqlShim.ofRows(spark, node)
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, attr, incl, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, attr, incl,
        fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    asofAttr: AttributeReference,
    inclusive: Boolean = true,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofAttr
  override def producedAttributes: AttributeSet = AttributeSet(asofAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // capture attributes/expressions as locals: the closure must not drag
    // the SparkPlan (this/left/right) into the serialized task
    val (lOut, rOut, allOut) = (left.output, right.output, output)
    val (lkE, ltE, rkE, rtE) = (leftKey, leftTs, rightKey, rightTs)
    val incl = inclusive
    val fwd = forward
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKey = UnsafeProjection.create(Seq(lkE), lOut)
      val lTs = UnsafeProjection.create(Seq(ltE), lOut)
      val rKey = UnsafeProjection.create(Seq(rkE), rOut)
      val rTs = UnsafeProjection.create(Seq(rtE), rOut)
      val toUnsafe = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val valueRow = new GenericInternalRow(1)

      // right rows with null key/ts can never match — drop them up front
      // (they sort first under Ascending, so this only skips a prefix)
      val rClean = rIt.filter { r =>
        !rKey(r).isNullAt(0) && !rTs(r).isNullAt(0)
      }
      // single-pass merge: rHead is the unconsumed right row; lastTs is the
      // greatest right ts <= current left ts for the current key
      var rHead: InternalRow = if (rClean.hasNext) rClean.next().copy() else null
      var curKey = 0L
      var haveKey = false
      var lastTs = 0L
      var haveLast = false

      lIt.map { lRow =>
        val kProj = lKey(lRow)
        val lNull = kProj.isNullAt(0)
        val k = if (lNull) 0L else kProj.getLong(0)
        val tProj = lTs(lRow)
        val tNull = lNull || tProj.isNullAt(0)
        val t = if (tNull) 0L else tProj.getLong(0)
        if (tNull) {
          // null key/ts: contract says no match; right cursor untouched
          valueRow.update(0, null)
        } else if (fwd) {
          // forward: discard right rows no future left row can match
          // (left is (key, ts)-ascending, so rk < k is dead, and same-key
          // rt strictly before t — or at t when exclusive — is dead too);
          // the answer is the first surviving same-key row, PEEKED not
          // consumed (it may also be the answer for later left rows)
          var advancing = true
          while (advancing && rHead != null) {
            val rk = rKey(rHead).getLong(0)
            if (rk < k) {
              rHead = if (rClean.hasNext) rClean.next().copy() else null
            } else if (rk == k) {
              val rt = rTs(rHead).getLong(0)
              if (rt < t || (!incl && rt == t)) {
                rHead = if (rClean.hasNext) rClean.next().copy() else null
              } else advancing = false
            } else advancing = false
          }
          if (rHead != null && rKey(rHead).getLong(0) == k)
            valueRow.update(0, rTs(rHead).getLong(0))
          else valueRow.update(0, null)
        } else {
          if (!haveKey || curKey != k) {
            curKey = k; haveKey = true; haveLast = false
          }
          var advancing = true
          while (advancing && rHead != null) {
            val rk = rKey(rHead).getLong(0)
            if (rk < k) {
              rHead = if (rClean.hasNext) rClean.next().copy() else null
            } else if (rk == k) {
              val rt = rTs(rHead).getLong(0)
              if (rt < t || (incl && rt == t)) {
                lastTs = rt; haveLast = true
                rHead = if (rClean.hasNext) rClean.next().copy() else null
              } else advancing = false
            } else advancing = false
          }
          if (haveLast) valueRow.update(0, lastTs)
          else valueRow.update(0, null)
        }
        toUnsafe(joined(lRow, valueRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
