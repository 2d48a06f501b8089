package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.Bridge

/** Native as-of join — the full custom-operator tier (logical node →
  * planner strategy → physical exec), for the operator Spark lacks
  * entirely (SURVEY.md §7 preference order (c)).
  *
  * Semantics: for every left row, attach the LAST right row of the same
  * key with `rightTime <= leftTime` (ties included), or nulls. Unlike the
  * window-composed version (Advanced.q26AsOfJoin), this is a first-class
  * operator: Catalyst plans it, and execution is a streaming per-partition
  * merge of the two key-clustered, time-sorted children — O(n+m) per
  * partition, O(1) state, no row buffering, no union/window machinery.
  * Distribution/ordering requirements mean Spark inserts exactly one
  * hash shuffle + sort per side — the same cost profile a built-in
  * sort-merge join has, which is what lets it hold at 100 TB.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinNode =
    copy(left = l, right = r)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // right-side tiebreak makes the matched row among equal-time right
  // rows deterministic (last in tiebreak order wins)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val rightFieldCount = right.output.size
    val outSchema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightFieldCount)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outSchema.map(_.dataType).toArray)
      val buffered = rIter.buffered

      var matchedKey = 0L
      var matched: InternalRow = null // copy of last right row with key==matchedKey, time<=current left time

      lIter.map { l =>
        val kv = lk.eval(l)
        val tv = lt.eval(l)
        if (kv == null || tv == null) {
          // NULL key/time never matches (ASOF JOIN semantics)
          proj(joined(l, nullRight))
        } else {
          val k = kv.asInstanceOf[Long]
          val t = tv.asInstanceOf[Long]
          if (matched != null && matchedKey != k) matched = null
          var done = false
          while (!done && buffered.hasNext) {
            val r = buffered.head
            val rkv = rk.eval(r)
            val rtv = rt.eval(r)
            if (rkv == null || rtv == null) buffered.next() // null-keyed right rows never match
            else if (rkv.asInstanceOf[Long] < k) buffered.next() // behind: discard
            else if (rkv.asInstanceOf[Long] == k && rtv.asInstanceOf[Long] <= t) {
              matched = buffered.next().copy() // candidate; later ones override
              matchedKey = k
            } else done = true // right is ahead of this left row
          }
          val rightSide = if (matched != null && matchedKey == k) matched else nullRight
          proj(joined(l, rightSide))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  import org.apache.spark.sql.execution.SparkPlan
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rtt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rtt, tie) :: Nil
    case _ => Nil
  }
}

/** Public API: `AsOf.join(left, right, "user_id", "t_us")` — keys and
  * times must be long-typed columns (epoch micros for times). */
object AsOf {
  def join(spark: SparkSession, left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, tieBreakCols: Seq[String] = Nil): DataFrame = {
    // public hook: make the strategy available in ANY session (the
    // GraftExtensions path covers sessions configured at startup)
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    def attr(df: DataFrame, name: String): Expression =
      Bridge.planOf(df).output.find(_.name == name)
        .getOrElse(sys.error(s"column $name not found"))
    // alias-isolate the right side: left and right often share lineage
    // (self as-of joins) and the analyzer's DeduplicateRelations doesn't
    // know this node — a rename projection mints fresh exprIds
    val rightIso = right.toDF(right.columns.map(_ + "__r").toIndexedSeq: _*)
    val node = AsOfJoinNode(
      Bridge.planOf(left), Bridge.planOf(rightIso),
      attr(left, keyCol), attr(rightIso, keyCol + "__r"),
      attr(left, timeCol), attr(rightIso, timeCol + "__r"),
      tieBreakCols.map(c => attr(rightIso, c + "__r")))
    Bridge.ofRows(spark, node)
  }
}
