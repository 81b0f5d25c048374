package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, JoinedRow, SortOrder, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join: for each left row, attach the right row with the same key and
  * the greatest timestamp <= the left timestamp (left-outer semantics).
  *
  * Spark SQL has no native as-of join. graft ships two forms:
  *  - [[graft.streaming.AsOf.viaWindow]] — composed from built-ins
  *    (union + last(ignoreNulls) window), the default per the
  *    compose-first rule;
  *  - this custom operator — the full LogicalPlan → Strategy → SparkPlan
  *    tier, for when the windowed form's union shuffle is the bottleneck:
  *    it declares hash distribution + (key, ts) ordering requirements, so
  *    Catalyst plans exactly one shuffle+sort per side and the join itself
  *    is a streaming merge scan with O(1) state (the last-seen right row).
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan, keyName: String, tsName: String)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  // key/ts live as names (not Expressions), so declare them as references
  // explicitly — otherwise ColumnPruning strips them from the children.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      (left.output ++ right.output).filter(a => a.name == keyName || a.name == tsName))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan, keyName: String, tsName: String)
    extends BinaryExecNode {

  private def keyOf(p: SparkPlan): Attribute = p.output.find(_.name == keyName).get
  private def tsOf(p: SparkPlan): Attribute = p.output.find(_.name == tsName).get

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(keyOf(left))) :: ClusteredDistribution(Seq(keyOf(right))) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder.apply(keyOf(left), org.apache.spark.sql.catalyst.expressions.Ascending),
            SortOrder.apply(tsOf(left), org.apache.spark.sql.catalyst.expressions.Ascending)),
        Seq(SortOrder.apply(keyOf(right), org.apache.spark.sql.catalyst.expressions.Ascending),
            SortOrder.apply(tsOf(right), org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.name == keyName)
    val lTsIdx = left.output.indexWhere(_.name == tsName)
    val rKeyIdx = right.output.indexWhere(_.name == keyName)
    val rTsIdx = right.output.indexWhere(_.name == tsName)
    val rWidth = right.output.length
    val lKeyType = left.output(lKeyIdx).dataType
    val lTsType = left.output(lTsIdx).dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      // materialize each JoinedRow as an UnsafeRow: operators that consume
      // this plan's output directly (collect, exchange) require UnsafeRow —
      // without this the node only worked under a downstream Project
      val toUnsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
        output.map(_.dataType).toArray)
      val rBuf = rIter.buffered
      var heldKey: Long = 0L
      var held: InternalRow = null // last right row with key == heldKey and ts <= current left ts
      lIter.map { lRow =>
        // SQL convention: NULL keys/timestamps match nothing. Without the
        // explicit checks, getLong reads NULL as 0 and silently joins
        // null-key rows to real key 0 (Ascending ordering clusters nulls
        // first, so they'd all masquerade as the head key).
        if (lRow.isNullAt(lKeyIdx) || lRow.isNullAt(lTsIdx)) toUnsafe(joined(lRow, nullRight))
        else {
          val k = lRow.getLong(lKeyIdx)
          val t = lRow.getLong(lTsIdx)
          if (held != null && heldKey != k) held = null
          // advance right side through all rows with (key < k) or (key == k && ts <= t)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peek = rBuf.head
            if (peek.isNullAt(rKeyIdx) || peek.isNullAt(rTsIdx)) { rBuf.next() }
            else {
              val rk = peek.getLong(rKeyIdx)
              val rt = peek.getLong(rTsIdx)
              if (rk < k) { rBuf.next() } // different key: discard, nothing held
              else if (rk == k && rt <= t) { held = rBuf.next().copy(); heldKey = rk }
              else advancing = false
            }
          }
          toUnsafe(joined(lRow, if (held != null && heldKey == k) held else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, k, t) => AsOfJoinExec(planLater(l), planLater(r), k, t) :: Nil
    case _ => Nil
  }
}

object AsOfJoinHelper {
  /** Build a DataFrame over the custom logical node, registering the
    * strategy on the session (idempotent). `key` and `ts` must be long
    * columns present in BOTH inputs with the same names.
    *
    * Self-join safety: Spark's DeduplicateRelations rule only rewrites ITS
    * join node types, so a custom BinaryNode over two plans derived from the
    * same DataFrame would carry duplicate exprIds across left.output and
    * right.output (ambiguous downstream resolution). When the outputs
    * overlap, the right side is re-projected through explicit aliases,
    * which mint fresh exprIds. */
  def asofJoin(l: DataFrame, r: DataFrame, key: String, ts: String): DataFrame = {
    val spark = l.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfStrategy
    val lPlan = l.queryExecution.analyzed
    val rSafe =
      if (lPlan.outputSet.intersect(r.queryExecution.analyzed.outputSet).nonEmpty)
        r.select(r.columns.map(c => org.apache.spark.sql.functions.col(c).as(c)): _*)
      else r
    Dataset.ofRows(spark, AsOfJoin(lPlan, rSafe.queryExecution.analyzed, key, ts))
  }
}
