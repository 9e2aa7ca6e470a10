package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSql, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** A true AS-OF JOIN operator — the full custom-operator seam (logical
  * node → planner strategy → physical sort-merge execution), the
  * preference-ladder step (c) for semantics Spark's built-ins can't
  * express as a single operator: "for each left row, the LATEST right
  * row of the same key with rightTime <= leftTime".
  *
  * Physical shape (the scale-canonical one): both sides hash-cluster on
  * their key and sort by (key, time) — ONE shuffle each, supplied by
  * EnsureRequirements exactly as for a sort-merge join — then a single
  * forward merge per partition emits every left row with its most
  * recent right match (left outer: null-padded when none). No
  * row-explosion, no window re-scan; state per partition is one
  * buffered right row.
  *
  * (The composed union+window form in RelationalQueries.asofJoinEvents
  * covers the self-join case; this operator handles two arbitrary
  * relations. AsOfJoinSpec proves both agree on the events table.)
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    broadcastRight: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, bcast) =>
      (if (bcast) BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt)
       else AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // one shuffle per side, co-partitioned on the keys (EnsureRequirements
  // aligns the two hash partitionings exactly as for SortMergeJoin)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(output, output) // downstream ops expect UnsafeRow
      val rBuf = rIter.buffered
      // most recent right row for the key currently being merged
      var matchKey: Any = null
      var matchRow: InternalRow = null

      lIter.map { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        if (k == null || t == null) proj(joined(lRow, nullRight))
        else {
          // advance the right side through every row with
          // (rKey < k) or (rKey == k && rTime <= t); null keys/times
          // sort first under Ascending and are discarded
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rKey.eval(rBuf.head)
            val rt = rTime.eval(rBuf.head)
            val cmp = if (rk == null) -1 else keyOrd.compare(rk.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef])
            if (cmp < 0) { rBuf.next() } // earlier key (or null key): discard
            else if (cmp == 0 && rt == null) { rBuf.next() } // null time: discard
            else if (cmp == 0 &&
                timeOrd.compare(rt.asInstanceOf[AnyRef], t.asInstanceOf[AnyRef]) <= 0) {
              matchRow = rBuf.next().copy() // unsafe rows are reused
              // re-evaluate the key against the COPIED row: `rk` may be a
              // UTF8String/byte-array view into the reused (or spill-reader)
              // buffer, whose bytes are overwritten on the next advance
              matchKey = rKey.eval(matchRow)
            } else advancing = false
          }
          val hasMatch = matchRow != null && matchKey != null &&
            keyOrd.compare(matchKey.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef]) == 0
          proj(joined(lRow, if (hasMatch) matchRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Broadcast variant: the SMALL right side broadcasts whole, the big
  * left side keeps its existing partitioning — zero shuffle, zero sort
  * on EITHER side (the canonical shape when a huge fact stream as-of
  * joins a dimension-sized series, e.g. trades × reference quotes).
  * Each task builds a key → time-sorted-rows index from the broadcast
  * once and answers left rows by binary search. Among right rows with
  * identical (key, time) the chosen row is unspecified (same as the
  * sort-merge variant).
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution,
    org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
      org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.length
    // the index keys on boxed catalyst values via Java equality — fine
    // for numeric/string/timestamp keys, WRONG for BinaryType
    // (Array[Byte] has identity equals: every lookup would miss and the
    // output would silently null-pad); reject it up front
    require(!leftKey.dataType.isInstanceOf[org.apache.spark.sql.types.BinaryType],
      "broadcast as-of join does not support BinaryType keys; use the sort-merge variant")
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { lIter =>
      if (lIter.isEmpty) Iterator.empty
      else {
      // per-task index build: O(R log R) over the broadcast — suited to
      // dimension-sized right sides; empty partitions skip the build
      val index = new java.util.HashMap[Any, Array[(AnyRef, InternalRow)]]()
      val grouped = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[(AnyRef, InternalRow)]]()
      broadcastRows.value.foreach { row =>
        val k = rKey.eval(row)
        val t = rTime.eval(row)
        if (k != null && t != null) {
          var buf = grouped.get(k)
          if (buf == null) { buf = scala.collection.mutable.ArrayBuffer.empty; grouped.put(k, buf) }
          buf += ((t.asInstanceOf[AnyRef], row))
        }
      }
      grouped.forEach { (k, buf) =>
        index.put(k, buf.sortBy(_._1)(timeOrd.asInstanceOf[Ordering[AnyRef]]).toArray)
      }
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(output, output)

      lIter.map { lRow =>
        val k = lKey.eval(lRow)
        val t = lTime.eval(lRow)
        val arr = if (k == null) null else index.get(k)
        if (t == null || arr == null) proj(joined(lRow, nullRight))
        else {
          // binary search: last entry with time <= t
          var lo = 0
          var hi = arr.length - 1
          var ans = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (timeOrd.compare(arr(mid)._1, t.asInstanceOf[AnyRef]) <= 0) { ans = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          proj(joined(lRow, if (ans >= 0) arr(ans)._2 else nullRight))
        }
      }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Surface API: `asof(trades, quotes, "symbol", "symbol", "ts", "q_ts")`.
    * Column names must be unambiguous; rename the right side first if
    * names collide. Registers the planner strategy once per session.
    */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           broadcastRight: Boolean = false): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = GraftSql.analyzedPlan(leftDf)
    val rPlan = GraftSql.analyzedPlan(rightDf)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.filter(_.name == name) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name).mkString(",")}")
        case many => throw new IllegalArgumentException(
          s"column $name is ambiguous (${many.size} attributes) — rename before asof")
      }
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    // both execs derive orderings/lookups from the LEFT types — a
    // mismatched right side would silently miss (boxed-value lookups)
    // or throw mid-job (ordering cast); fail at call time instead
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: ${lk.dataType.sql} vs ${rk.dataType.sql}")
    require(lt.dataType == rt.dataType,
      s"as-of time types differ: ${lt.dataType.sql} vs ${rt.dataType.sql}")
    GraftSql.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt, broadcastRight))
  }
}
