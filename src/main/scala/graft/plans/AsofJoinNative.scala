package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.GraftShim

/** Native as-of join — preference order (c) from the build brief: a
  * custom LogicalPlan + SparkStrategy + SparkPlan for a whole-operator
  * semantic Spark lacks (the reference's latest-run-wins selection,
  * core/models/item.py:308-313, generalized; DuckDB ships it as
  * `ASOF JOIN`).
  *
  * Physical shape: both children hash-partitioned on the key
  * (EnsureRequirements co-partitions them exactly as for a sort-merge
  * join) and sorted by (key, time); one streaming merge pass per
  * partition emits, for every left row, the payload of the latest right
  * row with rightTime <= leftTime. Versus the composed union+window
  * form (`AsofJoin.asof`): no union of the two sides, no window state,
  * no left-payload NULL columns shuffled — each side shuffles only
  * itself, and the merge is O(|L| + |R|) with one remembered row.
  *
  * Contract: right side unique per (key, rightTime) for deterministic
  * payloads (same requirement the composed form and DuckDB's ASOF have
  * on ties); null keys/times never match, like the SQL inequality.
  *
  * The node carries RESOLVED Attributes (not names) so they land in
  * `references` — without that, ColumnPruning sees no references and
  * strips the key/time columns out of the children.
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Size-based physical selection, the same decision Spark's join
  * planning makes: a right side under the broadcast threshold plans as
  * [[BroadcastAsofJoinExec]] (zero shuffles, zero sorts — the
  * huge-fact ⋈ small-reference serving shape); otherwise the
  * co-partitioned streaming merge [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, lt, rk, rt, p) =>
      val thr = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      if (thr > 0 && r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= thr)
        BroadcastAsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, p) :: Nil
      else
        AsofJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, p) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  private def ordinal(side: SparkPlan, a: Attribute): Int = {
    val i = side.output.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"attribute $a not found in ${side.output}")
    i
  }

  /** Long-backed physical types (bigint, timestamp, timestamp_ntz)
    * compare as primitives — the common key/time case (ids, event
    * times) skips the boxed value extraction and Ordering dispatch. */
  private def longBacked(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    require(rightKey.dataType == keyType, "key types must match")
    require(rightTime.dataType == timeType, "left/right time types must match")
    val lKeyOrd = ordinal(left, leftKey)
    val lTimeOrd = ordinal(left, leftTime)
    val rKeyOrd = ordinal(right, rightKey)
    val rTimeOrd = ordinal(right, rightTime)
    val payloadSchema = payload
    val rightSchema = right.output
    val outputAttrs = output

    if (longBacked(keyType) && longBacked(timeType)) {
      return left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val payloadProj = UnsafeProjection.create(payloadSchema, rightSchema)
        val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
        val nullRow = new GenericInternalRow(payloadSchema.length)
        val joined = new JoinedRow
        new Iterator[InternalRow] {
          private var matchedKey = 0L
          private var matched: InternalRow = null
          private var pendingRight: InternalRow = null
          private def nextRight(): InternalRow = {
            if (pendingRight != null) { val r = pendingRight; pendingRight = null; r }
            else if (rIter.hasNext) rIter.next()
            else null
          }
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            if (l.isNullAt(lKeyOrd) || l.isNullAt(lTimeOrd))
              return outProj(joined(l, nullRow))
            val lk = l.getLong(lKeyOrd)
            val lt = l.getLong(lTimeOrd)
            var r = nextRight()
            var continue = r != null
            while (continue) {
              if (r.isNullAt(rKeyOrd)) {
                r = if (rIter.hasNext) rIter.next() else null
                continue = r != null
              } else {
                val rk = r.getLong(rKeyOrd)
                val rtNull = r.isNullAt(rTimeOrd)
                if (rk > lk || (rk == lk && !rtNull && r.getLong(rTimeOrd) > lt)) {
                  pendingRight = r; continue = false
                } else {
                  if (rk == lk && !rtNull) {
                    matchedKey = rk
                    matched = payloadProj(r).copy()
                  }
                  r = if (rIter.hasNext) rIter.next() else null
                  continue = r != null
                }
              }
            }
            val hit = matched != null && matchedKey == lk
            outProj(joined(l, if (hit) matched else nullRow))
          }
        }
      }
    }

    val keyOrdering = TypeUtils.getInterpretedOrdering(keyType)
    val timeOrdering = TypeUtils.getInterpretedOrdering(timeType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadSchema, rightSchema)
      // SparkPlan contract: emit UnsafeRow (shuffles, sorts and
      // getByteArrayRdd all cast to it) — project the JoinedRow out
      val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val nullRow = new GenericInternalRow(payloadSchema.length)
      val joined = new JoinedRow
      val merged = new Iterator[InternalRow] {
        private var matchedKey: Any = null          // key of `matched`
        private var matched: InternalRow = null     // copied payload row
        private var pendingRight: InternalRow = null
        private def nextRight(): InternalRow = {
          if (pendingRight != null) { val r = pendingRight; pendingRight = null; r }
          else if (rIter.hasNext) rIter.next()
          else null
        }
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = if (l.isNullAt(lKeyOrd)) null else l.get(lKeyOrd, keyType)
          val lt = if (l.isNullAt(lTimeOrd)) null else l.get(lTimeOrd, timeType)
          if (lk == null || lt == null) return joined(l, nullRow)
          // advance the right side past every row with
          // (rk < lk) or (rk == lk && rt <= lt), remembering the last match
          var r = nextRight()
          var continue = r != null
          while (continue) {
            val rk = if (r.isNullAt(rKeyOrd)) null else r.get(rKeyOrd, keyType)
            val rt = if (r.isNullAt(rTimeOrd)) null else r.get(rTimeOrd, timeType)
            val cmp = if (rk == null) -1 else keyOrdering.compare(rk, lk)
            if (cmp > 0 || (cmp == 0 && rt != null && timeOrdering.compare(rt, lt) > 0)) {
              pendingRight = r; continue = false       // beyond this left row
            } else {
              if (cmp == 0 && rt != null) {            // candidate match
                // rk may be a view into the right iterator's reused row
                // buffer (UTF8String, Decimal, struct) — copy it, as
                // SortMergeJoin does for retained keys
                matchedKey = InternalRow.copyValue(rk)
                matched = payloadProj(r).copy()
              }
              r = if (rIter.hasNext) rIter.next() else null
              continue = r != null
            }
          }
          val hit = matched != null && matchedKey != null &&
            keyOrdering.compare(matchedKey, lk) == 0
          joined(l, if (hit) matched else nullRow)
        }
      }
      merged.map(outProj)
    }
  }

  // the operator preserves the left side's partitioning and row order —
  // declare it so downstream key-wise operators don't re-shuffle/re-sort
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of: the right side (small — a reference/state table)
  * ships to every executor whole; each left partition probes an
  * in-memory per-key time-sorted index with binary search. NO exchange
  * and NO sort on either side — the left side's layout passes through
  * untouched (outputPartitioning/outputOrdering forwarded), so a
  * 100 TB fact side joins its latest reference state at scan speed. */
case class BroadcastAsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) :: Nil

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  private def ordinal(attrs: Seq[Attribute], a: Attribute): Int = {
    val i = attrs.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"attribute $a not found in $attrs")
    i
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val lKeyOrd = ordinal(left.output, leftKey)
    val lTimeOrd = ordinal(left.output, leftTime)
    val rKeyOrd = ordinal(right.output, rightKey)
    val rTimeOrd = ordinal(right.output, rightTime)
    val timeOrdering = TypeUtils.getInterpretedOrdering(timeType)
    val payloadSchema = payload
    val rightSchema = right.output
    val outputAttrs = output
    val bcast = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions({ lIter =>
      // per-key arrays of (time, payload) sorted by time; built once per
      // partition from the broadcast rows (cheap: the side is small by
      // selection) — rows in the broadcast array are stable copies
      val payloadProj = UnsafeProjection.create(payloadSchema, rightSchema)
      val index = new java.util.HashMap[Any, Array[(Any, InternalRow)]]()
      val grouped = new java.util.HashMap[Any, java.util.ArrayList[(Any, InternalRow)]]()
      bcast.value.foreach { r =>
        if (!r.isNullAt(rKeyOrd) && !r.isNullAt(rTimeOrd)) {
          val rk = r.get(rKeyOrd, keyType)
          val rt = r.get(rTimeOrd, timeType)
          grouped.computeIfAbsent(rk, _ => new java.util.ArrayList())
            .add((rt, payloadProj(r).copy()))
        }
      }
      grouped.forEach { (k, list) =>
        val arr = list.toArray(new Array[(Any, InternalRow)](list.size()))
        java.util.Arrays.sort(arr,
          (a: (Any, InternalRow), b: (Any, InternalRow)) => timeOrdering.compare(a._1, b._1))
        index.put(k, arr)
      }
      val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val nullRow = new GenericInternalRow(payloadSchema.length)
      val joined = new JoinedRow
      lIter.map { l =>
        var payloadRow: InternalRow = nullRow
        if (!l.isNullAt(lKeyOrd) && !l.isNullAt(lTimeOrd)) {
          val arr = index.get(l.get(lKeyOrd, keyType))
          if (arr != null) {
            val lt = l.get(lTimeOrd, timeType)
            // binary search: greatest rt <= lt
            var lo = 0; var hi = arr.length - 1; var best = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrdering.compare(arr(mid)._1, lt) <= 0) { best = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (best >= 0) payloadRow = arr(best)._2
          }
        }
        outProj(joined(l, payloadRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry: same signature and `asof_` aliasing as the
  * composed [[AsofJoin.asof]], but planned through the native operator
  * (requires `AsofJoinStrategy` registered — Sessions.build does, and
  * GraftExtensions injects it for spark-submit deployments). */
object AsofJoinNative {
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val lPlan = GraftShim.analyzed(left)
    val rPlan0 = GraftShim.analyzed(right)
    // self-join shape: when the sides share attribute ids (both derive
    // from the same scan), optimizer rules see one instance as already
    // provided and prune it from the other child — re-alias the right
    // side with fresh exprIds, exactly what the analyzer's
    // deduplication does for built-in joins
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def a(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"column $name not found"))
    val payloadAttrs = payload.map(a(rPlan, _))
    val out = GraftShim.ofRows(left.sparkSession,
      AsofJoinPlan(lPlan, rPlan, a(lPlan, key), a(lPlan, leftTime),
        a(rPlan, key), a(rPlan, rightTime), payloadAttrs))
    // select by resolved attribute, not name — a payload name that also
    // exists on the left would make bare-name resolution ambiguous
    out.select((lPlan.output.map(GraftShim.column) ++
      payloadAttrs.map(p => GraftShim.column(p).as(s"asof_${p.name}")))
      .toIndexedSeq: _*)
  }
}
