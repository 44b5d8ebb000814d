package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{
  DataType, DateType, IntegerType, LongType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Native AS-OF JOIN — the one operator in this engine built as a
  * whole custom operator (logical node + planner strategy + physical
  * exec, registered through `SparkSessionExtensions`), the extension
  * tier below composed built-ins and custom expressions. The composed
  * form ([[graft.operators.Advanced]] `adv_asof_join`: union both
  * sides, tag, `last(..., ignoreNulls)` over a row frame, filter the
  * probe tag) is correct and one-shuffle, but it materializes the
  * union (every probe row carries the build row's struct through the
  * window buffer) and pays the window machinery for what is really a
  * single forward merge. This exec IS that merge: both sides
  * hash-clustered on the key and sorted by (key, time), one linear
  * zip per partition, O(1) state — the classic sorted as-of
  * (kdb/QuestDB/Pandas `merge_asof` semantics: for each left row, the
  * LATEST right row with the same key and `right.time <= left.time`).
  *
  * Semantics pinned:
  *   - LEFT OUTER: every left row emits exactly once; no qualifying
  *     right row → right columns NULL.
  *   - NULL left key or NULL left time: matches nothing (ANSI
  *     comparison), emits with NULLs. NULL right keys/times are
  *     skipped (never candidates). NULLS FIRST ordering makes both
  *     cheap: null rows drain before real ones.
  *   - Ties (equal key+time on the right): the LAST row in the
  *     right-side sort order wins, so callers pass `rightTiebreak`
  *     columns to make that order total — the declared query breaks
  *     by event_id, matching the window composition bit-for-bit.
  *   - Directions ([[AsOfDirection]], the pandas `merge_asof`
  *     matrix): BACKWARD (above), FORWARD (earliest at-or-after,
  *     ties to the FIRST row in order), NEAREST (closer of the two,
  *     at-or-before winning exact-distance ties); `toleranceUs`
  *     bounds the match distance in any direction.
  *
  * 100 TB shape: exactly the two hash exchanges + two sorts a
  * sort-merge join would pay (EnsureRequirements plans them from the
  * declared [[AsOfJoinExec.requiredChildDistribution]]); no union
  * fan-in, no window buffer, no struct carry. Keys cluster by the
  * join key so partition counts scale with the data; per-partition
  * state is ONE buffered right row. */
/** Merge direction (pandas `merge_asof` vocabulary): BACKWARD = latest
  * right at-or-before (ties → LAST in right sort order), FORWARD =
  * earliest right at-or-after (ties → FIRST), NEAREST = whichever of
  * the two is closer in time, the at-or-before side winning exact
  * distance ties (so an equal-timestamp match always resolves
  * backward). */
sealed trait AsOfDirection
case object AsOfBackward extends AsOfDirection
case object AsOfForward extends AsOfDirection
case object AsOfNearest extends AsOfDirection

final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression],
    direction: AsOfDirection,
    toleranceUs: Option[Long]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression],
    direction: AsOfDirection,
    toleranceUs: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-cluster both sides on the key — EnsureRequirements inserts the
  // hash exchanges (or reuses compatible child partitioning, e.g. a
  // bucketed scan) exactly as it would for a sort-merge join
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey), false, None) ::
    ClusteredDistribution(Seq(rightKey), false, None) :: Nil

  // the merge needs (key, time) order; the right side's total order is
  // the tie RULE (last-in-order wins), so the caller's tiebreak columns
  // ride in the required ordering and the sort pays for determinism
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
        rightTiebreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  private def ordinalOf(e: Expression, side: Seq[Attribute]): Int = {
    val a = e.asInstanceOf[Attribute]
    val i = side.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"as-of expression $e not found in ${side.mkString(",")}")
    i
  }

  /** Hot-path key comparator: the current left row's key is cached by
    * `load`, and `cmp(r, ord)` compares a right-side row's key to it
    * (<0 right behind, 0 match, >0 right ahead). The r14 isolated A/B
    * priced the interpreted `SortOrder`-semantics ordering at ~1.5×
    * the window composition (0.611 vs 0.400 s at sf0.1): one boxing
    * `get` plus one megamorphic `Ordering` dispatch per probe, and the
    * merge probes keys O(|left| + |right|) times — it IS the exec's
    * constant factor (r14 verdict item 2). The dominant key shapes get
    * primitive monomorphic comparators; every other orderable type
    * (decimal, struct, date, …) keeps the interpreted fallback, which
    * is what keeps key generality free to offer. */
  private sealed abstract class KeyCmp extends Serializable {
    def load(l: InternalRow): Unit
    def cmp(r: InternalRow, ord: Int): Int
  }
  /** int64-backed keys: Long and Timestamp (µs) share the physical
    * layout, so one comparator covers both. */
  private final class LongKeyCmp(lk: Int) extends KeyCmp {
    private[this] var k = 0L
    override def load(l: InternalRow): Unit = k = l.getLong(lk)
    override def cmp(r: InternalRow, ord: Int): Int =
      java.lang.Long.compare(r.getLong(ord), k)
  }
  private final class IntKeyCmp(lk: Int) extends KeyCmp {
    private[this] var k = 0
    override def load(l: InternalRow): Unit = k = l.getInt(lk)
    override def cmp(r: InternalRow, ord: Int): Int =
      java.lang.Integer.compare(r.getInt(ord), k)
  }
  private final class StringKeyCmp(lk: Int) extends KeyCmp {
    private[this] var k: UTF8String = _
    // clone: the cached key must survive the left iterator's row reuse
    override def load(l: InternalRow): Unit = k = l.getUTF8String(lk).clone()
    override def cmp(r: InternalRow, ord: Int): Int =
      r.getUTF8String(ord).compareTo(k)
  }
  private final class GenericKeyCmp(lk: Int, dt: DataType) extends KeyCmp {
    private[this] val ordering: Ordering[Any] =
      TypeUtils.getInterpretedOrdering(dt)
    private[this] var k: Any = _
    override def load(l: InternalRow): Unit = k = l.get(lk, dt) match {
      // copy non-primitive holders for the same row-reuse reason
      case u: UTF8String => u.clone()
      case row: InternalRow => row.copy()
      case other => other
    }
    override def cmp(r: InternalRow, ord: Int): Int =
      ordering.compare(r.get(ord, dt), k)
  }
  private def keyCmpFor(dt: DataType, lk: Int): KeyCmp = dt match {
    case LongType | TimestampType => new LongKeyCmp(lk)
    case IntegerType | DateType => new IntKeyCmp(lk)
    case StringType => new StringKeyCmp(lk)
    case _ => new GenericKeyCmp(lk, dt)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    // defense in depth — AsOf.join already rejected these at
    // analysis time with a caller-facing message
    AsOf.validateTypes(leftKey.dataType, rightKey.dataType,
      leftTime.dataType, rightTime.dataType)
    val keyDt: DataType = leftKey.dataType
    val lk = ordinalOf(leftKey, left.output)
    val lt = ordinalOf(leftTime, left.output)
    val rk = ordinalOf(rightKey, right.output)
    val rt = ordinalOf(rightTime, right.output)
    val leftSchema = left.output
    // the projection must BIND the right side as nullable — the
    // null-fill row feeds these ordinals, and a non-nullable bound
    // reference would elide the null check and read garbage zeros
    val rightSchema = right.output.map(_.withNullability(true))
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // Output path (r15): both inputs are UnsafeRow in practice
      // (sorted exchanges / bucketed scans), so the joined output is a
      // BITWISE concatenation — GenerateUnsafeRowJoiner copies the two
      // rows' fixed+variable regions wholesale instead of re-encoding
      // field by field (the UnsafeProjection path priced the exec 3×
      // the codegen'd window composition per row at the 10× scale
      // audit). The projection remains as the fallback for any
      // non-Unsafe row shape.
      val rowJoiner =
        org.apache.spark.sql.catalyst.expressions.codegen
          .GenerateUnsafeRowJoiner.create(
            DataTypeUtils.fromAttributes(leftSchema),
            DataTypeUtils.fromAttributes(rightSchema))
      val proj = UnsafeProjection.create(allOut, leftSchema ++ rightSchema)
      val joiner = new JoinedRow
      val nRight = rightSchema.size
      val rightNulls = new GenericInternalRow(nRight)
      // all-null right side as an UnsafeRow, built once (the LEFT
      // OUTER null-fill for the bitwise path)
      val rightNullsUnsafe: UnsafeRow =
        UnsafeProjection.create(rightSchema.map(_.dataType).toArray)
          .apply(rightNulls).copy()
      // per-partition (stateful — never share across partitions)
      val cmp = keyCmpFor(keyDt, lk)
      // COPY DISCIPLINE (r14 peek-copy note + r15 allocation fix):
      // rows pulled from rIt are only guaranteed valid until the next
      // next() (SortExec/ColumnarToRow happen to keep them one step,
      // a sort-elided bucketed scan path need not), so any row held
      // across pulls must be copied. The merge holds at most TWO at a
      // time — the unconsumed head (`pending`) and the latest match
      // (`lastMatch`) — so instead of one heap allocation per right
      // row (the old peek-time .copy()), rows DISCARDED by the drain
      // (behind the frontier, null keys) are examined RAW and never
      // copied, and survivors land in two REUSED UnsafeRow buffers
      // whose references swap on the pending→lastMatch handoff.
      // Invariant: pending only ever occupies pendingBuf, lastMatch
      // only lastBuf (or a plain copy on the non-UnsafeRow rare path).
      def newBuf(): UnsafeRow = {
        val b = new UnsafeRow(nRight)
        b.pointTo(new Array[Byte](64), 0)
        b
      }
      var pendingBuf = newBuf()
      var lastBuf = newBuf()
      def copyInto(r: InternalRow, buf: UnsafeRow): InternalRow = r match {
        case u: UnsafeRow => buf.copyFrom(u); buf
        case o => o.copy()
      }
      var lastMatch: InternalRow = null
      var pending: InternalRow = null
      // consume the current drain row as the new lastMatch
      def consume(r: InternalRow, fromPending: Boolean): Unit =
        if (fromPending) {
          lastMatch = pending
          val tmp = pendingBuf; pendingBuf = lastBuf; lastBuf = tmp
          pending = null
        } else lastMatch = copyInto(r, lastBuf)
      lIt.map { l =>
        val matched =
          if (l.isNullAt(lk) || l.isNullAt(lt)) null // UNKNOWN: no match
          else if (direction != AsOfForward) {
            // BACKWARD drain (latest right with rt <= lt): consume every
            // qualifying row; the last consumed in sort order wins ties.
            // NEAREST shares this drain — it never discards a row with
            // rt > lt, so the unconsumed head stays available as the
            // forward candidate.
            cmp.load(l); val t = l.getLong(lt)
            var continue = true
            while (continue) {
              val fromPending = pending != null
              val r = if (fromPending) pending
                      else if (rIt.hasNext) rIt.next()
                      else null
              if (r == null) continue = false
              // null right key sorts first (NULLS FIRST) and never
              // qualifies — discard raw
              else if (r.isNullAt(rk)) { if (fromPending) pending = null }
              else {
                val c = cmp.cmp(r, rk)
                if (c < 0) { if (fromPending) pending = null } // behind
                else if (c == 0 && !r.isNullAt(rt) && r.getLong(rt) <= t)
                  consume(r, fromPending) // qualifying: last-in-order wins
                else if (c == 0 && r.isNullAt(rt)) {
                  if (fromPending) pending = null // never qualifies
                } else {
                  // right is ahead of this left row: keep as the head
                  if (!fromPending) pending = copyInto(r, pendingBuf)
                  continue = false
                }
              }
            }
            // tolerance: the latest qualifying row still loses if it is
            // farther back than the bound (merge_asof semantics — the
            // match is the nearest-at-or-before, never an older one
            // "within" the bound)
            val bwd =
              if (lastMatch != null && cmp.cmp(lastMatch, rk) == 0 &&
                  toleranceUs.forall(t - lastMatch.getLong(rt) <= _))
                lastMatch
              else null
            if (direction == AsOfBackward) bwd
            else {
              // NEAREST: the unconsumed head is the earliest right with
              // rt > lt (an rt == lt row was consumed backward, where it
              // wins the 0-distance tie by rule) — compare distances,
              // at-or-before winning ties
              val cand = pending
              val fwd =
                if (cand != null && !cand.isNullAt(rk) &&
                    cmp.cmp(cand, rk) == 0 && !cand.isNullAt(rt) &&
                    toleranceUs.forall(cand.getLong(rt) - t <= _))
                  cand
                else null
              if (bwd == null) fwd
              else if (fwd == null) bwd
              else if (t - bwd.getLong(rt) <= fwd.getLong(rt) - t) bwd
              else fwd
            }
          } else {
            // FORWARD (earliest right with rt >= lt): discard rows
            // strictly behind, then the FIRST unconsumed row is the
            // match iff it carries this key — it is NOT consumed, since
            // a later left row (larger lt) may share it; left rows are
            // ascending, so discarded rows can never serve later lefts
            cmp.load(l); val t = l.getLong(lt)
            var continue = true
            while (continue) {
              val fromPending = pending != null
              val r = if (fromPending) pending
                      else if (rIt.hasNext) rIt.next()
                      else null
              if (r == null) continue = false
              else if (r.isNullAt(rk)) { if (fromPending) pending = null }
              else {
                val c = cmp.cmp(r, rk)
                if (c < 0 ||
                    (c == 0 && (r.isNullAt(rt) || r.getLong(rt) < t))) {
                  // behind (or never-qualifying null time): discard raw
                  if (fromPending) pending = null
                } else {
                  if (!fromPending) pending = copyInto(r, pendingBuf)
                  continue = false
                }
              }
            }
            val cand = pending
            if (cand != null && !cand.isNullAt(rk) &&
                cmp.cmp(cand, rk) == 0 &&
                toleranceUs.forall(cand.getLong(rt) - t <= _))
              cand // first in sort order = min tiebreak wins
            else null
          }
        l match {
          case lu: UnsafeRow =>
            matched match {
              case null => rowJoiner.join(lu, rightNullsUnsafe)
              case mu: UnsafeRow => rowJoiner.join(lu, mu)
              case other => proj(joiner(l, other))
            }
          case _ =>
            proj(joiner(l, if (matched == null) rightNulls else matched))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: [[AsOfJoinPlan]] → [[AsOfJoinExec]]. Registered in
  * [[graft.GraftExtensions]] via `injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lkey, rkey, ltime, rtime, tb, dir, tol) =>
      AsOfJoinExec(lkey, rkey, ltime, rtime, tb, dir, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Public API: `AsOf.join(probe, build, ...)` — column names resolved
  * against each side, right side re-aliased to fresh attribute ids so
  * self-as-of (both sides carved from one DataFrame, the common case)
  * never collides. */
object AsOf {
  /** Shared type contract, enforced at ANALYSIS time in [[join]] (a
    * bad caller gets an immediate, named error — not a task failure
    * minutes into a 100 TB run) and re-checked in the exec as defense:
    * keys must be ONE orderable type on both sides (string, int, long,
    * date, decimal, struct, …); times must be Timestamp or Long
    * (physical int64 — the tolerance bound is µs arithmetic). */
  private[plans] def validateTypes(lk: DataType, rk: DataType,
      lt: DataType, rt: DataType): Unit = {
    require(DataTypeUtils.sameType(lk, rk),
      s"as-of key types must match on both sides, got $lk vs $rk")
    require(RowOrdering.isOrderable(lk),
      s"as-of key type must be orderable, got $lk")
    Seq(lt, rt).foreach(t => require(
      t == TimestampType || t == LongType,
      s"as-of time must be Timestamp/Long, got $t"))
  }

  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      forward: Boolean = false,
      toleranceUs: Option[Long] = None): DataFrame =
    joinDir(left, right, leftKey, rightKey, leftTime, rightTime,
      rightTiebreak, if (forward) AsOfForward else AsOfBackward,
      toleranceUs)

  def joinDir(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String],
      direction: AsOfDirection,
      toleranceUs: Option[Long]): DataFrame = {
    import org.apache.spark.sql.functions.col
    // fresh exprIds on the build side (Alias allocates new ids), so a
    // self-join's duplicate attribute ids can't reach the analyzer
    val r = right.select(right.columns.toIndexedSeq.map(c =>
      col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        sys.error(s"as-of column $name not in ${p.output.map(_.name)}"))
    validateTypes(attr(lPlan, leftKey).dataType, attr(rPlan, rightKey).dataType,
      attr(lPlan, leftTime).dataType, attr(rPlan, rightTime).dataType)
    val plan = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      rightTiebreak.map(attr(rPlan, _)), direction, toleranceUs)
    org.apache.spark.sql.GraftDatasetBridge.ofRows(left.sparkSession, plan)
  }

  /** FORWARD as-of: for each left row, the EARLIEST right row with the
    * same key and `right.time >= left.time` — the time-to-NEXT-event
    * question (conversion lag, next-error-after-deploy) that backward
    * ASOF cannot ask; ties go to the FIRST row in the right-side sort
    * order (min tiebreak). Same distribution/ordering contract; the
    * merge's only state is the peeked head of the sorted build side
    * (one private copy), shared by every left row it answers. */
  def joinForward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String] = Nil): DataFrame =
    join(left, right, leftKey, rightKey, leftTime, rightTime,
      rightTiebreak, forward = true)

  /** NEAREST as-of (round 14 — completing pandas `merge_asof`'s
    * direction matrix): for each left row, whichever qualifying right
    * row — latest at-or-before vs earliest at-or-after — is CLOSER in
    * time, the at-or-before side winning exact-distance ties (an
    * equal-timestamp match therefore always resolves backward, with
    * the backward tie rule: LAST in right sort order). `toleranceUs`
    * bounds BOTH directions. Implementation is the backward merge
    * drain with the unconsumed build head doubling as the forward
    * candidate — same zipped single pass, same O(1) state, same
    * distribution/ordering contract (and therefore the same
    * zero-exchange story over bucketed layout). */
  def joinNearest(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      toleranceUs: Option[Long] = None): DataFrame =
    joinDir(left, right, leftKey, rightKey, leftTime, rightTime,
      rightTiebreak, AsOfNearest, toleranceUs)
}
