package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** One event row, matching the `events` table schema (TESTDATA.md). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Per-user running aggregate carried across micro-batches. */
case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/** Per-user EWMA fold state carried across micro-batches: event count
  * and the integer fixed-point EWMA (micro-units) so far. */
case class EwmaState(user_id: Long, n_events: Long, ewma_micro: Long)

/** [[EventStreams.ewmaUserStateTtl]]'s state + emission: the fold plus
  * the micros of the last event folded in (the collapse key). */
case class EwmaTtlState(user_id: Long, last_us: Long, n_events: Long,
    ewma_micro: Long)

/** Structured Streaming surface over event streams — the incremental
  * mirror of `graft.operators.Events` (same semantics; the batch versions
  * are the DuckDB-checkable ground truth).
  *
  * The reference has no streaming; its nearest analogs are poll-based
  * progress (`progress_job_iterator.py:4-84`) and resumable phase state
  * (`jobtracker.py:157-209`). Here those become Structured Streaming
  * incremental execution and checkpointed state.
  *
  * Scale notes: every aggregation is keyed (hash-partitioned state);
  * watermarks bound state size — without them windowed state grows
  * unboundedly at 100 TB/day. `mapGroupsWithState` state is per-key and
  * must stay O(1) per user.
  */
object EventStreams {

  /** Tumbling 1-hour windowed counts with a watermark: late events
    * beyond `lateness` are dropped; in Append mode a window emits once,
    * when the watermark passes its end. */
  def tumblingCounts(events: DataFrame, lateness: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows (1h every 15m): each event lands in 4 windows. */
  def slidingCounts(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket"), col("n"))

  /** Session windows with a 30-minute gap — the streaming version of the
    * batch `ev_sessions` query. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Exactly-once event dedup by id within the watermark horizon —
    * streaming `dropDuplicates` keeps per-key state until the watermark
    * passes (bounded state; an unbounded dedup would OOM at scale). */
  def dedupEvents(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming conversion funnel — the incremental form of the batch
    * `ev_funnel` (view → click → purchase, each stage reached only after
    * the previous): a per-user STATE MACHINE via mapGroupsWithState,
    * state = one Int per user (current stage), emitted in Update mode.
    *
    * Within a micro-batch, events are ordered by (event time, stage
    * rank) so a click tied with its view still counts — the same `>=`
    * tie rule as the batch operator. Across micro-batches the machine
    * assumes event-time-ordered arrival (the usual funnel-pipeline
    * contract); exact out-of-order handling would buffer events until
    * the watermark, trading state for completeness. [[EventStreamsSpec]]
    * pins stage-count parity against the batch ev_funnel ground truth. */
  def funnelStages(events: Dataset[Event]): Dataset[(Long, Int)] = {
    import events.sparkSession.implicits._
    val rank = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Int, (Long, Int)](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[Int]) =>
          var stage = state.getOption.getOrElse(0)
          batch.toSeq
            // FULL-precision time order: getTime alone truncates to
            // milliseconds, but the corpus is microsecond-precision and
            // the batch twin (ev_funnel) compares full timestamps — a
            // sub-millisecond view/click inversion would diverge from
            // the shared oracle. (getTime ms, getNanos fractional)
            // sorts the complete instant.
            .sortBy(e => (e.ts.getTime, e.ts.getNanos,
              rank.getOrElse(e.event_type, 3), e.event_id))
            .foreach { e =>
              e.event_type match {
                case "view" if stage == 0     => stage = 1
                case "click" if stage == 1    => stage = 2
                case "purchase" if stage == 2 => stage = 3
                case _                        =>
              }
            }
          state.update(stage)
          (uid, stage)
      }
  }

  /** [[funnelStagesTtl]]'s per-user state + emission: current stage and
    * the micros of the last event folded in. */
  case class FunnelTtlState(user_id: Long, last_us: Long, stage: Int)

  /** Gap TTL shared by the bounded-state machines ([[funnelStagesTtl]],
    * [[ewmaUserStateTtl]]) and their declared oracles. */
  val StateTtlUs: Long = 2L * 3600 * 1000000

  /** BOUNDED-STATE funnel (round 12) — closes the one honest gap in the
    * streaming state audit: [[funnelStages]] keeps a state entry for
    * every user EVER seen (`NoTimeout`), so its key set grows with
    * corpus lifetime. This variant declares GAP semantics — a user
    * inactive for more than [[StateTtlUs]] RESTARTS the funnel (their
    * stage resets to 0 before the next event applies) — and because the
    * reset rule is a function of the DATA (the gap between consecutive
    * event times), it is exactly replayable in SQL: final stage =
    * funnel over the user's LAST gap-free segment.
    *
    * `EventTimeTimeout` then makes the state BOUNDED without touching
    * the answer: a user's entry is evicted once the watermark passes
    * `last_ts + TTL`, and eviction is provably answer-invisible — any
    * event arriving after eviction has `ts ≥ watermark ≥ last_ts + TTL`
    * (the feed is time-sliced, so the watermark that fired the timeout
    * predates the event), which means the DATA rule would have reset
    * the stage to 0 anyway; a fresh zero state and a reset state are
    * the same state. Timing (which batch evicts, whether the timeout
    * lags) can therefore never move the declared answer — the scale
    * knob and the semantics are decoupled by construction. State held:
    * users active within the TTL horizon, not corpus lifetime.
    *
    * Emits nothing on timeout (flatMap form); per data batch emits the
    * user's (last_us, stage) so the consumer collapses to the LAST
    * emission per user (max last_us — strictly increasing across a
    * user's batches since later slices carry later timestamps). */
  def funnelStagesTtl(events: Dataset[Event]): Dataset[FunnelTtlState] = {
    import events.sparkSession.implicits._
    val rank = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelTtlState, FunnelTtlState](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[FunnelTtlState]) =>
          if (state.hasTimedOut) {
            state.remove() // eviction, not semantics: see Scaladoc
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              FunnelTtlState(uid, Long.MinValue, 0))
            batch.toSeq
              .sortBy(e => (e.ts.getTime, e.ts.getNanos,
                rank.getOrElse(e.event_type, 3), e.event_id))
              .foreach { e =>
                // full-precision micros: getTime carries ms, getNanos
                // the complete fraction (same discipline as the EWMA)
                val us = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
                val stage0 =
                  if (st.last_us != Long.MinValue &&
                    us - st.last_us > StateTtlUs) 0
                  else st.stage
                val stage1 = e.event_type match {
                  case "view" if stage0 == 0     => 1
                  case "click" if stage0 == 1    => 2
                  case "purchase" if stage0 == 2 => 3
                  case _                         => stage0
                }
                st = FunnelTtlState(uid, us, stage1)
              }
            state.update(st)
            state.setTimeoutTimestamp(st.last_us / 1000 + StateTtlUs / 1000)
            Iterator(st)
          }
      }
  }

  /** Custom state: per-user running (count, total) via mapGroupsWithState
    * — the analog of the reference's resumable job state (P5), but
    * per-key, checkpointed, and incremental. */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserTotals(uid, acc.n_events + 1, acc.total_value + e.value)
          }
          state.update(next)
          next
      }
  }

  /** Per-user EWMA as ONLINE fold state — the streaming twin of the
    * batch `ev_ewma` (`graft.operators.Events`): same floor-of-micros
    * int64 values, same (α·v + (1000−α)·e) DIV 1000 integer fold, same
    * full-precision (ts, event_id) order WITHIN a micro-batch, but the
    * fold state (count, ewma) is carried in checkpointed
    * `mapGroupsWithState` — per-key O(1) state at unbounded history,
    * which is exactly where the batch form's per-group sort stops
    * scaling. Cross-batch order is the ingest's responsibility (same
    * caveat as `funnelStages`: event-time-ordered arrival). */
  def ewmaUserState(events: Dataset[Event],
      alphaMille: Long = 300L): Dataset[EwmaState] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaState](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(uid, 0L, 0L))
          batch.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
            .foreach { e =>
              val v = math.floor(e.value * 1000000d).toLong
              st =
                if (st.n_events == 0L) EwmaState(uid, 1L, v)
                else EwmaState(uid, st.n_events + 1,
                  (alphaMille * v + (1000L - alphaMille) * st.ewma_micro) / 1000L)
            }
          state.update(st)
          st
      }
  }

  /** BOUNDED-STATE online EWMA (round 12) — [[funnelStagesTtl]]'s
    * sibling for fold state: inactivity > [[StateTtlUs]] RESTARTS the
    * fold (the EWMA re-seeds from the next event), so the declared
    * answer is the fold over the user's LAST gap-free segment — a pure
    * data rule the oracle replays with the same `list_reduce` as
    * `ev_ewma`, restricted to that segment. `EventTimeTimeout` evicts
    * idle users' state with the same answer-invisibility argument as
    * the funnel: a post-eviction event is always > TTL behind, so a
    * fresh zero-count state and a reset state are identical. Practical
    * reading: a per-user activity EWMA where "activity resumed after a
    * long silence" starts a new regime — and state holds only users
    * active within the horizon, the 100 TB shape. */
  def ewmaUserStateTtl(events: Dataset[Event],
      alphaMille: Long = 300L): Dataset[EwmaTtlState] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaTtlState, EwmaTtlState](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[EwmaTtlState]) =>
          if (state.hasTimedOut) {
            state.remove() // eviction, not semantics
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              EwmaTtlState(uid, Long.MinValue, 0L, 0L))
            batch.toSeq
              .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
              .foreach { e =>
                val us = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
                if (st.last_us != Long.MinValue &&
                  us - st.last_us > StateTtlUs)
                  st = EwmaTtlState(uid, st.last_us, 0L, 0L) // new regime
                val v = math.floor(e.value * 1000000d).toLong
                st =
                  if (st.n_events == 0L) EwmaTtlState(uid, us, 1L, v)
                  else EwmaTtlState(uid, us, st.n_events + 1,
                    (alphaMille * v +
                      (1000L - alphaMille) * st.ewma_micro) / 1000L)
              }
            state.update(st)
            state.setTimeoutTimestamp(st.last_us / 1000 + StateTtlUs / 1000)
            Iterator(st)
          }
      }
  }

  /** Stream-stream interval join: purchases attributed to a view by the
    * same user within the previous hour. Both sides carry watermarks and
    * the join condition bounds event-time distance, so each side's state
    * store holds only one hour (+ lateness) of rows per key — without
    * the bound, stream-stream join state grows forever. */
  def viewPurchaseAttribution(views: DataFrame, purchases: DataFrame,
      lateness: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", lateness)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", lateness)
    v.join(p, expr(
      """v_user = p_user AND
         p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR"""))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        col("v_ts"), col("p_ts"))
  }

  /** LEFT OUTER stream-stream interval join — the attribution question
    * asked the other way: EVERY view emits, with its purchase ids when
    * matched and a NULL purchase when the watermark PROVES no
    * qualifying purchase can still arrive. Matched pairs emit in the
    * batch that completes them (same as [[viewPurchaseAttribution]]);
    * the outer-NULL rows are pure watermark state machinery — a view
    * becomes provably unmatched only once the global watermark passes
    * `v_ts + 1 h` (the join bound) plus lateness, at which point Spark
    * evicts it from the left state store and emits the NULL row. This
    * eviction-triggered emission is the one stream-stream join path
    * the inner-join gates cannot exercise: an inner join that silently
    * drops state early still produces the right pairs on ordered
    * arrival, but a LEFT join that evicts early emits a SPURIOUS NULL
    * row and one that evicts late emits none — both directions are
    * hash-visible. Same bounded-state story as the inner form: each
    * side holds one hour + lateness per key. */
  def viewPurchaseLeftOuter(views: DataFrame, purchases: DataFrame,
      lateness: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", lateness)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", lateness)
    v.join(p, expr(
      """v_user = p_user AND
         p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR"""), "left_outer")
      .select(col("view_id"), col("purchase_id"),
        col("v_user").as("user_id"), col("v_ts"), col("p_ts"))
  }

  /** FULL OUTER stream-stream interval join — both directions of
    * [[viewPurchaseLeftOuter]]'s eviction-triggered emission at once:
    * unmatched VIEWS emit a NULL-purchase row when the watermark
    * passes `v_ts + 1 h` (left state eviction), and unmatched
    * PURCHASES emit a NULL-view row when it passes `p_ts` (right
    * state eviction — a purchase's candidate views all precede it, so
    * it is provably unmatched as soon as its own timestamp is behind
    * the watermark). The two sides evict on DIFFERENT schedules,
    * which is exactly what the gate pins: swapping the eviction
    * bounds fabricates or loses NULL rows on one side only. */
  def viewPurchaseFullOuter(views: DataFrame, purchases: DataFrame,
      lateness: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", lateness)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", lateness)
    v.join(p, expr(
      """v_user = p_user AND
         p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR"""), "full_outer")
      .select(col("view_id"), col("purchase_id"),
        coalesce(col("v_user"), col("p_user")).as("user_id"),
        col("v_ts"), col("p_ts"))
  }

  /** LEFT SEMI stream-stream interval join — the remaining member of
    * Spark's supported stream-stream join matrix (inner, left/full
    * outer, left semi): a view emits AT MOST ONCE, iff at least one
    * qualifying purchase lands within the following hour. Distinct
    * semantics no other gate in the family can see: a view with three
    * matching purchases emits three pairs under the inner join but ONE
    * row here, and the once-only contract spans micro-batches — the
    * matched flag must persist in the left state store so a second
    * purchase arriving in a LATER batch cannot re-emit the view
    * (duplicate emission is row-count-visible against the EXISTS
    * oracle). Bounded state exactly as the inner form. */
  def viewPurchaseSemi(views: DataFrame, purchases: DataFrame,
      lateness: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", lateness)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", lateness)
    v.join(p, expr(
      """v_user = p_user AND
         p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR"""), "left_semi")
      .select(col("view_id"), col("v_user").as("user_id"), col("v_ts"))
  }

  /** STREAMING AS-OF JOIN (round 14) — the whole-operator tier's
    * batch/streaming duality completed from the other side: the batch
    * engine answers `st_interval_join`'s 1-hour attribution bound the
    * as-of way (`adv_asof_join_window`, `plans.AsOfJoinExec`), and this
    * is the SAME question on live streams — per purchase, THE latest
    * same-user view at-or-before it within the hour, not all of them.
    *
    * Spark has no native stream-stream as-of, so the operator is
    * composed from two chained STATEFUL operators (the multi-stateful
    * pipeline Spark supports in append mode since 3.5):
    *
    *   1. the stream-stream interval join (identical bound to
    *      [[viewPurchaseAttribution]]) produces the bounded candidate
    *      set — each side's state holds one hour + lateness per key,
    *      exactly the interval join's eviction contract;
    *   2. a TIME-WINDOWED per-purchase argmax (`max(struct(v_ts,
    *      view_id))` under `window(p_ts, 1 hour)`) reduces candidates
    *      to the as-of winner — last-in-order tie rule on (v_ts,
    *      view_id), the batch exec's tie discipline. A purchase lives
    *      in exactly one tumbling window, so the argmax state is
    *      per-purchase and the row emits once the watermark passes its
    *      window end (append mode; the join-side flush sentinels
    *      advance the final watermark past every real window).
    *
    * 100 TB shape: both stateful stores are watermark-bounded (join:
    * horizon per side; argmax: open windows only), candidates never
    * leave the shuffle as more than (purchase, winner-so-far) state,
    * and the output is one row per attributed purchase. */
  def asofAttribution(views: DataFrame, purchases: DataFrame,
      lateness: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", lateness)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", lateness)
    v.join(p, expr(
        """v_user = p_user AND
           p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR"""))
      .groupBy(window(col("p_ts"), "1 hour"), col("purchase_id"),
        col("p_user"))
      .agg(max(struct(col("v_ts"), col("view_id"))).as("best"))
      .select(col("purchase_id"), col("best.view_id").as("view_id"),
        col("p_user").as("user_id"))
  }

  /** Idempotent micro-batch sink via foreachBatch: each batch lands in
    * its own `_batch_id=` partition with dynamic partition overwrite, so
    * REPLAYING a batch (failure between sink write and checkpoint
    * commit — the classic at-least-once window) overwrites its own
    * partition instead of duplicating rows. This is the reference's
    * idempotent task commit (P4, `tasktracker.py:143-156`: skip if block
    * already DONE) rebuilt on deterministic batch ids + partition
    * overwrite. */
  def idempotentParquetSink(stream: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.sparkSession.conf
          .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch.withColumn("_batch_id", lit(batchId))
          .write.mode("overwrite").partitionBy("_batch_id").parquet(path)
        ()
      }

  /** Output mode guidance per query shape (documented contract). */
  val outputModes: Map[String, OutputMode] = Map(
    "tumblingCounts" -> OutputMode.Append(),
    "slidingCounts" -> OutputMode.Append(),
    "sessionCounts" -> OutputMode.Append(),
    "dedupEvents" -> OutputMode.Append(),
    "runningUserTotals" -> OutputMode.Update(),
  )
}
