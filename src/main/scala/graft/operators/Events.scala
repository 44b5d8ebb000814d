package graft.operators

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.Exact.{dsum, sqlSum}

/** Event-time analytics over `events` — the batch half of the streaming
  * surface (graft.streaming holds the incremental versions; these share
  * semantics and give the DuckDB-checkable ground truth).
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-hour windows per event type: the batch equivalent of the
    * streaming windowed count. Partial agg map-side; output cardinality =
    * windows × types, tiny at any scale. */
  private val tumbling: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Per-user sessionization with a 30-minute inactivity gap — lag() to
    * mark session starts, running sum to number them, then session stats.
    * The batch mirror of streaming session_window. Two window passes over
    * the same (user_id, ts) partitioning → one shuffle, reused. */
  private val sessions: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  /** Late-vs-ontime accounting: events whose ts lags the running
    * high-water mark (max ts over all events that ARRIVED earlier, i.e.
    * smaller event_id) by >10 minutes — what a watermark would drop.
    *
    * The high-water mark is a PREFIX MAX over arrival order. The naive
    * form — `max(ts) OVER (ORDER BY event_id)`, no partition — moves
    * the whole stream to ONE task. Unlike NTILE or the greedy token
    * budget, a prefix max distributes EXACTLY, so the DECLARED path is
    * the same two-phase scan as `pl_pack_sequences`: range-partition by
    * event_id, one pass of per-split running maxes, then lift each
    * split by the max of every earlier split (a |splits|-row broadcast;
    * the only window left runs over those |splits| rows). Output is
    * identical to the window form for any range boundaries —
    * [[EventsSpec]] pins the equivalence row-for-row; the oracle is
    * unchanged. */
  private val lateEvents: Q = (s, d) => lateArrivalsScan(s, d)

  private[graft] def lateArrivalsScan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nSplits = s.sparkContext.defaultParallelism
    val base = Tables.events(s, d)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(String, Long, Long)]
      .repartitionByRange(nSplits, col("event_id"))
      .sortWithinPartitions("event_id")
    // one pass per split: running max BEFORE each row (MinValue = none
    // yet). localCheckpoint pins one sampled range-boundary assignment —
    // same reason as the pack-sequences scan: `local` feeds both the
    // lift table and the final probe.
    val local = base.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var run = Long.MinValue
      it.map { case (typ, id, us) =>
        val before = run
        if (us > run) run = us
        (typ, us, before, pid)
      }
    }.toDF("event_type", "us", "local_before", "split")
      .checkpointFresh()
    val lift = local.groupBy("split")
      .agg(max(col("us")).as("split_max"))
      .withColumn("lift", max(col("split_max")).over(
        Window.orderBy("split").rowsBetween(Window.unboundedPreceding, -1)))
      .select("split", "lift")
    local.join(broadcast(lift), Seq("split"))
      .withColumn("seen_max_us", greatest(
        when(col("local_before") =!= Long.MinValue, col("local_before")),
        col("lift")))
      .withColumn("late",
        when(col("seen_max_us").isNotNull &&
          col("seen_max_us") - col("us") > 600L * 1000000, 1).otherwise(0))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("late")).as("n_late"))
  }

  /** The one-task global-window form — correct but serial; kept as the
    * differential reference for [[lateArrivalsScan]]. */
  private[graft] def lateArrivalsWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("seen_max", max(col("ts")).over(
        Window.orderBy(col("event_id")).rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("late",
        when(col("seen_max").isNotNull &&
          unix_micros(col("seen_max")) - unix_micros(col("ts")) > 600L * 1000000, 1).otherwise(0))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("late")).as("n_late"))

  /** Sliding windows (1h length, 15m slide): each event lands in 4
    * windows. Spark expands this inside the window() operator; the
    * oracle mirrors it with an explicit 4-way unnest. */
  private val sliding: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"))

  /** Ordered conversion funnel (view → click → purchase): a user reaches
    * stage k only through the earliest event of each prior stage — the
    * sequential-pattern query behind product funnels, distinct from
    * windows/sessions (order constraints across event types, not time
    * buckets). All stage aggregations key on user_id; the AQE-final plan
    * holds at ≤6 exchanges — one per stage branch + the distinct-user
    * spine + one SMJ alignment + the 4-row final stage count — with the
    * view-stage aggregate computed ONCE and wired to both later stages
    * via ReusedExchange, and the post-agg stage tables broadcast into
    * the spine joins (they are ≪ events at any scale). [[EventsSpec]]
    * pins the exchange budget and the reuse. */
  private val funnel: Q = (s, d) => {
    val e = Tables.events(s, d).select("user_id", "event_type", "ts")
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
    val c = e.where(col("event_type") === "click").join(v, "user_id")
      .where(col("ts") >= col("v_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
    val p = e.where(col("event_type") === "purchase").join(c, "user_id")
      .where(col("ts") >= col("c_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
    e.select("user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .selectExpr("""CASE WHEN p_ts IS NOT NULL THEN 3
                          WHEN c_ts IS NOT NULL THEN 2
                          WHEN v_ts IS NOT NULL THEN 1
                          ELSE 0 END AS stage""")
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
  }

  /** Daily cohort retention: users grouped by first-active day, counted
    * on each later day they return — the (cohort × day-offset) retention
    * matrix behind every product-analytics dashboard. Offsets are day
    * differences of DATEs (UTC session), so the matrix is
    * calendar-stable however timestamps cluster inside a day.
    *
    * 100 TB shape: one (user_id, day) distinct (shuffle carries 12-byte
    * rows, map-side partial), the per-user min reuses that partitioning
    * prefix, the cohort join is user_id-keyed, and the final matrix is
    * |days|² rows — tiny at any scale. (user_id, day) pairs are unique
    * after the distinct and a user has one cohort, so the final count
    * needs no count-distinct state. */
  private val retention: Q = (s, d) => {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohort = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    days.join(cohort, "user_id")
      .groupBy(
        // ISO string, not DateType: engines agree on the VALUE but
        // driver-side dataframe readers widen DATE differently
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select("cohort_day", "day_offset", "n_users")
  }

  /** Gap-filled hourly counts: the dense (event_type × hour) grid over
    * the stream's active range, with silent hours materialized as
    * explicit zero rows — the resampling step dashboards and anomaly
    * detectors need (a missing bucket and a zero bucket are different
    * facts). Grid = per-type hour `sequence` between the global min/max
    * hour; counts left-join onto it.
    *
    * 100 TB shape: the raw stream collapses map-side to |hours × types|
    * rows before anything else happens; the grid is generated from a
    * 1-row bounds aggregate crossed with the distinct types (both
    * broadcast), so the only data-sized work is the initial partial
    * agg — the join and explode run over post-agg cardinalities. */
  /** The dense grid with per-bucket count AND exact value sum (null for
    * silent hours — [[gapfill]] zero-fills the count, [[ffill]] imputes
    * the sum). Shared by the resampling family. */
  private def hourGrid(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(date_trunc("hour", col("ts")).as("bucket"), col("event_type"),
        col("value"))
    val counts = ev.groupBy("bucket", "event_type")
      .agg(count(lit(1)).as("n_raw"), dsum(col("value")).as("sum_raw"))
    val bounds = ev.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val grid = bounds.crossJoin(ev.select("event_type").distinct())
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("bucket"))
    grid.join(counts, Seq("bucket", "event_type"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("n_raw"), lit(0L)).as("n"), col("sum_raw"))
  }

  private val gapfill: Q = (s, d) =>
    hourGrid(s, d).select("event_type", "bucket", "n")

  /** Forward-fill imputation over the dense grid: silent hours carry
    * the most recent OBSERVED hour's value-sum forward (hours before
    * the type's first observation fill with 0) — the standard
    * time-series resampling step after gap-filling. The carried value
    * is the exact decimal-cast sum, so imputed rows are bit-identical
    * cross-engine.
    *
    * "Silent" is `n = 0` — the grid's own signal — NOT `sum_raw IS
    * NULL`: an observed hour whose values were all NULL keeps its real
    * NULL sum and is_imputed = false (the two coincide only on corpora
    * where `value` is never null). The struct wrapper makes
    * `ignoreNulls` skip SILENT hours (null struct) while still carrying
    * an observed hour's genuinely-null sum (non-null struct, null
    * field).
    *
    * 100 TB shape: the window runs over the POST-AGG grid (|hours ×
    * types| rows), partitioned by type — never over raw events; the
    * data-sized work remains the one partial agg inside [[hourGrid]]. */
  private val ffill: Q = (s, d) =>
    hourGrid(s, d)
      .withColumn("carried",
        last(when(col("n") > 0, struct(col("sum_raw").as("v"))),
            ignoreNulls = true).over(
          Window.partitionBy("event_type").orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_type"), col("bucket"), col("n"),
        when(col("n") > 0, col("sum_raw"))
          .when(col("carried").isNull, lit(0.0))
          .otherwise(col("carried.v")).as("filled_sum"),
        (col("n") === 0).as("is_imputed"))

  /** Hourly anomaly flags in EXACT integer arithmetic: a bucket is
    * anomalous when its count deviates from its type's mean by more
    * than 2 population standard deviations — tested as
    * `(n·C − S)² > 4·(C·SS − S²)` over integer counts (C buckets,
    * S = Σn, SS = Σn²), which clears denominators so neither engine
    * ever divides or touches a float. Stats are over the DENSE grid
    * (silent hours are real zeros, not missing data).
    *
    * The squared test runs in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB,
    * whose decimal bind rules cap product width at 38 so int128 is its
    * wide-exact idiom): |n·C − S| ≤ n_max·C, so exactness needs only
    * n_max·C < 10¹⁹ — versus 3·10⁹ in raw int64, where Spark's
    * non-ANSI wrap-around silently flips flags while DuckDB raises.
    * Past 10¹⁹ (quadrillions of events per bucket at billions of
    * buckets) DuckDB errors, but non-ANSI Spark NULLs the overflowed
    * DECIMAL sum — which would null the predicate and silently drop
    * every bucket of that event_type (false negatives, the worst
    * failure mode for an anomaly detector). The explicit guard below
    * turns that into a loud `raise_error`, so both engines hard-stop
    * past the exactness envelope instead of one of them going quiet. */
  private val anomaly: Q = (s, d) => {
    val g = hourGrid(s, d).select("event_type", "bucket", "n")
    // ss must be WIDE at the aggregation itself: a raw long n*n wraps
    // silently (non-ANSI) before any downstream cast could save it
    val stats = g.groupBy("event_type").agg(
      count(lit(1)).as("c"), sum(col("n")).as("s"),
      sum(expr("CAST(n AS DECIMAL(19,0)) * n")).as("ss"))
    // guard the WHOLE test, not just ss: any of the DECIMAL(38,0) terms
    // ((n·C−S)², C·SS, S²) can overflow to NULL in non-ANSI Spark, and
    // a NULL predicate silently drops the row. The dense grid never
    // yields NULL inputs, so lhs/rhs IS NULL ⟺ something overflowed —
    // raise instead of quietly filtering the (by construction most
    // anomalous) bucket
    g.join(broadcast(stats), "event_type")
      .withColumn("lhs", expr(
        """(CAST(n AS DECIMAL(19,0)) * c - s) * (CAST(n AS DECIMAL(19,0)) * c - s)"""))
      .withColumn("rhs", expr(
        """4 * (CAST(c AS DECIMAL(19,0)) * ss - CAST(s AS DECIMAL(19,0)) * s)"""))
      .where(expr(
        """CASE WHEN lhs IS NULL OR rhs IS NULL
             THEN CAST(raise_error(
               'ev_anomaly: z-test term overflowed DECIMAL(38,0); widen the test') AS BOOLEAN)
           ELSE lhs > rhs END"""))
      .select(col("event_type"), col("bucket"), col("n"),
        col("c").as("n_buckets"), col("s").as("total_n"))
  }

  /** Per-user ordered event prefix — the classic MapReduce "secondary
    * sort" (values ordered WITHIN each key during the shuffle; the
    * reference's model can only sort inside the reducer,
    * `tasktracker.py` reduce loop): each user's first three event types
    * in (ts, event_id) order, plus their total event count. In Spark
    * the composite-key trick collapses to one window: both window
    * passes and the final aggregate reuse the same user_id
    * partitioning → ONE shuffle end-to-end, and the rank filter bounds
    * per-user state to 3 rows before the collect. */
  private val userPath: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rk", row_number().over(byUser))
      .withColumn("n_events", count(lit(1)).over(Window.partitionBy("user_id")))
      .where(col("rk") <= 3)
      .groupBy("user_id", "n_events")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(rk, event_type))), x -> x.event_type), ',')")
        .as("first3"))
      .select(col("user_id"), col("first3"), col("n_events"))
  }

  /** EWMA smoothing factor in per-mille (α = 0.3): integer arithmetic
    * end to end, mirrored in the oracle. */
  private val EwmaAlphaMille = 300L

  /** Per-user exponentially weighted moving average of `value` — the
    * classic time-series smoother, and the operator shape no built-in
    * window expresses: a NONLINEAR per-key ordered fold (each state
    * depends multiplicatively on the previous), where running
    * sum/min/avg are linear and stay in `Window` frames. The batch
    * form of per-key online state (the streaming twin is
    * `mapGroupsWithState` carrying `ewma` as its state value).
    *
    * Determinism discipline: values enter as floor-of-micros int64
    * (one IEEE multiply + floor per row, bit-identical cross-engine),
    * the fold is e₀ = v₀, eᵢ = (α·vᵢ + (1000−α)·eᵢ₋₁) DIV 1000 in
    * pure int64 (both engines truncate integer division toward zero),
    * and the fold ORDER is pinned by (ts to the full microsecond,
    * event_id) — so the declared output (final state + count per
    * user) is hash-exact.
    *
    * 100 TB shape (round 10, replacing a `groupByKey.mapGroups` that
    * buffered each user's whole history in one task's heap): ONE
    * shuffle keyed by user, ordering supplied by Spark's SPILLABLE
    * sort (`repartition(user_id)` + `sortWithinPartitions(user_id,
    * ts, event_id)` — the classic secondary sort), then a
    * `mapPartitions` streaming fold over the now-clustered rows with
    * O(1) state per group: current uid, running count, running ewma.
    * A hot user with 10⁹ events costs sort spill, never task heap.
    * The timestamp sort key is full-microsecond TimestampType, i.e.
    * exactly the (millis, nanos) pair the old in-heap sort used — the
    * fold order and therefore the hash are unchanged. At unbounded
    * per-key history the streaming twin (`st_ewma`) with checkpointed
    * state is the shape, which is why it exists. */
  private val ewma: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("CAST(floor(value * 1000000D) AS BIGINT)").as("vm"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, Long, java.sql.Timestamp, Long)]
      .mapPartitions { it =>
        val rows = it.buffered
        new Iterator[(Long, Long, Long)] {
          def hasNext: Boolean = rows.hasNext
          def next(): (Long, Long, Long) = {
            val (uid, _, _, v0) = rows.next()
            var e = v0
            var n = 1L
            while (rows.hasNext && rows.head._1 == uid) {
              val v = rows.next()._4
              e = (EwmaAlphaMille * v + (1000L - EwmaAlphaMille) * e) / 1000L
              n += 1
            }
            (uid, n, e)
          }
        }
      }
      .toDF("user_id", "n_events", "ewma_micro")
  }

  val queries: Map[String, Q] = Map(
    "ev_tumbling_1h" -> tumbling,
    "ev_sliding_1h_15m" -> sliding,
    "ev_sessions" -> sessions,
    "ev_late_arrivals" -> lateEvents,
    "ev_funnel" -> funnel,
    "ev_retention" -> retention,
    "ev_gapfill" -> gapfill,
    "ev_ffill" -> ffill,
    "ev_anomaly" -> anomaly,
    "ev_user_path" -> userPath,
    "ev_ewma" -> ewma,
  )

  /** Shared dense-grid CTE prefix for the resampling family's oracles. */
  private val duckGrid =
    s"""WITH ev AS (
          SELECT date_trunc('hour', ts) AS bucket, event_type, value FROM events),
        counts AS (
          SELECT bucket, event_type, count(*) AS n_raw,
            ${sqlSum("value")} AS sum_raw
          FROM ev GROUP BY 1, 2),
        bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM ev),
        grid AS (
          SELECT t.event_type, g.bucket
          FROM (SELECT DISTINCT event_type FROM ev) t
          CROSS JOIN (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
            FROM bounds) g),
        g AS (
          SELECT grid.event_type, grid.bucket,
            COALESCE(n_raw, 0) AS n, sum_raw
          FROM grid LEFT JOIN counts USING (bucket, event_type))"""

  val oracle: Map[String, String] = Map(
    // the same int64 fold: list_reduce seeds from the first element
    // (= e0 = v0) and DuckDB's // truncates toward zero like DIV
    "ev_ewma" ->
      s"""WITH v AS (
            SELECT user_id, event_id, ts,
              CAST(floor(value * 1000000) AS BIGINT) AS vm
            FROM events),
          o AS (
            SELECT user_id,
              list(vm ORDER BY ts, event_id) AS xs
            FROM v GROUP BY user_id)
          SELECT user_id, CAST(len(xs) AS BIGINT) AS n_events,
            list_reduce(xs, (acc, x) ->
              ($EwmaAlphaMille * x + ${1000L - EwmaAlphaMille} * acc) // 1000)
              AS ewma_micro
          FROM o""",
    "ev_user_path" ->
      """WITH r AS (
           SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk,
             count(*) OVER (PARTITION BY user_id) AS n_events
           FROM events)
         SELECT user_id, string_agg(event_type, ',' ORDER BY rk) AS first3,
           n_events
         FROM r WHERE rk <= 3 GROUP BY user_id, n_events""",
    // the struct wrapper mirrors the Spark side: IGNORE NULLS skips
    // SILENT hours (null struct), not an observed hour's null sum
    "ev_ffill" ->
      s"""$duckGrid,
         w AS (
           SELECT event_type, bucket, n, sum_raw,
             last_value(CASE WHEN n > 0 THEN {'v': sum_raw} END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS carried
           FROM g)
         SELECT event_type, bucket, n,
           CASE WHEN n > 0 THEN sum_raw
                WHEN carried IS NULL THEN 0.0
                ELSE carried.v END AS filled_sum,
           n = 0 AS is_imputed
         FROM w""",
    "ev_anomaly" ->
      s"""$duckGrid,
         stats AS (
           SELECT event_type, count(*) AS c,
             CAST(sum(n) AS BIGINT) AS s,
             sum(CAST(n AS HUGEINT) * n) AS ss
           FROM g GROUP BY event_type)
         SELECT g.event_type, g.bucket, g.n,
           c AS n_buckets, s AS total_n
         FROM g JOIN stats USING (event_type)
         WHERE (CAST(n AS HUGEINT) * c - s) * (CAST(n AS HUGEINT) * c - s)
           > 4 * (CAST(c AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)""",
    "ev_gapfill" ->
      """WITH ev AS (
           SELECT date_trunc('hour', ts) AS bucket, event_type FROM events),
         counts AS (
           SELECT bucket, event_type, count(*) AS n_raw FROM ev GROUP BY 1, 2),
         bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM ev),
         grid AS (
           SELECT t.event_type, g.bucket
           FROM (SELECT DISTINCT event_type FROM ev) t
           CROSS JOIN (
             SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
             FROM bounds) g)
         SELECT event_type, bucket, COALESCE(n_raw, 0) AS n
         FROM grid LEFT JOIN counts USING (bucket, event_type)""",
    // DATE truncation is tz-free in DuckDB; the Spark session pins UTC so
    // to_date lands on the same calendar day
    "ev_retention" ->
      """WITH days AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         cohort AS (
           SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
         SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
           count(*) AS n_users
         FROM days JOIN cohort USING (user_id)
         GROUP BY 1, 2""",
    "ev_funnel" ->
      """WITH v AS (
           SELECT user_id, MIN(ts) AS v_ts FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         c AS (
           SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e
           JOIN v ON v.user_id = e.user_id AND e.ts >= v.v_ts
           WHERE e.event_type = 'click' GROUP BY e.user_id),
         p AS (
           SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e
           JOIN c ON c.user_id = e.user_id AND e.ts >= c.c_ts
           WHERE e.event_type = 'purchase' GROUP BY e.user_id),
         u AS (SELECT DISTINCT user_id FROM events)
         SELECT CASE WHEN p.p_ts IS NOT NULL THEN 3
                     WHEN c.c_ts IS NOT NULL THEN 2
                     WHEN v.v_ts IS NOT NULL THEN 1
                     ELSE 0 END AS stage,
                COUNT(*) AS n_users
         FROM u LEFT JOIN v USING (user_id)
                LEFT JOIN c USING (user_id)
                LEFT JOIN p USING (user_id)
         GROUP BY 1""",
    "ev_tumbling_1h" ->
      s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
          COUNT(*) AS n, ${sqlSum("value")} AS sum_value
          FROM events GROUP BY 1, 2""",
    "ev_sliding_1h_15m" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts)
               - (k * to_minutes(15)) AS bucket,
           event_type, COUNT(*) AS n
         FROM events, unnest([0, 1, 2, 3]) AS t(k)
         GROUP BY 1, 2""",
    "ev_sessions" ->
      """WITH marked AS (
           SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         numbered AS (
           SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM marked)
         SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
         FROM numbered GROUP BY user_id, session_id""",
    "ev_late_arrivals" ->
      """WITH hw AS (
           SELECT event_type, ts,
             MAX(ts) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen_max
           FROM events)
         SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CASE WHEN seen_max IS NOT NULL
                     AND epoch_us(seen_max) - epoch_us(ts) > 600 * 1000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_late
         FROM hw GROUP BY event_type""",
  )
}
