package graft.operators

import graft.SparkSpec

/** Batch event-analytics invariants — the scale-path equivalences the
  * DuckDB oracle can't see (it checks values, not plans). */
class EventsSpec extends SparkSpec {

  test("ewma: fold matches the hand-computed sequence and a local replay of the corpus") {
    // hand trace, alpha = 0.3 in per-mille integer arithmetic:
    //   v = [1_000_000, 2_000_000, -500_000]
    //   e0 = 1_000_000
    //   e1 = (300*2_000_000 + 700*1_000_000) / 1000 = 1_300_000
    //   e2 = (300*(-500_000) + 700*1_300_000) / 1000 = 760_000
    val vs = Seq(1000000L, 2000000L, -500000L)
    val folded = vs.tail.foldLeft(vs.head)((a, x) => (300L * x + 700L * a) / 1000L)
    assert(folded === 760000L)
    // full-corpus differential: the mapGroups fold equals a driver-side
    // replay over the same (ts, event_id) order
    val got = Events.queries("ev_ewma")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rows = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "ts",
        "CAST(floor(value * 1000000D) AS BIGINT) AS vm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3)))
    val expect = rows.groupBy(_._1).map { case (u, es) =>
      val vs = es.sortBy(e => (e._3.getTime, e._3.getNanos, e._2)).map(_._4)
      u -> ((vs.length.toLong,
        vs.tail.foldLeft(vs.head)((a, x) => (300L * x + 700L * a) / 1000L)))
    }
    assert(got === expect)
  }

  test("ewma: secondary-sort plan — spillable sort + streaming fold, no per-group buffering") {
    val df = Events.queries("ev_ewma")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the r9 shape (`groupByKey.mapGroups` + in-heap it.toSeq.sortBy)
    // materialized each user's full history in one task — a hot user
    // OOMs at scale. The r10 shape must order rows via Spark's
    // spillable SortExec and fold them in a MapPartitions with O(1)
    // state per group; MapGroups (and its AppendColumns key-extractor)
    // must be gone.
    assert(!p.contains("MapGroups"), s"per-group materialization is back:\n$p")
    assert(!p.contains("AppendColumns"), p)
    assert(p.contains("MapPartitions"), p)
    // ordering comes from the engine sort, keyed user-first so groups
    // arrive clustered, then (ts, event_id) pins the fold order
    assert(p.contains("Sort [user_id"), s"expected secondary sort on user_id, ts, event_id:\n$p")
    assert(p.contains("ts"), p)
    // one shuffle total: the user_id repartition that co-locates groups
    val shuffles = "Exchange".r.findAllIn(p).length
    assert(shuffles === 1, s"ev_ewma should shuffle exactly once ($shuffles):\n$p")
  }

  test("late_arrivals: two-phase prefix-max scan equals the global-window form") {
    val a = Events.lateArrivalsScan(spark, sfDir)
    val b = Events.lateArrivalsWindow(spark, sfDir)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("late_arrivals: no window over the event stream (only the |splits|-row lift)") {
    val df = Events.queries("ev_late_arrivals")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the range partitioning runs inside the eager checkpoint job (its
    // lineage is truncated from this plan), so assert the shape that
    // remains visible: the one Window left orders the tiny split-lift
    // table, and NOTHING windows/sorts by event arrival order anymore
    assert(!p.contains("event_id"), p)
    assert(p.contains("windowspecdefinition(split"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("funnel: exchange budget holds and the view aggregate is computed once") {
    val df = Events.queries("ev_funnel")(spark, sfDir)
    df.collect()
    // count exchanges in the AQE-FINAL plan only (toString appends the
    // pre-adaptive "Initial Plan" section, which double-counts)
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    // the budget: one user_id shuffle per stage aggregation (view/click/
    // purchase), one for the distinct-user spine, at most one SMJ
    // re-alignment, one tiny final stage-count — 6. A regression to
    // per-join re-exchanges (no partitioning reuse) lands well above.
    assert(shuffles <= 6, s"ev_funnel shuffle-exchange budget blown ($shuffles):\n$p")
    // the view-stage min(ts) aggregate must be COMPUTED once and reused
    // by the later stages, not re-derived per consumer
    assert(p.contains("ReusedExchange"), s"expected view-agg exchange reuse:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("retention: offsets non-negative, day-0 equals cohort size and bounds later days") {
    import org.apache.spark.sql.functions._
    val df = Events.queries("ev_retention")(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.where(col("day_offset") < 0).count() === 0)
    // every cohort reports its own formation day (offset 0 exists)...
    val day0 = df.where(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    assert(day0.count() === df.select("cohort_day").distinct().count())
    // ...and no later day exceeds the cohort's size
    val over = df.join(day0, "cohort_day")
      .where(col("n_users") > col("cohort_size"))
    assert(over.count() === 0)
    // cohort sizes partition the user base: sum = distinct users overall
    val total = day0.agg(sum("cohort_size")).head.getLong(0)
    val users = graft.sources.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(total === users)
    df.unpersist()
  }

  test("ntile approx declared query: earns its tolerance booleans") {
    val row = Relational.queries("q29_ntile_approx")(spark, sfDir).head()
    assert(row.getAs[Boolean]("sizes_within_tol"))
    assert(row.getAs[Boolean]("spans_ordered"))
    assert(row.getAs[Long]("n_buckets") === 10L)
    assert(row.getAs[Long]("n_customers") ===
      graft.sources.Tables.customer(spark, sfDir).count())
  }

  test("gapfill: dense type×hour grid, mass-preserving, zeros explicit") {
    import org.apache.spark.sql.functions._
    val g = Events.queries("ev_gapfill")(spark, sfDir).cache()
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(date_trunc("hour", col("ts")).as("bucket"), col("event_type")).cache()
    val nTypes = ev.select("event_type").distinct().count()
    val hours = ev.agg(
      (floor(unix_micros(max(col("bucket"))) / 3600000000L) -
       floor(unix_micros(min(col("bucket"))) / 3600000000L) + 1).as("h"))
      .head.getLong(0)
    // the grid is complete and exactly dense: |types| × |hours| rows, no dupes
    assert(g.count() === nTypes * hours)
    assert(g.select("event_type", "bucket").distinct().count() === nTypes * hours)
    // gap-filling invents no events and drops none
    assert(g.agg(sum("n")).head.getLong(0) === ev.count())
    // silent hours surface as explicit zero rows (synthetic stream has gaps
    // per type at smoke scale; if not, the grid equals the raw cardinality)
    assert(g.where(col("n") === 0).count() ===
      nTypes * hours - ev.select("bucket", "event_type").distinct().count())
    ev.unpersist(); g.unpersist()
  }

  test("ffill: imputation exactly on silent hours, carried value matches predecessor") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val f = Events.queries("ev_ffill")(spark, sfDir).cache()
    // imputed ⟺ the hour was silent
    assert(f.where(col("is_imputed") =!= (col("n") === 0)).count() === 0)
    // an imputed row carries its predecessor's filled value verbatim
    // (or 0.0 with no predecessor); observed rows may change it
    val w = Window.partitionBy("event_type").orderBy("bucket")
    val bad = f.withColumn("prev", lag(col("filled_sum"), 1).over(w))
      .where(col("is_imputed") &&
        col("filled_sum") =!= coalesce(col("prev"), lit(0.0)))
    assert(bad.count() === 0)
    f.unpersist()
  }

  test("user_path: one shuffle end-to-end and a 3-type prefix per user") {
    import org.apache.spark.sql.functions._
    val df = Events.queries("ev_user_path")(spark, sfDir)
    df.collect()
    // both windows and the aggregate reuse the user_id partitioning —
    // count exchanges in the AQE-final plan (same method as the funnel spec)
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected 1 shuffle, got $exchanges:\n$p")
    val users = graft.sources.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(df.count() === users)
    // prefix length = min(3, n_events), comma-separated
    assert(df.where(
      size(split(col("first3"), ",")) =!= least(lit(3), col("n_events"))).count() === 0)
  }

  test("anomaly: flag set equals the integer z-test recomputed from the grid") {
    import org.apache.spark.sql.functions._
    val grid = Events.queries("ev_gapfill")(spark, sfDir).cache()
    val stats = grid.groupBy("event_type").agg(
      count(lit(1)).as("c"), sum("n").as("s"),
      sum(col("n") * col("n")).as("ss"))
    val expected = grid.join(stats, "event_type")
      .where(expr("(n * c - s) * (n * c - s) > 4 * (c * ss - s * s)"))
      .select("event_type", "bucket", "n")
    val got = Events.queries("ev_anomaly")(spark, sfDir)
      .select("event_type", "bucket", "n")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
    // 2σ on a dense grid flags a sparse minority of buckets
    assert(got.count() > 0 && got.count() < grid.count() / 4)
    grid.unpersist()
  }
}
