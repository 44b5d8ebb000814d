package graft.operators

import graft.SparkSpec

/** Batch event-analytics invariants — the scale-path equivalences the
  * DuckDB oracle can't see (it checks values, not plans). */
class EventsSpec extends SparkSpec {

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

  test("ntile approx declared query: earns its tolerance booleans") {
    val row = Relational.queries("q29_ntile_approx")(spark, sfDir).head()
    assert(row.getAs[Boolean]("sizes_within_tol"))
    assert(row.getAs[Boolean]("spans_ordered"))
    assert(row.getAs[Long]("n_buckets") === 10L)
    assert(row.getAs[Long]("n_customers") ===
      graft.sources.Tables.customer(spark, sfDir).count())
  }
}
