package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp

/** Bounded-state funnel (st_funnel_ttl): the GAP rule's semantics are
  * a function of the data, so they are unit-testable in batch mode
  * (flatMapGroupsWithState on a batch Dataset runs the same function
  * with empty state); eviction engagement and state-boundedness are
  * REQUIRED by the declared query itself, so a silently-unbounded run
  * cannot even return. */
class FunnelTtlSpec extends SparkSpec {

  private def ev(id: Long, uid: Long, tpe: String, offsetMin: Long): Event =
    Event(id, new Timestamp(1700000000000L + offsetMin * 60000L), uid, tpe,
      1.0, "{}")

  test("gap rule: inactivity > TTL restarts the funnel; gaps matter, span does not") {
    import spark.implicits._
    val events = Seq(
      // u1: view, click 10 min later → stage 2
      ev(1, 1, "view", 0), ev(2, 1, "click", 10),
      // u2: view, then purchase after a 3 h GAP → funnel restarted,
      // lone purchase cannot apply → stage 0
      ev(3, 2, "view", 0), ev(4, 2, "purchase", 180),
      // u3: gaps of 60 and 105 min — every gap under the 2 h TTL even
      // though the SPAN (165 min) exceeds it → full funnel, stage 3
      ev(5, 3, "view", 0), ev(6, 3, "click", 60), ev(7, 3, "purchase", 165),
      // u4: second view after a 3 h gap restarts, then click → stage 2
      ev(8, 4, "view", 0), ev(9, 4, "view", 180), ev(10, 4, "click", 185)
    ).toDS()
    val got = EventStreams.funnelStagesTtl(events)
      .collect().map(s => s.user_id -> s.stage).toMap
    assert(got === Map(1L -> 2, 2L -> 0, 3L -> 3, 4L -> 2))
  }

  test("ewma gap rule: inactivity > TTL re-seeds the fold") {
    import spark.implicits._
    def evv(id: Long, uid: Long, v: Double, offsetMin: Long): Event =
      Event(id, new Timestamp(1700000000000L + offsetMin * 60000L), uid,
        "view", v, "{}")
    val events = Seq(
      // u1: both events inside the TTL → 2-event fold
      evv(1, 1, 1.0, 0), evv(2, 1, 2.0, 10),
      // u2: 3 h gap → fold restarts, only the second event counts
      evv(3, 2, 1.0, 0), evv(4, 2, 2.0, 180)
    ).toDS()
    val got = EventStreams.ewmaUserStateTtl(events)
      .collect().map(s => s.user_id -> (s.n_events, s.ewma_micro)).toMap
    assert(got(1L) === ((2L, (300L * 2000000 + 700L * 1000000) / 1000)))
    assert(got(2L) === ((1L, 2000000L)))
  }

  test("st_ewma_ttl: per-user n_events never exceeds the unbounded fold's") {
    val full = StreamParity.queries("st_ewma")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ttl = StreamParity.queries("st_ewma_ttl")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ttl.keySet === full.keySet, "every user accounted for")
    ttl.foreach { case (u, n) =>
      assert(n <= full(u), s"user $u: last-segment count $n > full ${full(u)}")
    }
    assert(ttl.exists { case (u, n) => n < full(u) },
      "some user must actually have restarted (the corpus spans > TTL)")
  }

  test("declared query: per-stage counts are dominated by the unbounded funnel, deterministically") {
    // per-user monotonicity (a reset can only lower a stage) implies
    // cumulative dominance of the histograms: for every k,
    // |ttl stage ≥ k| ≤ |full stage ≥ k|
    def hist(name: String): Map[Long, Long] =
      StreamParity.queries(name)(spark, sfDir)
        .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
        .map { case (k, v) => k -> v }
    val ttl = hist("st_funnel_ttl")
    val full = hist("st_funnel")
    def cum(h: Map[Long, Long], k: Long): Long =
      h.filter(_._1 >= k).values.sum
    (1L to 3L).foreach { k =>
      assert(cum(ttl, k) <= cum(full, k),
        s"stage>=$k: ttl ${cum(ttl, k)} must not exceed full ${cum(full, k)}")
    }
    assert(ttl.values.sum === full.values.sum,
      "both funnels must account for every user")
    // the run is deterministic under re-execution (fresh state store)
    assert(hist("st_funnel_ttl") === ttl)
  }
}
