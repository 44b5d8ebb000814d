package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native whole-operator as-of join ([[AsOfJoinExec]]): semantics
  * pinned against the window composition and hand-traced fixtures,
  * plan shape pinned against the sort-merge contract. */
class AsOfJoinPlanSpec extends SparkSpec {

  private def nativeAsOf = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    AsOf.join(purchases, views, "user_id", "v_user", "ts", "view_ts",
      Seq("view_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("view_id"), col("view_ts"))
  }

  test("native as-of equals the window composition row-for-row on the corpus") {
    val native = nativeAsOf
    val composed = graft.operators.Advanced.queries("adv_asof_join")(spark, sfDir)
    assert(native.count() > 0)
    assert(native.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(native).count() === 0)
  }

  test("plan shape: AsOfJoinExec with the sort-merge contract — 2 exchanges, 2 sorts, no window, no union") {
    val df = nativeAsOf
    df.collect() // materialize so AQE finalizes
    // AQE's toString prints Final AND Initial plans — assert on the final
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges\n$plan")
    val sorts = raw"\bSort \[".r.findAllIn(plan).size
    assert(sorts == 2, s"expected 2 sorts, got $sorts\n$plan")
    assert(!plan.contains("Window"), "native path must not plan a window")
    assert(!plan.contains("Union"), "native path must not plan a union")
  }

  test("fixtures: latest-at-or-before match, tie goes to max tiebreak, null keys/times never match, empty build side") {
    import spark.implicits._
    def probe(rows: (java.lang.Long, java.lang.Long, Long)*) =
      rows.toDF("k", "t", "pid")
        .select(col("k"), timestamp_micros(col("t")).as("t"), col("pid"))
    def build(rows: (java.lang.Long, java.lang.Long, Long)*) =
      rows.toDF("bk", "bt", "vid")
        .select(col("bk"), timestamp_micros(col("bt")).as("bt"), col("vid"))
    def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      AsOf.join(l, r, "k", "bk", "t", "bt", Seq("vid"))
        .select("pid", "vid").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toMap
    // key 1: views at t=10 (vid 100), t=20 (vid 200, 201 — tie), t=40
    val b = build((1L, 10L, 100L), (1L, 20L, 201L), (1L, 20L, 200L),
      (1L, 40L, 400L), (2L, 5L, 500L),
      (null, 1L, 900L), (3L, null, 901L)) // null key/time: never match
    val l = probe((1L, 20L, 1L), (1L, 39L, 2L), (1L, 45L, 3L),
      (1L, 5L, 4L), (2L, 5L, 5L), (3L, 50L, 6L),
      (null, 50L, 7L), (9L, null, 8L))
    val got = run(l, b)
    assert(got(1L) == 201L, "equal-ts tie must take the max tiebreak id")
    assert(got(2L) == 201L, "t=39 still sees the t=20 winner")
    assert(got(3L) == 400L)
    assert(got(4L) == -1L, "no view at or before t=5")
    assert(got(5L) == 500L, "equal ts qualifies (>= bound)")
    assert(got(6L) == -1L, "a null-time build row never matches")
    assert(got(7L) == -1L, "null probe key matches nothing")
    assert(got(8L) == -1L, "null probe time matches nothing")
    // empty build side: every probe row emits with a NULL match
    val empty = run(l, b.where(col("vid") < 0))
    assert(empty.values.forall(_ == -1L) && empty.size == l.count())
  }

  test("forward fixtures: earliest-at-or-after match, tie goes to MIN tiebreak, nulls never match") {
    import spark.implicits._
    def probe(rows: (java.lang.Long, java.lang.Long, Long)*) =
      rows.toDF("k", "t", "pid")
        .select(col("k"), timestamp_micros(col("t")).as("t"), col("pid"))
    def build(rows: (java.lang.Long, java.lang.Long, Long)*) =
      rows.toDF("bk", "bt", "vid")
        .select(col("bk"), timestamp_micros(col("bt")).as("bt"), col("vid"))
    val b = build((1L, 10L, 100L), (1L, 20L, 201L), (1L, 20L, 200L),
      (1L, 40L, 400L), (2L, 5L, 500L),
      (null, 1L, 900L), (3L, null, 901L))
    val l = probe((1L, 20L, 1L), (1L, 39L, 2L), (1L, 45L, 3L),
      (1L, 5L, 4L), (2L, 5L, 5L), (3L, 50L, 6L),
      (null, 50L, 7L), (9L, null, 8L))
    val got = AsOf.joinForward(l, b, "k", "bk", "t", "bt", Seq("vid"))
      .select("pid", "vid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    assert(got(1L) == 200L,
      "equal-ts tie must take the MIN tiebreak id (contrast: backward takes 201)")
    assert(got(2L) == 400L, "t=39 → next is t=40")
    assert(got(3L) == -1L, "nothing at or after t=45")
    assert(got(4L) == 100L, "t=5 → next is t=10")
    assert(got(5L) == 500L, "equal ts qualifies (>= bound)")
    assert(got(6L) == -1L, "a null-time build row never matches")
    assert(got(7L) == -1L && got(8L) == -1L, "null probe key/time match nothing")
  }

  test("tolerance fixtures: nearest-or-nothing — a stale nearest match nulls out, never falls back to an older row") {
    import spark.implicits._
    def probe(rows: (java.lang.Long, java.lang.Long, Long)*) =
      rows.toDF("k", "t", "pid")
        .select(col("k"), timestamp_micros(col("t")).as("t"), col("pid"))
    def build(rows: (java.lang.Long, java.lang.Long, Long)*) =
      rows.toDF("bk", "bt", "vid")
        .select(col("bk"), timestamp_micros(col("bt")).as("bt"), col("vid"))
    val b = build((1L, 10L, 100L), (1L, 30L, 300L))
    val l = probe((1L, 31L, 1L), (1L, 45L, 2L), (1L, 29L, 3L))
    def run(tol: Long) =
      AsOf.join(l, b, "k", "bk", "t", "bt", Seq("vid"),
        toleranceUs = Some(tol))
        .select("pid", "vid").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toMap
    val tight = run(5L)
    assert(tight(1L) == 300L, "t=31: nearest (t=30) is within 5")
    assert(tight(2L) == -1L,
      "t=45: nearest (t=30) is 15 away — outside 5, and the t=10 row " +
        "must NOT be consulted as a fallback")
    assert(tight(3L) == -1L, "t=29: nearest at-or-before is t=10, 19 away")
    val loose = run(25L)
    assert(loose(2L) == 300L && loose(3L) == 100L)
    // forward + tolerance composes: next-at-or-after, but only nearby
    val fwd = AsOf.join(l, b, "k", "bk", "t", "bt", Seq("vid"),
      forward = true, toleranceUs = Some(5L))
      .select("pid", "vid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    assert(fwd(3L) == 300L, "t=29: next (t=30) is within 5 ahead")
    assert(fwd(1L) == -1L, "t=31: nothing at-or-after within 5")
    assert(fwd(2L) == -1L, "t=45: nothing at-or-after at all")
  }

  test("nearest fixtures: closest side wins, exact-distance ties go backward, tolerance bounds both directions") {
    import spark.implicits._
    def probe(rows: (java.lang.Long, java.lang.Long, Long)*) =
      rows.toDF("k", "t", "pid")
        .select(col("k"), timestamp_micros(col("t")).as("t"), col("pid"))
    def build(rows: (java.lang.Long, java.lang.Long, Long)*) =
      rows.toDF("bk", "bt", "vid")
        .select(col("bk"), timestamp_micros(col("bt")).as("bt"), col("vid"))
    // key 1: builds at t=10, 20 (tie pair 200/201), 40
    val b = build((1L, 10L, 100L), (1L, 20L, 201L), (1L, 20L, 200L),
      (1L, 40L, 400L), (2L, 5L, 500L), (3L, null, 901L))
    val l = probe(
      (1L, 13L, 1L), // 10 is 3 back, 20 is 7 ahead → 10
      (1L, 16L, 2L), // 10 is 6 back, 20 is 4 ahead → 20 (fwd ties → MIN id 200)
      (1L, 15L, 3L), // equidistant 5/5 → BACKWARD → 10
      (1L, 20L, 4L), // exact hit → backward rule → max tiebreak 201
      (1L, 99L, 5L), // only backward exists → 40
      (1L, 2L, 6L),  // only forward exists → 10
      (3L, 50L, 7L)) // null-time build rows never match
    def run(tol: Option[Long]) =
      AsOf.joinNearest(l, b, "k", "bk", "t", "bt", Seq("vid"), tol)
        .select("pid", "vid").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toMap
    val got = run(None)
    assert(got == Map(1L -> 100L, 2L -> 200L, 3L -> 100L, 4L -> 201L,
      5L -> 400L, 6L -> 100L, 7L -> -1L), got.toString)
    // tolerance 5: pid=5 (59 back) and pid=6 (8 ahead) fall out; the
    // equidistant-5 pid=3 stays (bound is inclusive)
    val tight = run(Some(5L))
    assert(tight == Map(1L -> 100L, 2L -> 200L, 3L -> 100L, 4L -> 201L,
      5L -> -1L, 6L -> -1L, 7L -> -1L), tight.toString)
  }

  test("generalized keys: string-keyed merge matches the Long-keyed answer; mismatched/unorderable keys fail at JOIN TIME, not task time") {
    import spark.implicits._
    // same fixture as the backward test, keys mapped through an
    // injective string tag whose sort order (k10 < k2) differs from
    // the numeric one — only key EQUALITY may matter
    def tag(c: org.apache.spark.sql.Column) =
      concat(lit("k"), c.cast("string"))
    val b = Seq((1L, 10L, 100L), (1L, 20L, 201L), (1L, 20L, 200L),
      (1L, 40L, 400L), (2L, 5L, 500L), (10L, 7L, 700L))
      .toDF("bk", "bt", "vid")
      .select(tag(col("bk")).as("bk"), timestamp_micros(col("bt")).as("bt"),
        col("vid"))
    val l = Seq((1L, 20L, 1L), (1L, 45L, 2L), (2L, 5L, 3L), (10L, 8L, 4L),
      (3L, 50L, 5L))
      .toDF("k", "t", "pid")
      .select(tag(col("k")).as("k"), timestamp_micros(col("t")).as("t"),
        col("pid"))
    val got = AsOf.join(l, b, "k", "bk", "t", "bt", Seq("vid"))
      .select("pid", "vid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    assert(got == Map(1L -> 201L, 2L -> 400L, 3L -> 500L, 4L -> 700L,
      5L -> -1L))
    // mismatched key types: rejected when join() is CALLED (the
    // analysis-time contract of AsOf.validateTypes), not mid-task
    val longProbe = Seq((1L, 20L, 1L)).toDF("k", "t", "pid")
      .select(col("k"), timestamp_micros(col("t")).as("t"), col("pid"))
    val e1 = intercept[IllegalArgumentException] {
      AsOf.join(longProbe, b, "k", "bk", "t", "bt")
    }
    assert(e1.getMessage.contains("key types must match"))
    // unorderable key (map type): same analysis-time rejection
    val mapProbe = longProbe.select(
      map(col("k"), col("k")).as("k"), col("t"), col("pid"))
    val mapBuild = b.select(map(col("vid"), col("vid")).as("bk"),
      col("bt"), col("vid"))
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(mapProbe, mapBuild, "k", "bk", "t", "bt")
    }
    assert(e2.getMessage.contains("orderable"))
    // bad time type: same analysis-time rejection
    val e3 = intercept[IllegalArgumentException] {
      AsOf.join(l.withColumn("t", lit("oops")), b, "k", "bk", "t", "bt")
    }
    assert(e3.getMessage.contains("Timestamp/Long"))
  }

  test("bucketed inputs satisfy the exec's distribution: ZERO exchanges — the 100 TB win the window form cannot have") {
    // The isolated A/B at sf0.1 prices the native exec ~0.2 s behind
    // the union+window composition (two exchanges vs one, interpreted
    // merge vs codegen'd window) — the native form's case is at SCALE:
    // its ClusteredDistribution is satisfiable by storage layout, so
    // over bucketed(+sorted) tables the as-of join plans NO exchange at
    // all, while the composition must shuffle the union no matter how
    // the inputs are laid out.
    // clear orphan warehouse locations from any earlier run (the
    // SinksSpec discipline: DROP TABLE can't remove a location whose
    // catalog entry died with a previous derby instance)
    for (t <- Seq("asof_purchases_b", "asof_views_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val ev = graft.sources.Tables.events(spark, sfDir)
    graft.sources.Sinks.bucketedTable(
      ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id")),
      "asof_purchases_b", "user_id", 8, sortCols = Seq("user_id", "ts"))
    graft.sources.Sinks.bucketedTable(
      ev.where(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
          col("event_id").as("view_id")),
      "asof_views_b", "v_user", 8,
      sortCols = Seq("v_user", "view_ts", "view_id"))
    val df = AsOf.join(
      spark.table("asof_purchases_b"), spark.table("asof_views_b"),
      "user_id", "v_user", "ts", "view_ts", Seq("view_id"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"),
      s"bucketed as-of join still shuffles:\n$plan")
    // r15: with one sorted file per bucket and the scan's ordering
    // claim armed (GraftSession), the read-time sorts vanish too —
    // the declared query body asserts the same (Advanced.scala)
    assert(!plan.contains("Sort "),
      s"sorted-bucketed as-of join still sorts:\n$plan")
    // and it still answers exactly like the shuffled form
    val viaShuffle = nativeAsOf.select("purchase_id", "view_id")
    val viaBuckets = df.select(col("event_id").as("purchase_id"), col("view_id"))
    assert(viaBuckets.exceptAll(viaShuffle).count() === 0)
    assert(viaShuffle.exceptAll(viaBuckets).count() === 0)
  }
}
