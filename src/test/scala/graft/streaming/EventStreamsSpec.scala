package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming semantics under MemoryStream micro-batches: watermark
  * finalization, late-data dropping, dedup, and custom state. */
class EventStreamsSpec extends SparkSpec {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def ev(id: Long, t: String, user: Long = 1L, typ: String = "click",
      v: Double = 1.0): Event = Event(id, ts(t), user, typ, v, "{}")

  test("tumbling windows finalize on watermark; late events dropped") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.tumblingCounts(in.toDF, lateness = "10 minutes")
      .writeStream.format("memory").queryName("tumbling").outputMode("append").start()
    try {
      // window [10:00, 11:00): 2 events
      in.addData(ev(1, "10:05"), ev(2, "10:40"))
      q.processAllAvailable()
      assert(spark.table("tumbling").count() == 0) // not finalized yet
      // advance event time past 11:10 → watermark 11:05 > window end
      in.addData(ev(3, "11:15"))
      q.processAllAvailable()
      val done = spark.table("tumbling").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
      assert(done == Map("2024-01-01 10:00:00.0" -> 2L))
      // an event at 10:20 is now beyond the watermark → dropped
      in.addData(ev(4, "10:20"), ev(5, "12:30"))
      q.processAllAvailable()
      in.addData(ev(6, "13:45")) // finalize [11,12) and [12,13)
      q.processAllAvailable()
      val all = spark.table("tumbling").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
      assert(all("2024-01-01 11:00:00.0") == 1L)
      assert(all("2024-01-01 12:00:00.0") == 1L) // the late ev(4) is absent
    } finally q.stop()
  }

  test("session windows merge events within gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionCounts(in.toDF, gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: events at 10:00, 10:10, 10:35 → one session (gaps < 30m);
      // then 12:00 → new session
      in.addData(ev(1, "10:00"), ev(2, "10:10"), ev(3, "10:35"), ev(4, "12:00"))
      q.processAllAvailable()
      in.addData(ev(5, "14:00")) // advance watermark, finalize both
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(3))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", 3L)))
      assert(rows.contains(("2024-01-01 12:00:00.0", 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids within watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.dedupEvents(in.toDF)
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData(ev(1, "10:00"), ev(2, "10:01"), ev(1, "10:00"))
      q.processAllAvailable()
      in.addData(ev(2, "10:01"), ev(3, "10:02"))
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to recent views") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStreams.viewPurchaseAttribution(views.toDF, purchases.toDF)
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      views.addData(ev(10, "10:00", user = 1), ev(11, "12:00", user = 1))
      purchases.addData(
        ev(20, "10:30", user = 1),  // within 1h of view 10
        ev(21, "11:30", user = 1),  // >1h after view 10, before view 11
        ev(22, "12:15", user = 2))  // wrong user
      q.processAllAvailable()
      val pairs = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((20L, 10L)))
    } finally q.stop()
  }

  test("streaming as-of join: latest view wins, ties to max view_id, flush on watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStreams.asofAttribution(views.toDF, purchases.toDF)
      .writeStream.format("memory").queryName("asofattr").outputMode("append").start()
    try {
      // user 1: three candidate views for purchase 20 — 10 (oldest),
      // 11 and 12 TIED at 10:20 → the as-of winner is 12 (max id);
      // user 2's view is out of the 1-hour window entirely
      views.addData(
        ev(10, "10:00", user = 1), ev(11, "10:20", user = 1),
        ev(12, "10:20", user = 1), ev(13, "08:00", user = 2))
      purchases.addData(ev(20, "10:30", user = 1), ev(21, "10:30", user = 2))
      q.processAllAvailable()
      // append-mode argmax: nothing emits until the watermark passes
      // the purchase's window end
      assert(spark.table("asofattr").count() == 0,
        "argmax rows must wait for the watermark")
      views.addData(ev(90, "13:00", user = 9))
      purchases.addData(ev(91, "13:00", user = 9))
      q.processAllAvailable()
      val rows = spark.table("asofattr").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((20L, 12L)),
        s"exactly the tie-max latest view must win; got $rows")
    } finally q.stop()
  }

  test("mapGroupsWithState carries per-user totals across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.runningUserTotals(in.toDS)
      .writeStream.format("memory").queryName("totals").outputMode("update").start()
    try {
      in.addData(ev(1, "10:00", user = 1, v = 2.0), ev(2, "10:01", user = 2, v = 3.0))
      q.processAllAvailable()
      in.addData(ev(3, "10:02", user = 1, v = 5.0))
      q.processAllAvailable()
      val last = spark.table("totals").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).maxBy(_._1) }
      assert(last(1L) == ((2L, 7.0)))
      assert(last(2L) == ((1L, 3.0)))
    } finally q.stop()
  }

  test("streaming funnel stage counts match the batch ev_funnel ground truth") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    // real corpus, streamed in two event-time-ordered micro-batches
    val rows = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id").collect()
      .map(r => Event(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4), "{}"))
    val in = MemoryStream[Event]
    val q = EventStreams.funnelStages(in.toDS)
      .writeStream.format("memory").queryName("funnel").outputMode("update").start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      in.addData(h1.toSeq: _*); q.processAllAvailable()
      in.addData(h2.toSeq: _*); q.processAllAvailable()
      // last emitted stage per user (stages only ever advance)
      val streamed = spark.table("funnel").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).max }
      val streamCounts = streamed.values.groupBy(identity).map { case (s, xs) => s -> xs.size }
      val batchCounts = graft.operators.Events.queries("ev_funnel")(spark, sfDir)
        .collect().map(r => r.getInt(0) -> r.getLong(1).toInt).toMap
      // batch includes stage-0 users only if they produced SOME event;
      // both sides see the same user universe here, so compare directly
      assert(streamCounts == batchCounts,
        s"stream=$streamCounts batch=$batchCounts")
    } finally q.stop()
  }
}
