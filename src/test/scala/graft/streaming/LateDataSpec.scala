package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import scala.jdk.CollectionConverters._

/** Round-11 closure of the last streaming-semantics hole (r10 verdict
  * item 1): every earlier parity query arranged that nothing is ever
  * late, so the watermark's DROP rule was documented but never
  * executed. These specs pin the drop rule itself, plus the state-store
  * provider swap (verdict item 2).
  *
  * Empirical contract these tests encode (verified on Spark 4.1.2):
  * the late-row filter runs against the PREVIOUS batch's watermark
  * (SPARK-40925 watermark propagation — one batch behind the eviction
  * watermark), which is why [[StreamParity.streamEventsWithLatePlant]]
  * ships THREE files: corpus, a watermark-aging replay, then the late
  * batch. */
class LateDataSpec extends SparkSpec {

  test("st_tumbling_late: watermark drops the stale replants and admits the in-horizon ones") {
    val res = StreamParity.queries("st_tumbling_late")(spark, sfDir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val corpus = graft.sources.Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour")("start").as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val mm = graft.sources.Tables.events(spark, sfDir)
      .agg(min(col("ts")), max(col("ts"))).head
    val hourUs = 3600L * 1000000
    def bucketOf(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime / 1000 * 1000000 + t.getNanos / 1000, hourUs)
    val (b0, bn) = (bucketOf(mm.getTimestamp(0)), bucketOf(mm.getTimestamp(1)))
    assert(res.keySet === corpus.keySet,
      "late plants must never create or destroy a (bucket, type) group")
    res.foreach { case (key @ (bucket, _), n) =>
      val b = bucketOf(bucket)
      val expected =
        if (b == b0) corpus(key)      // replants (×2) DROPPED
        else if (b == bn) 3 * corpus(key) // file-1 + file-2 replays ADMITTED
        else corpus(key)
      assert(n === expected, s"group $key: got $n, expected $expected")
    }
    // the drop branch must actually have been exercised
    assert(corpus.keys.exists { case (t, _) => bucketOf(t) == b0 })
    assert(corpus.keys.exists { case (t, _) => bucketOf(t) == bn })
  }

  test("late plant arrives over 3 real micro-batches (corpus, aging replay, late batch)") {
    val (_, batches) = StreamParity.runToTableCounted(
      EventStreams.tumblingCounts(
        StreamParity.streamEventsWithLatePlant(spark, sfDir)),
      "late_batches_spec", mode = "update")
    assert(batches >= 3,
      s"expected >=3 data micro-batches, got $batches — the late file " +
        "must land two batches after the corpus or the late filter " +
        "never engages")
  }

  test("st_sessions_late: stale replants fabricate no sessions, in-horizon replants fatten theirs") {
    val base = StreamParity.queries("st_sessions")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val late = StreamParity.queries("st_sessions_late")(spark, sfDir)
    val lateRows = late.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
    // DROP engaged: no session exists in the late run that doesn't
    // exist in the plain run — a wrongly-admitted stale replant would
    // fabricate a (user, start) pair the closed original can't have
    val lateStarts = lateRows.map(t => (t._1, t._2)).toSet
    assert(lateStarts === base,
      "the session (user, start) set must be unchanged by late plants")
    // ADMISSION engaged: total event count grows by exactly the two
    // admitted last-20-minute replays (aging file + late file) — the
    // plant frames its admitted side by watermark distance, so every
    // source row is admitted for ANY corpus shape (ts + 30 min gap is
    // ≥ 10 min past the max − 10 min watermark)
    val ev = graft.sources.Tables.events(spark, sfDir)
    val total = ev.count()
    val mm = ev.agg(max(col("ts"))).head.getTimestamp(0)
    val mxUs = mm.getTime / 1000 * 1000000 + mm.getNanos / 1000
    val lateSrc = ev.where(
      expr("unix_micros(ts)") > lit(mxUs - 1200L * 1000000)).count()
    assert(lateSrc > 0, "degenerate corpus: empty last 20 minutes")
    assert(lateRows.map(_._3).sum === total + 2 * lateSrc,
      "admitted replants must raise session counts by exactly 2x the " +
        "last-20-minute source")
  }

  test("session late plant arrives over >=4 real micro-batches") {
    val (_, batches) = StreamParity.runToTableCounted(
      EventStreams.sessionCounts(
        StreamParity.streamEventsWithSessionLatePlant(spark, sfDir)),
      "session_late_batches_spec")
    assert(batches >= 4,
      s"expected >=4 data micro-batches (corpus, aging, late, sentinel), " +
        s"got $batches")
  }

  test("st_interval_join_late: stale pairs dropped by both join sides, in-horizon pairs all attributed") {
    val res = StreamParity.queries("st_interval_join_late")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = res.filter(_._3 < -1000L)
    val ev = graft.sources.Tables.events(spark, sfDir)
    val mm = ev.agg(min(unix_micros(col("ts"))).as("mn"),
      max(unix_micros(col("ts"))).as("mx")).head
    val dayUs = 24L * 3600 * 1000000
    val lastDay = ev.where(unix_micros(col("ts")) > mm.getLong(1) - dayUs)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val firstDay = ev.where(unix_micros(col("ts")) < mm.getLong(0) + dayUs)
      .count()
    assert(firstDay > 0 && lastDay.nonEmpty, "degenerate corpus")
    // ADMITTED: one self-pair per last-day source event, exactly
    assert(planted.length === lastDay.size,
      s"expected ${lastDay.size} admitted planted pairs, got ${planted.length}")
    assert(planted.forall { case (pid, vid, uid) =>
      val src = pid - 20000000000L
      lastDay.contains(src) && vid == src + 10000000000L &&
        uid == -(src + 1000000L)
    }, "every admitted pair must be a last-day self-pair")
    // DROPPED: no pair traces to a first-day source event
    assert(planted.forall(p => lastDay.contains(p._1 - 20000000000L)),
      "no stale (first-day) planted pair may survive the late filter")
    // the corpus-side pair set is untouched by the plant
    val basePairs = StreamParity.queries("st_interval_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(res.filter(_._3 >= 0).toSet === basePairs)
  }

  test("st_asof_join_late: the CHAINED pipeline drops stale pairs, admits and argmax-flushes in-horizon ones") {
    // same plant as st_interval_join_late, now through interval join →
    // windowed argmax: admission is the join's late filter, emission
    // additionally requires the argmax window to flush on the
    // post-late-batch sentinel — a drop in EITHER chained store is
    // hash-visible as a missing pair here
    val res = StreamParity.queries("st_asof_join_late")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = res.filter(_._3 <= -1000000L)
    val ev = graft.sources.Tables.events(spark, sfDir)
    val mm = ev.agg(min(unix_micros(col("ts"))).as("mn"),
      max(unix_micros(col("ts"))).as("mx")).head
    val dayUs = 24L * 3600 * 1000000
    val lastDay = ev.where(unix_micros(col("ts")) > mm.getLong(1) - dayUs)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(planted.length === lastDay.size,
      s"expected ${lastDay.size} admitted+flushed planted pairs, " +
        s"got ${planted.length}")
    assert(planted.forall { case (pid, vid, uid) =>
      val src = pid - 20000000000L
      lastDay.contains(src) && vid == src + 10000000000L &&
        uid == -(src + 1000000L)
    }, "every emitted planted pair must be a last-day self-pair")
    // the corpus-side as-of answer is untouched by the plant
    val base = StreamParity.queries("st_asof_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(res.filter(_._3 >= 0).toSet === base)
  }

  test("st_sessions_rocksdb: RocksDB provider engages and the session set equals the HDFS-backed run") {
    val rocks = StreamParity.queries("st_sessions_rocksdb")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val hdfs = StreamParity.queries("st_sessions")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(rocks === hdfs,
      "the state-store provider is an execution knob: RocksDB-backed " +
        "session state must produce the identical session set")
    assert(rocks.nonEmpty)
  }

  test("RocksDB changelog checkpointing: same session set as the snapshot-checkpoint run") {
    // the production restart-cost knob: changelog checkpointing ships
    // per-batch deltas instead of full RocksDB snapshots. Like the
    // provider itself, it must be an execution knob only — the
    // declared session oracle's answer cannot move
    val df = EventStreams.sessionCounts(
      StreamParity.streamEventsEpochsWithSentinel(spark, sfDir))
    val qn = "rocksdb_changelog_spec"
    val olds = Seq(
      "spark.sql.streaming.stateStore.providerClass",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    try {
      val q = df.writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("rocks-changelog").toString)
        .start()
      assert(q.awaitTermination(300000L))
      val got = spark.table(qn).where(col("user_id") >= 0)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(_.toSeq).toSet
      val base = StreamParity.queries("st_sessions")(spark, sfDir)
        .collect().map(_.toSeq).toSet
      assert(got === base)
      assert(got.nonEmpty)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("RocksDB provider reports state-store memory metrics in query progress") {
    val df = EventStreams.sessionCounts(
      StreamParity.streamEventsEpochsWithSentinel(spark, sfDir))
    val qn = "rocksdb_metrics_spec"
    val q = df.writeStream.format("memory").queryName(qn)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("rocks-spec").toString)
      .start()
    try {
      // provider conf is read from the SESSION at start — the declared
      // query sets it under the shared lock; here we assert the
      // default-provider run does NOT report rocksdb metrics, so the
      // declared query's `require(engaged)` can never pass vacuously
      assert(q.awaitTermination(300000L))
      val metrics = q.recentProgress.flatMap(_.stateOperators)
        .flatMap(_.customMetrics.keySet().asScala)
      assert(!metrics.exists(_.toLowerCase.contains("rocksdb")),
        "default HDFS-backed run must not carry rocksdb metrics — " +
          "otherwise the engagement check is meaningless")
    } finally q.stop()
  }
}
