package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The reference's job-resume capability (P5: `jobtracker.py:157-209` —
  * adopt journaled state, continue from the recorded phase) maps to
  * Structured Streaming checkpointing. This spec proves it end-to-end:
  * kill a query mid-stream, restart from the checkpoint, and the
  * aggregate continues without reprocessing or losing batches. */
class CheckpointRecoverySpec extends SparkSpec {

  test("foreachBatch idempotent sink: batch replay does not duplicate rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fb")
    val src = s"$dir/in"; val out = s"$dir/out"
    new java.io.File(src).mkdirs()
    def chunk(ids: Range): Unit =
      ids.map(i => Event(i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
          i % 2L, "click", 1.0, "{}"))
        .toDF().coalesce(1).write.mode("append").parquet(src)
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema

    chunk(0 until 10)
    def run(ck: String) = {
      val q = EventStreams.idempotentParquetSink(
          spark.readStream.schema(schema).parquet(src), out, ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000); q.stop()
    }
    run(s"$dir/ckpt")
    assert(spark.read.parquet(out).count() == 10)
    // simulate sink-committed-but-checkpoint-lost: fresh checkpoint
    // replays everything; partition overwrite keeps counts exact
    run(s"$dir/ckpt2")
    assert(spark.read.parquet(out).count() == 10)
    // normal incremental progress still works
    chunk(10 until 15)
    run(s"$dir/ckpt2")
    assert(spark.read.parquet(out).where("event_id >= 10").count() == 5)
  }

  test("stateful funnel (mapGroupsWithState) survives kill/restart at batch parity") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-funnel")
    val src = s"$dir/in"; val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    new java.io.File(src).mkdirs()
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
    def ev(id: Long, t: String, uid: Long, typ: String) =
      Event(id, java.sql.Timestamp.valueOf(t), uid, typ, 1.0, "{}")
    def write(rows: Seq[Event]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val q = EventStreams.funnelStages(
          spark.readStream.schema(schema).parquet(src).as[Event])
        .toDF("user_id", "stage")
        .writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(out); () }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000); q.stop()
    }
    // the stage counter is monotone, so "current state" = max over every
    // Update-mode emission — idempotent under batch replay too
    def state(): Map[Long, Int] =
      spark.read.parquet(out).groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("stage").as("stage"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    // phase 1: views only, plus user 2's out-of-order click (must not advance)
    write(Seq(ev(0, "2024-01-01 10:00:00", 0, "view"),
              ev(1, "2024-01-01 10:00:00", 1, "view"),
              ev(2, "2024-01-01 10:05:00", 2, "click")))
    run()
    assert(state() == Map(0L -> 1, 1L -> 1, 2L -> 0), state().toString)

    // phase 2: the query restarts from the checkpoint; clicks/purchases
    // can only advance users whose view-stage SURVIVED in the state
    // store — if recovery lost it, user 0 cannot reach stage 3 because
    // the view event is never replayed
    write(Seq(ev(3, "2024-01-01 11:00:00", 0, "click"),
              ev(4, "2024-01-01 11:30:00", 0, "purchase"),
              ev(5, "2024-01-01 11:00:00", 1, "purchase"),
              ev(6, "2024-01-01 11:10:00", 2, "purchase")))
    run()
    val fin = state()
    assert(fin == Map(0L -> 3, 1L -> 1, 2L -> 0), fin.toString)

    // batch parity: the same events through the declared batch funnel
    val bdir = Files.createTempDirectory("graft-funnel-batch")
    spark.read.schema(schema).parquet(src)
      .write.parquet(s"$bdir/events.parquet")
    val batch = graft.operators.Events.queries("ev_funnel")(spark, bdir.toString)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val streamed = fin.values.groupBy(identity)
      .map { case (st, us) => st -> us.size.toLong }
    assert(batch == streamed, s"batch=$batch stream=$streamed")
  }

  test("EWMA fold state survives kill/restart (restart must not reset the fold)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ewma")
    val src = s"$dir/in"; val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    new java.io.File(src).mkdirs()
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
    def ev(id: Long, t: String, uid: Long, v: Double) =
      Event(id, java.sql.Timestamp.valueOf(t), uid, "click", v, "{}")
    def write(rows: Seq[Event]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val q = EventStreams.ewmaUserState(
          spark.readStream.schema(schema).parquet(src).as[Event])
        .toDF()
        .writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(out); () }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000); q.stop()
    }
    def state(): Map[Long, (Long, Long)] =
      spark.read.parquet(out).groupBy("user_id")
        .agg(max(struct(col("n_events"), col("ewma_micro"))).as("m"))
        .collect().map(r => r.getLong(0) ->
          ((r.getStruct(1).getLong(0), r.getStruct(1).getLong(1)))).toMap

    // phase 1: e0 = 1_000_000, then e1 = (300*2e6 + 700*1e6)/1000
    write(Seq(ev(0, "2024-01-01 10:00:00", 7, 1.0),
              ev(1, "2024-01-01 10:01:00", 7, 2.0)))
    run()
    assert(state() == Map(7L -> ((2L, 1300000L))), state().toString)

    // phase 2 after restart: the fold continues FROM 1_300_000 — if the
    // checkpoint lost the state, the fold restarts at v and yields
    // -500_000 instead of (300*(-5e5) + 700*1.3e6)/1000 = 760_000
    write(Seq(ev(2, "2024-01-01 10:02:00", 7, -0.5)))
    run()
    assert(state() == Map(7L -> ((3L, 760000L))), state().toString)
  }

  test("streaming near-dedup state survives kill/restart (dup across restart stays dropped)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-neardedup")
    val src = s"$dir/in"; val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    new java.io.File(src).mkdirs()
    val schema = implicitly[org.apache.spark.sql.Encoder[StreamDoc]].schema
    def doc(id: Long, t: String, text: String) =
      StreamDoc(id, java.sql.Timestamp.valueOf(t), text)
    def write(rows: Seq[StreamDoc]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val q = DedupStreams.nearDedup(
          spark.readStream.schema(schema).parquet(src).as[StreamDoc])
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000); q.stop()
    }
    // phase 1: two distinct texts + one near-dup (token repetition
    // collapses to the same simhash signature)
    write(Seq(doc(1, "2024-01-01 10:00:00", "alpha beta gamma delta"),
              doc(2, "2024-01-01 10:01:00", "epsilon zeta eta theta"),
              doc(3, "2024-01-01 10:02:00", "alpha beta gamma delta alpha")))
    run()
    // phase 2 (restarted from checkpoint): a near-dup of doc 1 INSIDE
    // the horizon — only the checkpointed state knows signature(doc 1)
    // was seen, the event itself is never replayed. If recovery lost
    // state, doc 4 would be emitted. Doc 5 is genuinely new.
    write(Seq(doc(4, "2024-01-01 10:03:00", "delta gamma beta alpha"),
              doc(5, "2024-01-01 10:04:00", "iota kappa lambda mu")))
    run()
    val kept = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 5L), s"kept=$kept")
    // batch parity: the sink holds exactly one representative per
    // distinct signature over everything ingested across both
    // incarnations
    val batchSigs = spark.read.schema(schema).parquet(src).as[StreamDoc]
      .collect().map(d => DedupStreams.simhash60(d.text)).toSet
    val streamSigs = spark.read.parquet(out).select("simhash")
      .collect().map(_.getLong(0)).toSet
    assert(streamSigs == batchSigs, s"stream=$streamSigs batch=$batchSigs")
  }

  test("streaming contamination filter survives kill/restart (no re-emit, flags correct)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-contam")
    val src = s"$dir/in"; val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    new java.io.File(src).mkdirs()
    val schema = implicitly[org.apache.spark.sql.Encoder[StreamDoc]].schema
    val bench = Seq("the quick brown", "quick brown fox").toDF("shingle")
    def doc(id: Long, t: String, text: String) =
      StreamDoc(id, java.sql.Timestamp.valueOf(t), text)
    def write(rows: Seq[StreamDoc]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val q = DedupStreams.contaminated(
          spark.readStream.schema(schema).parquet(src), bench)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000); q.stop()
    }
    // phase 1: doc 1 contaminated (shares a 3-gram with the dictionary),
    // doc 2 clean
    write(Seq(doc(1, "2024-01-01 10:00:00", "see the quick brown fox run"),
              doc(2, "2024-01-01 10:01:00", "completely unrelated clean text here")))
    run()
    // phase 2 (restart): the SAME contaminated doc re-delivered inside
    // the horizon (source replay / duplicate crawl) — the per-doc_id
    // dedup state must survive the restart and swallow it; doc 3 is a
    // fresh contaminated doc and must flag
    write(Seq(doc(1, "2024-01-01 10:02:00", "see the quick brown fox run"),
              doc(3, "2024-01-01 10:03:00", "again the quick brown fox appears")))
    run()
    val flagged = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toList.sorted
    assert(flagged == List(1L, 3L), s"flagged=$flagged")
  }

  test("cross-corpus dedup ingest survives kill/restart at batch parity with pl_cross_dedup") {
    import spark.implicits._
    import java.sql.Timestamp
    val dir = Files.createTempDirectory("graft-ingest")
    val src = s"$dir/in"; val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    new java.io.File(src).mkdirs()
    val schema = implicitly[org.apache.spark.sql.Encoder[StreamDoc]].schema
    // the batch operator's split on the REAL corpus: existing = doc_id%5
    // != 4 (fingerprints, the static side), incoming = doc_id%5 == 4
    val corpusFps = graft.sources.Tables.documents(spark, sfDir)
      .where(col("doc_id") % 5 =!= 4)
      .select(md5(col("text").cast("binary")).as("fp")).distinct()
    val incoming = graft.sources.Tables.documents(spark, sfDir)
      .where(col("doc_id") % 5 === 4)
      .selectExpr("doc_id", "text").collect()
      .sortBy(_.getLong(0)) // arrival order = id order → first winner = min id
    def write(rows: Seq[StreamDoc]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(src)
    def run(): Unit = {
      val q = DedupStreams.crossDedupIngest(
          spark.readStream.schema(schema).parquet(src), corpusFps)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000); q.stop()
    }
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def docs(rows: Seq[org.apache.spark.sql.Row], o: Int) =
      rows.zipWithIndex.map { case (r, i) =>
        StreamDoc(r.getLong(0), new Timestamp(base + (o + i) * 1000L), r.getString(1)) }
    // phase 1: first half of the crawl
    val (h1, h2) = incoming.toSeq.splitAt(incoming.length / 2)
    write(docs(h1, 0))
    run()
    // phase 2 AFTER the kill: the second half, PLUS a re-crawl of a
    // phase-1 survivor (same text, new id — only the CHECKPOINTED
    // fingerprint state knows it was seen; if recovery lost state it
    // would be re-emitted) and a doc whose text lives in the base
    // corpus (the static anti side must keep holding it out)
    val survivor = h1.head.getString(1)
    val corpusText = graft.sources.Tables.documents(spark, sfDir)
      .where(col("doc_id") % 5 =!= 4).selectExpr("text").head.getString(0)
    write(docs(h2, h1.length) ++ Seq(
      StreamDoc(900001L, new Timestamp(base + 900000L), survivor),
      StreamDoc(900002L, new Timestamp(base + 901000L), corpusText)))
    run()
    val kept = spark.read.parquet(out)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!keptIds.contains(900001L) && !keptIds.contains(900002L),
      "state or static anti-join failed across restart")
    // batch parity with the declared operator: same surviving
    // fingerprint set, same representative (min-id) per fingerprint
    val batch = graft.operators.Pipeline.queries("pl_cross_dedup")(spark, sfDir)
      .select("doc_id", "fp").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(batch.nonEmpty)
    val streamFps = kept.select("fp").collect().map(_.getString(0)).toSet
    assert(streamFps == batch.map(_._2).toSet,
      s"fp drift: stream-only=${streamFps -- batch.map(_._2).toSet}")
    assert(keptIds == batch.map(_._1).toSet,
      s"representative drift: stream-only=${keptIds -- batch.map(_._1).toSet} " +
      s"batch-only=${batch.map(_._1).toSet -- keptIds}")
  }

  test("windowed aggregation resumes from checkpoint after restart") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ckpt")
    val src = s"$dir/in"; val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    new java.io.File(src).mkdirs()

    def writeChunk(ids: Range, hour: Int): Unit =
      ids.map(i => Event(i.toLong,
          java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00"), i % 3L,
          "click", 1.0, "{}"))
        .toDF().coalesce(1).write.mode("append").parquet(src)

    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
    def start() =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1) // rate-limited ingestion
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("bucket"), col("user_id"), col("n"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()

    // phase 1: two batches, then the query "dies" (stop)
    writeChunk(0 until 30, hour = 10)
    writeChunk(30 until 60, hour = 10)
    val q1 = start(); q1.awaitTermination(60000); q1.stop()

    // phase 2: more data for hour 10 + hour 12 (advances watermark past 10)
    writeChunk(60 until 90, hour = 10)
    writeChunk(90 until 93, hour = 12)
    val q2 = start(); q2.awaitTermination(60000); q2.stop()
    // third run flushes finalized state after the watermark advanced
    writeChunk(93 until 94, hour = 14)
    val q3 = start(); q3.awaitTermination(60000); q3.stop()

    val result = spark.read.parquet(out)
      .where(col("bucket") === "2024-01-01 10:00:00")
      .groupBy("user_id").agg(sum("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 90 events over users 0..2 — every event counted exactly once
    // across the three separate query incarnations
    assert(result == Map(0L -> 30L, 1L -> 30L, 2L -> 30L), result.toString)
  }

  test("windowed aggregation survives kill/restart under the RocksDB store with changelog checkpointing") {
    // the 100 TB recovery story end-to-end: RocksDB state (off-heap,
    // local-SSD) + changelog checkpointing (per-batch deltas shipped
    // to the checkpoint instead of full snapshots) must restore the
    // same aggregation state across THREE query incarnations — the
    // restart path is where a changelog bug would corrupt counts
    import spark.implicits._
    val confs = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = Files.createTempDirectory("graft-rocks-ckpt")
      val src = s"$dir/in"; val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
      new java.io.File(src).mkdirs()
      def writeChunk(ids: Range, hour: Int): Unit =
        ids.map(i => Event(i.toLong,
            java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00"), i % 3L,
            "click", 1.0, "{}"))
          .toDF().coalesce(1).write.mode("append").parquet(src)
      val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
      def start() =
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(src)
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("bucket"), col("user_id"), col("n"))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      writeChunk(0 until 30, hour = 10)
      writeChunk(30 until 60, hour = 10)
      val q1 = start(); q1.awaitTermination(60000); q1.stop()
      writeChunk(60 until 90, hour = 10)
      writeChunk(90 until 93, hour = 12)
      val q2 = start(); q2.awaitTermination(60000); q2.stop()
      writeChunk(93 until 94, hour = 14)
      val q3 = start(); q3.awaitTermination(60000)
      // the provider must have actually engaged in the final incarnation
      import scala.jdk.CollectionConverters._
      val engaged = q3.recentProgress.flatMap(_.stateOperators).exists(
        _.customMetrics.keySet().asScala.exists(
          _.toLowerCase.contains("rocksdb")))
      q3.stop()
      assert(engaged, "RocksDB provider did not engage across restarts")
      val result = spark.read.parquet(out)
        .where(col("bucket") === "2024-01-01 10:00:00")
        .groupBy("user_id").agg(sum("n").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(result == Map(0L -> 30L, 1L -> 30L, 2L -> 30L), result.toString)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
