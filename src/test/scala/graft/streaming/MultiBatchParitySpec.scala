package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime

/** Round-10 closure of the r9 streaming-parity caveat: the single-file
  * test corpora yield exactly ONE AvailableNow micro-batch, so nothing
  * in the oracle-gated `st_*` family ever exercised CROSS-BATCH state
  * (dedup keys held across batches, fold state carried between
  * epochs). These specs force real multi-batch arrival two ways:
  *
  *  - the KEY-SET queries (exact dedup, cross-corpus dedup,
  *    contamination) stream the corpus as 4 files ×
  *    `maxFilesPerTrigger=1` — slicing-invariant by design (constant
  *    event time), so the surviving key set must equal the batch truth
  *    no matter how arrival is sliced;
  *  - the STATE-MACHINE queries (EWMA fold, funnel) stream events as 4
  *    time-EPOCH files with strictly increasing modification times, so
  *    the file source feeds epochs in event-time order (the machines'
  *    documented arrival contract) and per-user state must carry
  *    correctly across batch boundaries to reproduce the batch fold.
  *
  * Every test asserts ≥2 micro-batches actually executed (from the
  * query progress log), so "multi-batch" can never silently degrade
  * back to one batch. */
class MultiBatchParitySpec extends SparkSpec {

  private def rmTree(p: Path): Unit =
    if (Files.exists(p)) {
      // symlink-safe: delete a link itself, never recurse through it
      if (Files.isDirectory(p) && !Files.isSymbolicLink(p))
        Files.list(p).forEach(rmTree(_))
      Files.delete(p)
    }

  test("exact dedup over 4 micro-batches: cross-batch state dedupes, key set equals batch truth") {
    val (table, batches) = StreamParity.runToTableCounted(
      DedupStreams.exactDedup(StreamParity.streamDocsMultiBatch(spark, sfDir)),
      "mb_exact")
    assert(batches >= 2, s"expected multi-batch execution, got $batches")
    val got = table.select("fp").collect().map(_.getString(0)).toSet
    val want = graft.sources.Tables.documents(spark, sfDir)
      .select(md5(col("text").cast("binary")).as("fp"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(got == want)
  }

  test("exact dedup drops a later batch's duplicates against an earlier batch's state") {
    // the sf corpus has no exact-content dups (500/500 distinct md5),
    // so the parity test above can't witness a cross-batch DROP —
    // build one: file 0 = the corpus, file 1 = the same texts under
    // fresh doc_ids, mtime-ordered so they arrive as separate batches.
    // Every file-1 row is then a duplicate of a file-0 row, and
    // first-arrival-wins must emit each fp exactly ONCE.
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val dir = Files.createTempDirectory("graft-mb-dups").toString
    try {
      Seq(0L, 1L).foreach { k =>
        val part = s"$dir/stage_$k"
        docs.withColumn("doc_id", col("doc_id") + lit(k * 1000000L))
          .coalesce(1).write.parquet(part)
        val file = Files.list(Paths.get(part))
          .filter(_.toString.endsWith(".parquet")).iterator().next
        val target = Paths.get(s"$dir/copy_$k.parquet")
        Files.move(file, target)
        Files.setLastModifiedTime(target,
          FileTime.fromMillis(1700000000000L + k * 60000L))
        rmTree(Paths.get(part))
      }
      val onDisk = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(onDisk)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
        .select("doc_id", "ts", "text")
      val (table, batches) = StreamParity.runToTableCounted(
        DedupStreams.exactDedup(stream), "mb_dup_drop")
      assert(batches >= 2, s"expected multi-batch execution, got $batches")
      val rows = table.select("fp").collect().map(_.getString(0))
      val want = docs.select(md5(col("text").cast("binary")).as("fp"))
        .distinct().collect().map(_.getString(0)).toSet
      // each fp exactly once: the second batch's 500 copies were all
      // dropped against the first batch's watermark-held key state
      assert(rows.length == want.size, s"${rows.length} rows vs ${want.size} fps")
      assert(rows.toSet == want)
    } finally rmTree(Paths.get(dir))
  }

  test("cross-corpus dedup over 4 micro-batches: stream-static anti join + watermark state hold") {
    val corpusFps = graft.sources.Tables.documents(spark, sfDir)
      .where(col("doc_id") % 5 =!= 4)
      .select(md5(col("text").cast("binary")).as("fp"))
    val incoming = StreamParity.streamDocsMultiBatch(spark, sfDir)
      .where(col("doc_id") % 5 === 4)
    val (table, batches) = StreamParity.runToTableCounted(
      DedupStreams.crossDedupIngest(incoming, corpusFps), "mb_cross")
    assert(batches >= 2, s"expected multi-batch execution, got $batches")
    val got = table.select("fp").collect().map(_.getString(0)).toSet
    val want = StreamParity.queries("st_cross_dedup")(spark, sfDir)
      .collect().map(_.getString(0)).toSet
    assert(got == want)
  }

  test("contamination over 4 micro-batches: flagged doc set is slicing-invariant") {
    val bench = graft.sources.Tables.documents(spark, sfDir)
      .where(col("doc_id") % 20 === 0)
      .select(explode(expr("word_shingles(text, 3)")).as("shingle"))
      .distinct()
    val incoming = StreamParity.streamDocsMultiBatch(spark, sfDir)
      .where(col("doc_id") % 20 =!= 0)
    val (table, batches) = StreamParity.runToTableCounted(
      DedupStreams.contaminated(incoming, bench), "mb_contam")
    assert(batches >= 2, s"expected multi-batch execution, got $batches")
    val got = table.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = StreamParity.queries("st_contaminated")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  /** events split into `n` time-epoch files (global (ts, event_id)
    * order, contiguous quartiles) dropped into one watch directory
    * with STRICTLY INCREASING mtimes — the file source picks oldest
    * first, so `maxFilesPerTrigger=1` replays the corpus as ordered
    * epochs: the drop-directory ingest the state machines document as
    * their arrival contract. */
  private def epochedEventsDir(n: Int): String = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val total = ev.count()
    val dir = Files.createTempDirectory("graft-mb-events").toString
    val ranked = ev
      .withColumn("rn", row_number().over(
        Window.orderBy(col("ts"), col("event_id"))))
      .withColumn("epoch", (((col("rn") - 1) * n) / total).cast("int"))
      .drop("rn")
    for (k <- 0 until n) {
      val part = s"$dir/stage_$k"
      ranked.where(col("epoch") === k).drop("epoch")
        .coalesce(1).write.parquet(part)
      val file = Files.list(Paths.get(part))
        .filter(_.toString.endsWith(".parquet")).iterator().next
      val target = Paths.get(s"$dir/epoch_$k.parquet")
      Files.move(file, target)
      Files.setLastModifiedTime(target, FileTime.fromMillis(1700000000000L + k * 60000L))
      rmTree(Paths.get(part))
    }
    dir
  }

  private def streamEpochs(dir: String): DataFrame = {
    val onDisk = spark.read.parquet(dir).schema
    graft.sources.Tables.normalizeTs(
      spark.readStream.schema(onDisk).option("maxFilesPerTrigger", "1")
        .parquet(dir), "ts")
  }

  private def asEvents(df: DataFrame): Dataset[Event] = {
    import spark.implicits._
    df.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"), col("props")).as[Event]
  }

  test("EWMA fold state carries across 4 ordered micro-batches and equals the batch fold") {
    val dir = epochedEventsDir(4)
    try {
      val (table, batches) = StreamParity.runToTableCounted(
        EventStreams.ewmaUserState(asEvents(streamEpochs(dir))).toDF(),
        "mb_ewma", mode = "update")
      assert(batches >= 2, s"expected multi-batch execution, got $batches")
      val got = table
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("ewma_micro"))).as("m"))
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getStruct(1).getLong(0), r.getStruct(1).getLong(1)))).toMap
      val want = graft.operators.Events.queries("ev_ewma")(spark, sfDir)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == want)
      // the split is real: at least one user's history must span epochs,
      // otherwise cross-batch state was never exercised
      val spanning = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
        .groupBy("user_id").agg(countDistinct(col("f")).as("nf"))
        .where(col("nf") >= 2).count()
      assert(spanning > 0, "no user spans two epoch files; spec is vacuous")
    } finally rmTree(Paths.get(dir))
  }

  test("funnel state machine carries across 4 ordered micro-batches and equals the batch funnel") {
    val dir = epochedEventsDir(4)
    try {
      val (table, batches) = StreamParity.runToTableCounted(
        EventStreams.funnelStages(asEvents(streamEpochs(dir)))
          .toDF("user_id", "stage"),
        "mb_funnel", mode = "update")
      assert(batches >= 2, s"expected multi-batch execution, got $batches")
      val got = table
        .groupBy("user_id").agg(max(col("stage")).as("stage"))
        .groupBy("stage").agg(count(lit(1)).as("n_users"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val want = graft.operators.Events.queries("ev_funnel")(spark, sfDir)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally rmTree(Paths.get(dir))
  }

  test("session windows merge across forced epoch micro-batches (st_sessions_mb)") {
    val (table, batches) = StreamParity.runToTableCounted(
      EventStreams.sessionCounts(
        StreamParity.streamEventsEpochsWithSentinel(spark, sfDir)),
      "mb_sessions")
    // 4 epochs + the sentinel file, one micro-batch each
    assert(batches >= StreamParity.SessionEpochs + 1,
      s"only $batches micro-batches — epoch slicing degraded")
    val got = table.where(col("user_id") >= 0)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    val want = graft.sources.Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start"), col("w.end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // NON-VACUOUS: at least one session must actually straddle an epoch
    // boundary (events in two different micro-batches), or the
    // cross-batch merge path was never exercised. Replay the epoch
    // assignment and gap-sessionization locally.
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bounds = StreamParity.sessionEpochBounds(
      graft.sources.Tables.events(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value", "props"))
    val epochOf = evs.sortBy(e => (e._2, e._3)).zipWithIndex
      .map { case (e, i) =>
        ((e._1, e._2, e._3), bounds.count(_ <= i + 1).toLong) }
      .toMap
    val spanning = evs.groupBy(_._1).values.map { g =>
      val sorted = g.sortBy(e => (e._2, e._3))
      // split into gap sessions (>= 30 min starts a new one)
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long)]]) {
        case (acc, e) => acc match {
          case h :: t if e._2 - h.head._2 < 1800L * 1000000 =>
            ((e._1, e._2, e._3) :: h) :: t
          case _ => List((e._1, e._2, e._3)) :: acc
        }
      }
      sessions.count(ses => ses.map(epochOf).distinct.size > 1)
    }.sum
    assert(spanning > 0, "no session spans two epoch files; spec is vacuous")
  }

  test("interval-join state carries a view across epoch micro-batches (st_interval_join_mb)") {
    val (table, batches) = StreamParity.runToTableCounted(
      EventStreams.viewPurchaseAttribution(
        StreamParity.streamEventsEpochsWithSentinel(spark, sfDir)
          .where(col("event_type") === "view"),
        StreamParity.streamEventsEpochsWithSentinel(spark, sfDir)
          .where(col("event_type") === "purchase")),
      "mb_interval")
    assert(batches >= 2, s"only $batches micro-batches — epoch slicing degraded")
    val got = table.select("purchase_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.sources.Tables.events(spark, sfDir)
    val v = ev.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val want = v.join(p, "user_id")
      .where(col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
      .select("purchase_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // NON-VACUOUS: at least one matched pair must have its view and
    // purchase in DIFFERENT epoch files — the held-state path
    val bounds = StreamParity.sessionEpochBounds(
      graft.sources.Tables.events(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value", "props"))
    val ranks = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(e => (e._2, e._1)).zipWithIndex
      .map { case ((id, _), i) => (id, bounds.count(_ <= i + 1)) }.toMap
    val crossBatch = want.count { case (pid, vid) => ranks(pid) != ranks(vid) }
    assert(crossBatch > 0, "no matched pair spans two epochs; spec is vacuous")
  }
}
