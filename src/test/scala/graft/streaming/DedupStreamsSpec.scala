package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming dedup: exact and near-dup collapse under MemoryStream
  * micro-batches, plus bit-parity of the row-local SimHash with the
  * batch aggregation. */
class DedupStreamsSpec extends SparkSpec {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("exact streaming dedup: first writer wins within the horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val q = DedupStreams.exactDedup(in.toDF)
      .writeStream.format("memory").queryName("sd_exact").outputMode("append").start()
    try {
      in.addData(
        StreamDoc(1, ts("10:00"), "alpha beta gamma"),
        StreamDoc(2, ts("10:01"), "alpha beta gamma"), // exact dup
        StreamDoc(3, ts("10:02"), "delta epsilon"))
      q.processAllAvailable()
      in.addData(StreamDoc(4, ts("10:03"), "alpha beta gamma")) // dup again
      q.processAllAvailable()
      val ids = spark.table("sd_exact").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("near-dup streaming dedup: token order/repetition collapse") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val q = DedupStreams.nearDedup(in.toDS)
      .writeStream.format("memory").queryName("sd_near").outputMode("append").start()
    try {
      in.addData(
        StreamDoc(1, ts("10:00"), "the quick brown fox jumps"),
        // same distinct token set (reordered + repeated) → same simhash
        StreamDoc(2, ts("10:01"), "fox jumps the the quick brown"),
        StreamDoc(3, ts("10:02"), "an entirely different document body"))
      q.processAllAvailable()
      val ids = spark.table("sd_near").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("row-local simhash60 is bit-identical to the batch aggregation") {
    val batch = graft.operators.Dedup.simhashes(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(batch.nonEmpty)
    texts.foreach { case (id, text) =>
      batch.get(id).foreach { sig =>
        assert(DedupStreams.simhash60(text) == sig, s"doc $id signature drift")
      }
    }
  }

  test("stream-static contamination matches the batch operator's doc set") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // static benchmark dictionary from the batch corpus (doc_id % 20 = 0)
    val bench = graft.sources.Tables.documents(spark, sfDir)
      .where(col("doc_id") % 20 === 0)
      .select(explode(expr("word_shingles(text, 3)")).as("shingle"))
      .distinct()
    val corpus = graft.sources.Tables.documents(spark, sfDir)
      .where(col("doc_id") % 20 =!= 0)
      .selectExpr("doc_id", "text").collect()
    val in = MemoryStream[StreamDoc]
    val q = DedupStreams.contaminated(in.toDF, bench)
      .writeStream.format("memory").queryName("sd_contam").outputMode("append").start()
    try {
      // stream the whole non-benchmark corpus through in two micro-batches
      val (h1, h2) = corpus.splitAt(corpus.length / 2)
      in.addData(h1.zipWithIndex.map { case (r, i) =>
        StreamDoc(r.getLong(0), ts("10:00"), r.getString(1)) }.toSeq: _*)
      q.processAllAvailable()
      in.addData(h2.map(r => StreamDoc(r.getLong(0), ts("10:01"), r.getString(1))).toSeq: _*)
      q.processAllAvailable()
      val streamIds = spark.table("sd_contam").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val batchIds = graft.operators.Pipeline.queries("pl_contamination")(spark, sfDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamIds == batchIds,
        s"stream-only=${streamIds -- batchIds} batch-only=${batchIds -- streamIds}")
    } finally q.stop()
  }

  test("crossDedupIngest throughput guard: stream-static anti + state dedup above floor") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // static side: 20k corpus fingerprints (md5 hex strings)
    val corpusFps = spark.range(20000)
      .select(md5(concat(lit("corpus-doc-"), col("id"))).as("fp"))
    val in = MemoryStream[StreamDoc]
    val q = DedupStreams.crossDedupIngest(in.toDF, corpusFps)
      .writeStream.format("memory").queryName("sd_ingest_rate")
      .outputMode("append").start()
    try {
      val base = ts("10:00").getTime
      // 50% in-stream dup rate; distinct from the static corpus texts
      def docs(lo: Int, hi: Int) = (lo until hi).map { i =>
        StreamDoc(i, new Timestamp(base + i * 100L),
          s"incoming crawl document body number ${i / 2} fresh tokens")
      }
      in.addData(docs(0, 2000): _*) // warm-up batch outside the clock
      q.processAllAvailable()
      val n = 36000
      val t0 = System.nanoTime()
      (2000 until (2000 + n) by 12000).foreach { lo =>
        in.addData(docs(lo, lo + 12000): _*)
        q.processAllAvailable()
      }
      val rate = n / ((System.nanoTime() - t0) / 1e9)
      info(f"crossDedupIngest sustained rate: $rate%.0f rows/s")
      // the static side re-plans per micro-batch (broadcast), so the
      // floor sits below nearDedup's. Deliberately ~10x under the
      // calm-box rate: this box swings with load (BASELINE.md), and a
      // wall-clock floor must only trip on an order-of-magnitude
      // state/join regression, never on a loaded CI window.
      assert(rate > 1000, f"throughput regression: $rate%.0f rows/s")
    } finally q.stop()
  }

  test("nearDedup throughput guard: sustained MemoryStream rate above floor") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val q = DedupStreams.nearDedup(in.toDS)
      .writeStream.format("memory").queryName("sd_rate").outputMode("append").start()
    try {
      val base = ts("10:00").getTime
      // 50% near-dup rate: two ids share each body, ts advances 100 ms/doc
      def docs(lo: Int, hi: Int) = (lo until hi).map { i =>
        StreamDoc(i, new Timestamp(base + i * 100L),
          s"streaming corpus document body number ${i / 2} variant tokens")
      }
      // warm-up micro-batch: state-store + codegen init outside the clock
      in.addData(docs(0, 2000): _*)
      q.processAllAvailable()
      val n = 48000
      val t0 = System.nanoTime()
      (2000 until (2000 + n) by 12000).foreach { lo =>
        in.addData(docs(lo, lo + 12000): _*)
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val rate = n / secs
      info(f"nearDedup sustained rate: $rate%.0f rows/s ($n rows in $secs%.2f s)")
      // floor is ~5x below the measured local[4] rate (see BASELINE.md) —
      // loose enough for machine noise, tight enough that a state-bloat
      // regression (an order of magnitude, historically) trips it
      assert(rate > 4000, f"throughput regression: $rate%.0f rows/s")
    } finally q.stop()
  }
}
