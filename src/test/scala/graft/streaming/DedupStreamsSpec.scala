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
}
