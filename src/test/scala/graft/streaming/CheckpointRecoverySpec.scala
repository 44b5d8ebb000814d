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
}
