package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming progress surface: the listener must account for every
  * input row, observe batch progression and watermark movement, and see
  * query termination. */
class StreamProgressSpec extends SparkSpec {

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  private def ev(id: Long, t: String): Event =
    Event(id, ts(t), 1L, "click", 1.0, "{}")

  test("listener accounts rows, batches, watermark, and termination") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    StreamProgress.observe(spark) { prog =>
      val in = MemoryStream[Event]
      val q = EventStreams.tumblingCounts(in.toDF, lateness = "10 minutes")
        .writeStream.format("memory").queryName("prog_tumbling")
        .outputMode("append").start()
      try {
        in.addData(ev(1, "10:05"), ev(2, "10:40"))
        q.processAllAvailable()
        in.addData(ev(3, "11:15"), ev(4, "11:20"))
        q.processAllAvailable()
        // listener events are async relative to processAllAvailable
        val deadline = System.nanoTime() + 10e9.toLong
        while (prog.totalInputRows < 4 && System.nanoTime() < deadline)
          Thread.sleep(20)
        assert(prog.queriesStarted == 1)
        assert(prog.totalInputRows == 4, s"rows=${prog.totalInputRows}")
        assert(prog.batchesSeen >= 2)
        val ticksSoFar = prog.drain()
        assert(ticksSoFar.map(_.numInputRows).sum == 4)
        // watermark advanced past the first window after batch 2's data
        assert(prog.latest.exists(_.watermark.nonEmpty))
      } finally q.stop()
      val deadline = System.nanoTime() + 10e9.toLong
      while (prog.queriesTerminated < 1 && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(prog.queriesTerminated == 1)
    }
  }
}
