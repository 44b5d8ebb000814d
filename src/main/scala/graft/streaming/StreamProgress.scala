package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Streaming counterpart of [[graft.ProgressReporter]] (O1): the
  * reference's progress surface covers only finite batch jobs
  * (`progress_job_iterator.py` iterates until a phase's blocks run out);
  * a continuous query instead reports per-micro-batch throughput and
  * watermark movement. Spark pushes that via
  * [[StreamingQueryListener.QueryProgressEvent]] — this listener keeps
  * the latest snapshot plus running totals, the shape a monitoring loop
  * or progress bar consumes.
  *
  * Same design rule as the batch reporter: lock-free state updated on
  * the listener bus, zero polling, cheap enough to stay attached for a
  * session's lifetime.
  */
final class StreamProgress extends StreamingQueryListener {

  final case class Tick(
      batchId: Long, numInputRows: Long, watermark: String, timestamp: String)

  private val rowsTotal = new AtomicLong
  private val batches = new AtomicLong
  private val started = new AtomicLong
  private val terminated = new AtomicLong
  private val lastTick = new AtomicReference[Tick](null)
  private val ticks = new ConcurrentLinkedQueue[Tick]()

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    started.incrementAndGet()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val t = Tick(p.batchId, p.numInputRows,
      Option(p.eventTime.get("watermark")).getOrElse(""), p.timestamp)
    rowsTotal.addAndGet(p.numInputRows)
    batches.incrementAndGet()
    lastTick.set(t)
    ticks.add(t)
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    terminated.incrementAndGet()

  def totalInputRows: Long = rowsTotal.get()
  def batchesSeen: Long = batches.get()
  def queriesStarted: Long = started.get()
  def queriesTerminated: Long = terminated.get()
  def latest: Option[Tick] = Option(lastTick.get())

  /** Drain ticks accumulated since the last call (progress-bar batch). */
  def drain(): Seq[Tick] = {
    val out = Seq.newBuilder[Tick]
    var t = ticks.poll()
    while (t != null) { out += t; t = ticks.poll() }
    out.result()
  }
}

object StreamProgress {
  /** Attach a listener for the duration of `body`; detach after. */
  def observe[T](spark: SparkSession)(body: StreamProgress => T): T = {
    val l = new StreamProgress
    spark.streams.addListener(l)
    try body(l)
    finally spark.streams.removeListener(l)
  }
}
