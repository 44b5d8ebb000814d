package graft.tools

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool (r15 verdict item 5 — the streaming tier's first scale
  * audit): run declared `st_*` parity queries against a given sf dir
  * (the ScaleStress 10× corpus being the interesting one) and harvest
  * the progress metrics the parity harness consumes internally —
  * micro-batch count, input rows, per-state-operator PEAK state rows
  * and bytes, and end-to-end seconds (warm = second run, the parity
  * harness's own result-cache and file-listing effects excluded).
  * A session-level [[StreamingQueryListener]] sees every progress
  * event without touching the parity code, so the probe measures the
  * EXACT declared query bodies.
  *
  * Usage: runMain graft.tools.StreamScaleProbe <sfDir> <name>...
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(cpus, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Snap(batches: Int, inputRows: Long,
        peakStateRows: Long, peakStateBytes: Long, ops: String)
    val events = ArrayBuffer.empty[
      StreamingQueryListener.QueryProgressEvent]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        events.synchronized { events += e }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    def snap(): Snap = events.synchronized {
      val ps = events.map(_.progress)
      val batches = ps.count(_.numInputRows > 0)
      val rows = ps.map(_.numInputRows).sum
      // peak = max over batches of the SUM across operators (the
      // resident footprint at that batch), not max-per-operator
      val peakRows =
        if (ps.isEmpty) 0L
        else ps.map(_.stateOperators.map(_.numRowsTotal).sum).max
      val peakBytes =
        if (ps.isEmpty) 0L
        else ps.map(_.stateOperators.map(_.memoryUsedBytes).sum).max
      val ops = ps.flatMap(_.stateOperators.map(_.operatorName))
        .distinct.mkString(",")
      Snap(batches, rows, peakRows, peakBytes, ops)
    }

    names.foreach { n =>
      val q = graft.streaming.StreamParity.queries(n)
      def run(): (Double, Long, Snap) = {
        events.synchronized(events.clear())
        val t0 = System.nanoTime()
        val out = q(spark, d).count()
        ((System.nanoTime() - t0) / 1e9, out, snap())
      }
      try {
        val (warmS, _, _) = run()
        val (timedS, out, s) = run()
        println(f"[stscale] $n warm=$warmS%.2fs timed=$timedS%.2fs " +
          f"batches=${s.batches}%d in=${s.inputRows}%d out=$out%d " +
          f"peak_state_rows=${s.peakStateRows}%d " +
          f"peak_state_mb=${s.peakStateBytes / 1048576.0}%.1f ops=${s.ops}")
      } catch {
        case e: Exception =>
          println(s"[stscale] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
