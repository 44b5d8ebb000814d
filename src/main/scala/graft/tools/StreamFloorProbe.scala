package graft.tools

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool (optimization round 16): decompose the measured
  * ~1.0-1.5 s/micro-batch fixed floor of the multi-stateful `st_*`
  * parity queries into its `durationMs` components — queryPlanning,
  * getBatch, addBatch, walCommit, commitOffsets — plus the state
  * operators' commit times, straight from the progress stream the
  * engine already emits. r15/r16 attributed the floor as "Spark's
  * multi-stateful scheduling floor" by A/B arithmetic (epoch count ×
  * floor); this probe shows WHERE inside a trigger the time actually
  * goes, which is what decides whether any of it is addressable
  * (e.g. checkpoint-log fsyncs on ext4 vs driver-side incremental
  * planning, which is structural).
  *
  * Usage: runMain graft.tools.StreamFloorProbe <sfDir> <name>...
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(cpus, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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

    names.foreach { n =>
      val q = graft.streaming.StreamParity.queries(n)
      def run(): Double = {
        events.synchronized(events.clear())
        val t0 = System.nanoTime()
        q(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        run() // warm
        val timedS = run()
        val ps = events.synchronized(events.map(_.progress).toVector)
        println(f"[floor] $n timed=$timedS%.2fs batches=${ps.size}%d")
        ps.zipWithIndex.foreach { case (p, i) =>
          import scala.jdk.CollectionConverters._
          val dm = p.durationMs.asScala.toMap
          def g(k: String): Long = dm.get(k).map(_.longValue).getOrElse(0L)
          val stCommit = p.stateOperators.map(_.commitTimeMs).sum
          println(f"[floor]   b$i%-2d in=${p.numInputRows}%7d " +
            f"trig=${g("triggerExecution")}%5d plan=${g("queryPlanning")}%5d " +
            f"getB=${g("getBatch")}%4d latest=${g("latestOffset")}%4d " +
            f"addB=${g("addBatch")}%5d wal=${g("walCommit")}%4d " +
            f"commit=${g("commitOffsets")}%4d stateCommit=$stCommit%5d")
        }
      } catch {
        case e: Exception =>
          println(s"[floor] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
