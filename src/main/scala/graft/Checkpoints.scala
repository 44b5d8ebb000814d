package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Handle-based checkpoint-residency discipline for iterative operators
  * (connected components, PageRank, k-means): each round eagerly
  * `localCheckpoint`s its state, and the PREVIOUS round's blocks must be
  * dropped once the new round has materialized, or resident state grows
  * O(rounds × |state|).
  *
  * Tracking is by the checkpointed frame ITSELF: an eagerly
  * `localCheckpoint`ed DataFrame's analyzed plan is a [[LogicalRDD]] over
  * exactly the checkpointed RDD, so the handle is reachable race-free
  * from the frame. Never diff the session-global persistent-RDD registry
  * (`sc.getPersistentRDDs`) around the checkpoint call — on a shared
  * SparkSession any RDD persisted CONCURRENTLY by another query lands in
  * the diff and gets blocking-unpersisted, silently evicting unrelated
  * cached data. */
object Checkpoints {
  /** Eager `localCheckpoint` + STATS SEVER (see
    * [[org.apache.spark.sql.GraftDatasetBridge.withoutOriginStats]]):
    * the returned frame is still a bare [[LogicalRDD]] over the
    * persisted blocks — [[drop]] accepts it unchanged — but its
    * statistics no longer inherit the origin plan's ESTIMATE.
    * Mandatory inside iterative loops: a round that joins two
    * checkpointed frames squares the inherited estimate, so
    * log(sizeInBytes) doubles per round until Catalyst's BigInt stats
    * arithmetic dominates planning and finally overflows (the 30×
    * stress corpus crashed sim_dedup_corpus this way). */
  def checkpointFresh(df: DataFrame): DataFrame =
    org.apache.spark.sql.GraftDatasetBridge.withoutOriginStats(
      df.localCheckpoint(true))

  /** Postfix spelling: `df.checkpointFresh()` — a drop-in replacement
    * for `df.localCheckpoint(true)` at every operator checkpoint. */
  implicit class CheckpointOps(private val df: DataFrame) extends AnyVal {
    def checkpointFresh(): DataFrame = Checkpoints.checkpointFresh(df)
  }

  /** The backing RDD of an eagerly `localCheckpoint`ed DataFrame, if the
    * frame is indeed checkpoint-shaped (a bare [[LogicalRDD]] leaf). */
  def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Drop a finished round's checkpoint blocks. Blocking, so the removal
    * completes before the next round's work rather than running on
    * block-manager threads during it.
    *
    * STRICT: every caller passes a frame it just eagerly
    * `localCheckpoint`ed, so a non-[[LogicalRDD]] plan here means the
    * handle was derived (a select over the checkpoint) or a Spark
    * upgrade changed the checkpoint plan shape — either way the
    * O(rounds × |state|) residency leak this class exists to prevent
    * would silently return. Fail loudly instead of no-op'ing. */
  def drop(df: DataFrame): Unit =
    backingRdd(df) match {
      case Some(rdd) => rdd.unpersist(blocking = true)
      case None => throw new IllegalStateException(
        "Checkpoints.drop: frame is not a bare LogicalRDD leaf — " +
        "pass the localCheckpoint()ed frame itself, not a derivation; " +
        s"got plan class ${df.queryExecution.analyzed.getClass.getName}")
    }
}
