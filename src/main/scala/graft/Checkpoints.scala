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
  /** The backing RDD of an eagerly `localCheckpoint`ed DataFrame, if the
    * frame is indeed checkpoint-shaped (a bare [[LogicalRDD]] leaf). */
  def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Drop a finished round's checkpoint blocks. Blocking, so the removal
    * completes before the next round's work rather than running on
    * block-manager threads during it. */
  def drop(df: DataFrame): Unit =
    backingRdd(df).foreach(_.unpersist(blocking = true))
}
