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
