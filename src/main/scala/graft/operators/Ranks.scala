package graft.operators

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order ranking — the shared two-phase pattern that
  * `pl_shuffle_order` / `pl_pack_sequences` / `ev_late_arrivals` each
  * inlined, extracted so harness-side code (the streaming-parity epoch
  * builder) holds the same no-single-task-sort bar as the declared
  * queries (round-10 verdict item 4).
  *
  * Phase 1 range-partitions on the sort key (cluster-wide shuffle,
  * each split sorted locally by the window below); phase 2 lifts each
  * split's local ranks by the preceding splits' row counts. The ONLY
  * unpartitioned window runs over the |splits|-row lift table —
  * parallelism stays at cluster width where `row_number().over(
  * Window.orderBy(...))` would funnel the whole relation through one
  * task.
  */
object Ranks {

  /** Appends column `out` = the 1-based rank (long) of each row in the
    * total order given by `sortCols`, which must form a TOTAL key
    * (e.g. include a unique id as the final tie-break): with ties the
    * range partitioner could split equal keys across partitions and
    * the assigned ranks would be nondeterministic.
    *
    * Returns `(ranked, handle)`: the range-partitioned input is pinned
    * with one eager `localCheckpoint` (range boundaries are SAMPLED
    * per evaluation — the `shuffleOrderScan` discipline — so the local
    * ranks and the lift table must see the same split assignment), and
    * `handle` is that checkpointed frame. Callers that fully consume
    * `ranked` (collect / write-out) should release the blocks with
    * [[graft.Checkpoints.drop]]`(handle)`. */
  def globalRank(df: DataFrame, sortCols: Seq[String],
      out: String): (DataFrame, DataFrame) = {
    val cols = sortCols.map(col)
    val splits = df.sparkSession.sparkContext.defaultParallelism
    val marked = df
      .repartitionByRange(splits, cols: _*)
      .withColumn("_split", spark_partition_id())
      .checkpointFresh()
    // local rank: window PARTITIONED by split — each split sorts its
    // own rows, bounded by the split size, never the relation
    val local = marked.withColumn("_lr",
      row_number().over(Window.partitionBy("_split").orderBy(cols: _*)))
    // lift = rows in all earlier splits; |splits| rows, so this is the
    // one (broadcast-joined) unpartitioned window, over splits not data
    val lifts = marked.groupBy("_split").agg(count(lit(1)).as("_cnt"))
      .withColumn("_lift", coalesce(sum(col("_cnt")).over(
        Window.orderBy("_split").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("_split", "_lift")
    val ranked = local.join(broadcast(lifts), "_split")
      .withColumn(out, col("_lift") + col("_lr"))
      .drop("_split", "_lr", "_lift")
    (ranked, marked)
  }
}
