package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a whole-operator extension needs:
  * turning a custom [[LogicalPlan]] into a user-facing [[DataFrame]].
  * `SparkSessionExtensions` covers parser/analyzer/optimizer/planner
  * injection but offers no public constructor for DataFrames over
  * custom logical nodes, so every library that ships one (the standard
  * public technique — e.g. connectors and join-extension libraries)
  * hosts this single call inside the `org.apache.spark.sql` package.
  * Used only by [[graft.plans.AsOf.join]] and
  * [[graft.Checkpoints.checkpointFresh]]. */
object GraftDatasetBridge {
  private lazy val log =
    org.slf4j.LoggerFactory.getLogger(GraftDatasetBridge.getClass)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Rebuild an eagerly-localCheckpoint'ed frame's [[execution.LogicalRDD]]
    * WITHOUT the origin plan's propagated statistics (`originStats =
    * None` — the node then reports the materialized RDD via the default
    * leaf estimate instead of the pre-checkpoint plan's estimate).
    *
    * Why this exists: Spark's checkpoint path copies the ORIGIN
    * optimized plan's estimated `sizeInBytes` into the LogicalRDD.
    * Iterative operators whose round N+1 JOINS two round-N checkpoints
    * therefore SQUARE the estimate every round — `log(sizeInBytes)`
    * doubles per iteration, Catalyst's BigInt stats arithmetic slows
    * quadratically, and after ~25 rounds `BigInteger` overflows its
    * supported range and PLANNING throws (measured: sim_dedup_corpus
    * at the 30× stress corpus, 800+ s of `BigInteger.multiply` inside
    * `SizeInBytesOnlyStatsPlanVisitor` before the
    * `ArithmeticException`). Severing the inherited stats at each
    * round's checkpoint bounds the estimate for the whole loop.
    *
    * Returns the input unchanged when the plan is not a bare
    * LogicalRDD leaf (callers pass freshly checkpointed frames). */
  def withoutOriginStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case l: execution.LogicalRDD =>
        val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
        // better than severing to the session default: the eager
        // checkpoint's blocks are already materialized, so the ACTUAL
        // byte size is known to the block manager — substituting it
        // keeps in-loop broadcast decisions working (the default
        // estimate is Long.MaxValue, which disables them)
        val measured = cs.sparkContext.getRDDStorageInfo
          .find(_.id == l.rdd.id)
          .map(i => i.memSize + i.diskSize)
          .filter(_ > 0L)
          .map(BigInt(_))
        // Block-manager reporting is asynchronous; a miss (or a 0-byte
        // read) must not silently sever to originStats=None — that
        // reports defaultSizeInBytes = Long.MaxValue and DISABLES the
        // in-loop broadcast decisions this rebuild exists to preserve
        // (advice r15). Fall back to the origin plan's own estimate
        // CAPPED at 8 GiB: small origins keep their broadcastability,
        // snowballed estimates (the bug this fixes) are bounded, and
        // 8 GiB is far above any broadcast threshold so nothing huge
        // is ever wrongly broadcast. Warn so a degraded loop is
        // diagnosable instead of just slower.
        val size = measured.getOrElse {
          val cap = BigInt(8L << 30)
          val origin = l.stats.sizeInBytes
          log.warn(
            s"withoutOriginStats: no block-manager size for RDD ${l.rdd.id}; " +
              s"falling back to min(origin=$origin, cap=$cap)")
          origin.min(cap)
        }
        val stats =
          Some(catalyst.plans.logical.Statistics(sizeInBytes = size))
        classic.Dataset.ofRows(cs,
          execution.LogicalRDD(l.output, l.rdd, l.outputPartitioning,
            l.outputOrdering, l.isStreaming, l.stream)(cs, stats, None))
      case _ => df
    }
}
