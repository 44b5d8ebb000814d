package graft

/** The checkpoint-residency discipline must be observable: drop() really
  * frees the blocks of an eagerly localCheckpoint'ed frame, and refuses
  * (loudly) a frame it cannot free — a silent no-op here is exactly the
  * O(rounds × |state|) leak the class exists to prevent. */
class CheckpointsSpec extends SparkSpec {

  private def residentRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("drop() removes the blocks of an eagerly localCheckpoint'ed frame") {
    import spark.implicits._
    val before = residentRddIds
    val ck = (1 to 1000).toDF("v").localCheckpoint(true)
    val rdd = Checkpoints.backingRdd(ck)
      .getOrElse(fail("localCheckpoint'ed frame should be a LogicalRDD leaf"))
    val added = residentRddIds -- before
    assert(added.contains(rdd.id),
      s"checkpoint RDD ${rdd.id} not in persistent registry $added")
    // the frame still computes from the checkpoint blocks
    assert(ck.count() == 1000)
    Checkpoints.drop(ck)
    assert(!residentRddIds.contains(rdd.id),
      "drop() left the checkpoint blocks resident")
  }

  test("drop() fails loudly on a derived (non-checkpoint-shaped) frame") {
    import spark.implicits._
    val ck = (1 to 10).toDF("v").localCheckpoint(true)
    val derived = ck.select(org.apache.spark.sql.functions.col("v") * 2)
    val e = intercept[IllegalStateException] { Checkpoints.drop(derived) }
    assert(e.getMessage.contains("LogicalRDD"))
    Checkpoints.drop(ck) // cleanup — and the straight handle still works
  }

  test("ENGINE BEHAVIOR PIN: localCheckpoint inherits the origin plan's stats estimate; checkpointFresh severs it") {
    // Spark copies the ORIGIN optimized plan's estimated sizeInBytes
    // into the checkpoint's LogicalRDD. An iterative operator whose
    // round N+1 joins two round-N checkpoints therefore SQUARES the
    // estimate per round — log(sizeInBytes) doubles each iteration
    // until Catalyst's BigInt stats arithmetic dominates planning and
    // finally overflows BigInteger (reproduced: sim_dedup_corpus on
    // the 30× stress corpus, 800+ s of BigInteger.multiply inside
    // SizeInBytesOnlyStatsPlanVisitor, then "BigInteger would
    // overflow supported range"). checkpointFresh rebuilds the
    // LogicalRDD with the MATERIALIZED block size instead.
    // FIXED ON UPGRADE: if the inheritance assertion fails, Spark
    // stopped propagating origin stats — checkpointFresh can fall
    // back to bare localCheckpoint.
    import spark.implicits._
    def sizeOf(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val base = (1 to 1000).toDF("v")
    val joined = base.as("a").crossJoin(base.as("b")) // estimate ≈ |base|²
    val inherited = joined.localCheckpoint(true)
    val estimate = sizeOf(joined)
    assert(sizeOf(inherited) == estimate,
      "FIXED ON UPGRADE: localCheckpoint no longer inherits the origin " +
        s"plan's estimate (got ${sizeOf(inherited)}, origin $estimate) — " +
        "re-evaluate whether checkpointFresh's stats sever is still needed")
    val fresh = Checkpoints.checkpointFresh(joined)
    assert(sizeOf(fresh) < estimate,
      s"checkpointFresh must replace the inherited estimate " +
        s"(got ${sizeOf(fresh)}, inherited $estimate)")
    // the severed frame still drops through the same handle
    assert(fresh.count() == 1000L * 1000L)
    Checkpoints.drop(fresh)
    Checkpoints.drop(inherited)
  }
}
