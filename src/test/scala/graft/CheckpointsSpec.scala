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
}
