package graft

/** O1 progress observation: the listener must see every job, stage and
  * task of an action, the completion stream must cover the final total,
  * and failures must be flagged — the reference's progress contract
  * (`progress_job_iterator.py`: yield each done block exactly once,
  * len == total). */
class ProgressReporterSpec extends SparkSpec {

  test("observe: counts converge and completions cover the total") {
    var last: ProgressReporter.Snapshot = null
    var batch: Seq[(Int, Int)] = Nil
    val n = ProgressReporter.observe(spark) { (snap, done) =>
      last = snap; batch = done
    } {
      graft.sources.Tables.lineitem(spark, sfDir)
        .groupBy("l_returnflag").count().collect().length
    }
    assert(n > 0)
    assert(last != null && last.allDone)
    assert(last.jobsStarted >= 1 && last.jobsDone == last.jobsStarted)
    assert(last.stagesDone >= 2, "a groupBy has at least map+reduce stages")
    assert(last.tasksDone == last.tasksTotal, s"$last")
    assert(last.fraction == 1.0)
    // every completed task yielded exactly once, like the reference's
    // per-block yield
    assert(batch.size == last.tasksDone)
    assert(batch.distinct.size == batch.size)
  }

  test("snapshot mid-flight is monotone and bounded by the total") {
    val rep = new ProgressReporter
    spark.sparkContext.addSparkListener(rep)
    try {
      graft.sources.Tables.orders(spark, sfDir)
        .groupBy("o_orderpriority").count().collect()
      val deadline = System.nanoTime() + 10e9.toLong
      while (!rep.snapshot.allDone && System.nanoTime() < deadline)
        Thread.sleep(10)
      val s = rep.snapshot
      assert(s.tasksDone <= s.tasksTotal)
      assert(!rep.anyFailed)
    } finally spark.sparkContext.removeSparkListener(rep)
  }

  test("failed job is flagged") {
    val rep = new ProgressReporter
    spark.sparkContext.addSparkListener(rep)
    try {
      intercept[Exception] {
        // range is distributed (unlike a local Seq, which collects
        // driver-side without ever launching a job)
        spark.range(0, 100, 1, 4)
          .selectExpr("assert_true(id < 50) AS a").collect()
      }
      val deadline = System.nanoTime() + 10e9.toLong
      while (rep.snapshot.jobsDone < rep.snapshot.jobsStarted &&
             System.nanoTime() < deadline) Thread.sleep(10)
      assert(rep.anyFailed)
    } finally spark.sparkContext.removeSparkListener(rep)
  }
}
