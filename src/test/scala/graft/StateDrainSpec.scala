package graft

/** StateDrain is reflection-based bench tooling — this spec pins the
  * reflection contract against the ACTUAL Spark version on the
  * classpath, so a Spark upgrade that renames a private[spark] member
  * fails here loudly instead of silently degrading the bench's
  * inter-rep hygiene (healthy=false would only surface in bench JSON). */
class StateDrainSpec extends SparkSpec {

  private def shuffleCount: Int = {
    val env = org.apache.spark.SparkEnv.get
    val tracker = env.getClass.getMethod("mapOutputTracker").invoke(env)
    tracker.getClass.getMethods.find(_.getName == "shuffleStatuses").get
      .invoke(tracker)
      .asInstanceOf[scala.collection.concurrent.Map[AnyRef, AnyRef]].size
  }

  test("drain unregisters live shuffles synchronously and stays healthy") {
    import org.apache.spark.sql.functions._
    // materialize a real shuffle (grouped agg over a range). The val
    // pins the plan — and through it the ShuffleDependency — across
    // the asserts: with no live reference, a GC between collect() and
    // the first assert lets the ContextCleaner (the very mechanism the
    // drain mimics) unregister the shuffle asynchronously and fail the
    // precondition spuriously.
    val df = spark.range(10000).toDF("v")
      .groupBy(expr("v % 97")).agg(count(lit(1)))
    df.collect()
    assert(shuffleCount > 0, "expected live shuffle state before the drain")
    StateDrain(spark)
    assert(StateDrain.healthy,
      "drain degraded — a reflection target no longer resolves on this Spark")
    assert(shuffleCount == 0, "drain left shuffle state registered")
    assert(df.schema.nonEmpty) // keeps the pin live past the drain asserts
    // and the session still runs queries afterwards (nothing live was cut)
    assert(spark.range(100).toDF("v")
      .groupBy(expr("v % 7")).agg(count(lit(1))).count() == 7)
  }
}
