package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Job memoization: hit on resubmission, miss on input change, key
  * stability across cosmetic plan differences. */
class ResultCacheSpec extends SparkSpec {

  test("resubmitting the same job reuses the committed result") {
    val cache = Files.createTempDirectory("graft-cache").toString
    val q = sources.Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val (r1, hit1) = ResultCache.runCached(q, cache)
    assert(!hit1)
    val rows = r1.collect().map(_.toSeq).toSet
    val (r2, hit2) = ResultCache.runCached(q, cache)
    assert(hit2)
    assert(r2.collect().map(_.toSeq).toSet == rows)
  }

  test("changing the input invalidates the key") {
    val dir = Files.createTempDirectory("graft-cache-in")
    val cache = s"$dir/cache"
    def write(rows: Seq[(Long, String)]): Unit = {
      import spark.implicits._
      rows.toDF("id", "v").coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/t.parquet")
    }
    write(Seq((1L, "a"), (2L, "b")))
    def q = spark.read.parquet(s"$dir/t.parquet").groupBy("v").count()
    val k1 = ResultCache.fingerprint(q)
    val (_, h1) = ResultCache.runCached(q, cache)
    assert(!h1)
    write(Seq((1L, "a"), (2L, "b"), (3L, "b"))) // same schema, new data
    val k2 = ResultCache.fingerprint(q)
    assert(k1 != k2)
    val (r2, h2) = ResultCache.runCached(q, cache)
    assert(!h2)
    assert(r2.where("v = 'b'").head.getLong(1) == 2L)
  }

  test("cosmetically different but semantically equal plans share a key") {
    val a = sources.Tables.nation(spark, sfDir).select(col("n_name").as("x"))
    val b = sources.Tables.nation(spark, sfDir).select(col("n_name").as("y"))
    // canonicalization strips aliases/attribute ids
    assert(ResultCache.fingerprint(a) == ResultCache.fingerprint(b))
  }

  test("an uncommitted (crashed) cache entry is not treated as a hit") {
    val cache = Files.createTempDirectory("graft-cache-crash").toString
    val q = sources.Tables.region(spark, sfDir)
    val key = ResultCache.fingerprint(q)
    // simulate a writer that died before commit: directory, no _SUCCESS
    Files.createDirectories(Paths.get(s"$cache/$key"))
    val (r, hit) = ResultCache.runCached(q, cache)
    assert(!hit)
    assert(r.count() == 5)
  }

  test("racing consumers of one unbuilt key build single-flight") {
    // shared parents now have many consumers (kNN graph: six, ANN
    // models: five) — two racing on an unbuilt key must not write the
    // same directory concurrently; the per-path lock makes the build
    // single-flight and the loser reads the winner's commit
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val cache = Files.createTempDirectory("graft-rc-race").toString
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def parent: org.apache.spark.sql.DataFrame = {
      builds.incrementAndGet()
      sources.Tables.nation(spark, sfDir).select(col("n_nationkey"))
    }
    val inputs = Seq(sources.Tables.nation(spark, sfDir))
    val futs = (1 to 4).map { _ =>
      Future(ResultCache.runCachedKeyed("raceParent/v1", inputs, cache)(parent))
    }
    val results = Await.result(Future.sequence(futs), 120.seconds)
    // every racer reads the same committed 25 rows
    results.foreach { case (df, _) => assert(df.count() == 25) }
    // exactly one racer constructed the parent; the rest hit
    assert(builds.get() == 1, s"parent built ${builds.get()} times")
    assert(results.count(!_._2) == 1,
      "exactly one racer should report a miss")
  }
}
