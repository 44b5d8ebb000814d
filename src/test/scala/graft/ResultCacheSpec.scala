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

  test("a foreign process's build lock blocks until released, then hits the commit") {
    // cross-PROCESS single-flight (round 11): simulate another JVM
    // holding the O_EXCL marker — the caller must WAIT (not build
    // concurrently), and once the 'other process' commits and releases,
    // it must read the committed entry as a hit
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val cache = Files.createTempDirectory("graft-rc-xproc").toString
    val inputs = Seq(sources.Tables.nation(spark, sfDir))
    // learn the entry path by building once in a scratch dir layout:
    // same name+inputs → same key under any cacheDir
    val (probePath, _) = ResultCache.materializeKeyed(
      "xprocParent/v1", inputs, cache)(
      sources.Tables.nation(spark, sfDir).select(col("n_nationkey")))
    // wipe to unbuilt state, then hold the lock like a foreign process
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) Option(p.listFiles).foreach(_.foreach(rm))
      p.delete(); ()
    }
    rm(new java.io.File(probePath))
    Files.createFile(Paths.get(probePath + ".lock"))
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val fut = Future(ResultCache.runCachedKeyed("xprocParent/v1", inputs, cache) {
      builds.incrementAndGet()
      sources.Tables.nation(spark, sfDir).select(col("n_nationkey"))
    })
    Thread.sleep(500)
    assert(!fut.isCompleted, "caller must block on the foreign lock")
    assert(builds.get() == 0, "caller must not build while the lock is held")
    // the 'foreign process' commits and releases
    Files.createDirectories(Paths.get(probePath))
    sources.Tables.nation(spark, sfDir).select(col("n_nationkey"))
      .write.mode("overwrite").parquet(probePath)
    Files.deleteIfExists(Paths.get(probePath + ".lock"))
    val (df, hit) = Await.result(fut, 60.seconds)
    assert(hit, "the foreign commit must be read as a hit")
    assert(builds.get() == 0)
    assert(df.count() == 25)
  }

  test("sweep: LRU byte budget keeps recently-used entries, evicts the rest and stale debris") {
    val cache = Files.createTempDirectory("graft-rc-sweep").toString
    val inputs = Seq(sources.Tables.nation(spark, sfDir))
    def build(name: String): String =
      ResultCache.materializeKeyed(name, inputs, cache)(
        sources.Tables.nation(spark, sfDir))._1
    val old1 = build("sweepA/v1")
    val old2 = build("sweepB/v1")
    Thread.sleep(1100) // distinct _SUCCESS mtimes at fs granularity
    val fresh = build("sweepC/v1")
    // a USE refreshes LRU order: re-touch old1 via a hit
    Thread.sleep(1100)
    val (_, hitOld1) = ResultCache.materializeKeyed("sweepA/v1", inputs, cache)(
      sys.error("must hit"))
    assert(hitOld1)
    // the untouched candidate must be OUTSIDE the eviction grace window
    // (round 12: entries used within ~30 min are never evicted, so a
    // concurrent process's mid-read entry survives a fresh JVM's sweep)
    Files.setLastModifiedTime(Paths.get(s"$old2/_SUCCESS"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - 2L * 3600 * 1000))
    // stale uncommitted debris (dead builder): dir, no _SUCCESS, old mtime
    val debris = Paths.get(s"$cache/deadbeef00000000")
    Files.createDirectories(debris)
    Files.setLastModifiedTime(debris,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - 3L * 3600 * 1000))
    val entryBytes = {
      def du(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
        else f.length
      du(new java.io.File(fresh))
    }
    // budget fits TWO entries: survivors must be the two most recently
    // USED (old1 — just touched — and fresh), evictee the untouched old2
    val evicted = ResultCache.sweep(cache, 2 * entryBytes + entryBytes / 2)
    assert(evicted.toSet.contains(old2), s"old2 should be evicted, got $evicted")
    assert(evicted.toSet.contains(debris.toString), "stale debris swept")
    assert(!Files.exists(Paths.get(old2)))
    assert(Files.exists(Paths.get(s"$old1/_SUCCESS")), "touched entry survives")
    assert(Files.exists(Paths.get(s"$fresh/_SUCCESS")), "fresh entry survives")
    // an evicted entry is rebuilt on next use — reuse-or-recompute
    val (df, hit) = ResultCache.runCachedKeyed("sweepB/v1", inputs, cache)(
      sources.Tables.nation(spark, sfDir))
    assert(!hit)
    assert(df.count() == 25)
  }

  test("sweep: recently-used entries survive even over budget (mid-read grace)") {
    // r11 advice: a freshly-launched JVM's construction-time sweep must
    // not evict an entry another live process may be lazily scanning —
    // recency (_SUCCESS mtime within the grace window) is the liveness
    // signal, so an over-budget sweep keeps every recent entry
    val cache = Files.createTempDirectory("graft-rc-grace").toString
    val inputs = Seq(sources.Tables.nation(spark, sfDir))
    val a = ResultCache.materializeKeyed("graceA/v1", inputs, cache)(
      sources.Tables.nation(spark, sfDir))._1
    val b = ResultCache.materializeKeyed("graceB/v1", inputs, cache)(
      sources.Tables.nation(spark, sfDir))._1
    val evicted = ResultCache.sweep(cache, 1L) // budget fits nothing
    assert(evicted.isEmpty, s"grace window must protect fresh entries: $evicted")
    assert(Files.exists(Paths.get(s"$a/_SUCCESS")))
    assert(Files.exists(Paths.get(s"$b/_SUCCESS")))
  }

  test("a stale foreign lock is stolen promptly and atomically, not polled for 30 min") {
    // r11 advice (medium): the steal is an ATOMIC_MOVE — exactly one
    // stealer proceeds. Here: a lock orphaned by a dead builder (old
    // mtime) must not block the next accessor; racing accessors must
    // still build single-flight (one miss, one winner's commit read)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val cache = Files.createTempDirectory("graft-rc-steal").toString
    val inputs = Seq(sources.Tables.nation(spark, sfDir))
    val (probePath, _) = ResultCache.materializeKeyed(
      "stealParent/v1", inputs, cache)(
      sources.Tables.nation(spark, sfDir).select(col("n_nationkey")))
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) Option(p.listFiles).foreach(_.foreach(rm))
      p.delete(); ()
    }
    rm(new java.io.File(probePath))
    val lock = Paths.get(probePath + ".lock")
    Files.createFile(lock)
    Files.setLastModifiedTime(lock, // orphaned 2 h ago
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - 2L * 3600 * 1000))
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val futs = (1 to 3).map { _ =>
      Future(ResultCache.runCachedKeyed("stealParent/v1", inputs, cache) {
        builds.incrementAndGet()
        sources.Tables.nation(spark, sfDir).select(col("n_nationkey"))
      })
    }
    val results = Await.result(Future.sequence(futs), 60.seconds)
    results.foreach { case (df, _) => assert(df.count() == 25) }
    assert(builds.get() == 1, s"steal must stay single-flight, built ${builds.get()}")
    assert(!Files.exists(lock), "winner must release the stolen lock")
  }

  test("sweep reaps orphaned lock files and steal graves with no live entry") {
    val cache = Files.createTempDirectory("graft-rc-orphan").toString
    Files.createDirectories(Paths.get(cache))
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis - 2L * 3600 * 1000)
    // dead builder's lock, no entry dir
    val orphan = Paths.get(s"$cache/feedface00000000.lock")
    Files.createFile(orphan); Files.setLastModifiedTime(orphan, old)
    // abandoned steal grave
    val grave = Paths.get(s"$cache/feedface00000000.lock.stale-abc")
    Files.createFile(grave); Files.setLastModifiedTime(grave, old)
    // a YOUNG lock (live builder heartbeat) must survive
    val live = Paths.get(s"$cache/cafebabe00000000.lock")
    Files.createFile(live)
    ResultCache.sweep(cache, Long.MaxValue)
    assert(!Files.exists(orphan), "orphaned dead lock must be reaped")
    assert(!Files.exists(grave), "abandoned steal grave must be reaped")
    assert(Files.exists(live), "a young (live) lock must never be touched")
  }

  test("partitioned materialization: split halves land in prunable directories") {
    val cache = Files.createTempDirectory("graft-rc-part").toString
    val inputs = Seq(sources.Tables.nation(spark, sfDir))
    val (dir, _) = ResultCache.materializeKeyedPartitioned(
      "partSplit/v1", inputs, cache, Seq("_valid"))(
      sources.Tables.nation(spark, sfDir)
        .withColumn("_valid", col("n_nationkey") % 2 === 0))
    assert(Files.exists(Paths.get(s"$dir/_valid=true")))
    assert(Files.exists(Paths.get(s"$dir/_valid=false")))
    val back = spark.read.option("basePath", dir).parquet(dir)
    assert(back.count() == 25)
    assert(back.where(col("_valid") === true).count() == 13)
  }

  test("release is ownership-checked: a resumed holder whose lock was stolen backs off") {
    // r12 advice (low): a holder paused past StaleLockMs (STW pause —
    // the heartbeat thread pauses with it) gets its lock stolen; on
    // resume its finally-release must NOT delete the thief's LIVE
    // lock, or a third process could acquire and overwrite-write
    // concurrently with the thief. The per-acquisition token makes
    // release a compare-and-delete.
    val lock = java.nio.file.Files
      .createTempDirectory("graft-rc-token").resolve("entry.lock")
    assert(ResultCache.tryAcquire(lock, "tokenA"), "first acquire")
    // the steal, condensed: the thief's ATOMIC_MOVE removes A's stale
    // lock and re-creates it carrying the thief's own token
    java.nio.file.Files.delete(lock)
    assert(ResultCache.tryAcquire(lock, "tokenB"), "thief acquire")
    // A resumes and releases — B's live lock must survive, verbatim
    ResultCache.releaseIfOwned(lock, "tokenA")
    assert(java.nio.file.Files.exists(lock),
      "resumed holder deleted the thief's live lock")
    assert(new String(java.nio.file.Files.readAllBytes(lock),
      "UTF-8") == "tokenB")
    // the rightful holder's release still works
    ResultCache.releaseIfOwned(lock, "tokenB")
    assert(!java.nio.file.Files.exists(lock))
  }
}
