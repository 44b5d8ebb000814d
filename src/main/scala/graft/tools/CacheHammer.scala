package graft.tools

/** Cross-process soak driver for [[graft.ResultCache]] (round 13, r12
  * verdict item 5): one JVM's worth of contention on ONE cache key,
  * forked several times concurrently by `graft.CacheSoakSpec`. The
  * single-JVM specs prove the lock protocol against threads; the
  * protocol's actual adversary is other PROCESSES (bench + verify +
  * tests sharing one cache dir), which only a real multi-JVM drive can
  * exercise — O_EXCL acquisition, heartbeat refresh, the atomic stale
  * steal after a SIGKILLed builder, and ownership-checked release all
  * run here against the production code paths, with the stale/heartbeat
  * windows compressed via the `graft.cache.*` sys-props.
  *
  * Modes: `build` sleeps ~0.7 s inside the by-name computation (so
  * concurrent builders genuinely overlap in the build window), then
  * returns 1000 rows; `stall` sleeps 120 s inside the build while
  * HOLDING the lock — the spec SIGKILLs it mid-sleep to orphan a lock
  * with no heartbeat. Prints one `HAMMER built|hit count=N` line. */
object CacheHammer {
  def main(args: Array[String]): Unit = {
    val Array(cacheDir, key, mode) = args
    val spark = graft.GraftSession.local(2)
    spark.sparkContext.setLogLevel("WARN")
    val input = spark.range(100).toDF("id")
    def compute = {
      if (mode == "stall") Thread.sleep(120000L) else Thread.sleep(700L)
      spark.range(1000).toDF("id")
    }
    val (out, hit) =
      graft.ResultCache.runCachedKeyed(key, Seq(input), cacheDir)(compute)
    // the read-back COUNT is the integrity check: a second interleaved
    // writer on the same dir would leave extra part files and a wrong
    // count under the single _SUCCESS
    println(s"HAMMER ${if (hit) "hit" else "built"} count=${out.count()}")
    spark.stop()
  }
}
