package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Cross-PROCESS ResultCache soak (round 13, r12 verdict item 5): the
  * lock protocol's threat model is concurrent JVMs sharing one cache
  * dir — bench, verify, and tests overlap on this machine — but until
  * now every race spec ran threads inside one JVM, where the JVM-stripe
  * lock already serializes and the cross-process marker is never
  * genuinely contended. This spec forks REAL java processes running
  * [[graft.tools.CacheHammer]] against one key:
  *
  *  1. fresh key, 3 concurrent builders → exactly one `built`, two
  *     `hit`, one `_SUCCESS`, correct read-back count in every process
  *     (cross-process single-flight via the O_EXCL marker);
  *  2. a `stall` process acquires the lock and is SIGKILLed mid-build
  *     (orphaned lock, dead heartbeat), then 3 builders must STEAL the
  *     stale lock atomically after the compressed stale window —
  *     exactly one steals and builds, no duplicate `_SUCCESS` commit,
  *     no interleaved-writer row-count corruption.
  *
  * Windows are compressed via sys-props (stale 5 s, heartbeat 250 ms —
  * the production 20:1 heartbeat ≪ stale ratio preserved, so a LIVE
  * builder's ~2 s parquet write survives the stale window by refresh,
  * exactly the production claim). Forked JVMs reuse this (forked) test
  * JVM's classpath and the build's add-opens list. */
class CacheSoakSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def hammer(cacheDir: String, key: String, mode: String): Process = {
    val java = sys.props("java.home") + "/bin/java"
    val cmd: Seq[String] = Seq(java) ++ addOpens ++ Seq(
      "-Xmx1g",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      // 20:1 like production (30 min : 5 min → here 5 s : 250 ms): a
      // LIVE builder's heartbeat must survive scheduling delay under a
      // fully loaded box (the first CI run of this spec flaked at 6:1
      // when a concurrent 32-way sweep starved the heartbeat thread
      // past the stale window — exactly the mis-steal the wide
      // production ratio exists to prevent, so the test keeps the
      // ratio, not the absolute numbers)
      "-Dgraft.cache.staleLockMs=5000",
      "-Dgraft.cache.heartbeatMs=250",
      "-cp", sys.props("java.class.path"),
      "graft.tools.CacheHammer", cacheDir, key, mode)
    new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
  }

  private def drain(p: Process): (Int, String) = {
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val rc = if (p.waitFor(240, java.util.concurrent.TimeUnit.SECONDS))
      p.exitValue() else { p.destroyForcibly(); -999 }
    (rc, out)
  }

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-cache-soak").toString
    d
  }

  private def entryDirs(cacheDir: String): Seq[java.io.File] =
    Option(new java.io.File(cacheDir).listFiles).getOrElse(Array.empty)
      .filter(_.isDirectory).toSeq

  test("three concurrent JVMs on one fresh key: single-flight build, consistent reads") {
    val dir = freshDir()
    val ps = (1 to 3).map(_ => hammer(dir, "soak/fresh/v1", "build"))
    val outs = ps.map(drain)
    outs.foreach { case (rc, out) =>
      assert(rc == 0, s"hammer exited $rc:\n$out")
      assert(out.contains("count=1000"), s"wrong read-back:\n$out")
    }
    val built = outs.count(_._2.contains("HAMMER built"))
    val hits = outs.count(_._2.contains("HAMMER hit"))
    assert(built == 1 && hits == 2,
      s"expected exactly one builder, got built=$built hit=$hits")
    val entries = entryDirs(dir)
    assert(entries.size == 1, s"expected one cache entry, got $entries")
    assert(Files.exists(Paths.get(entries.head.getPath, "_SUCCESS")))
  }

  test("SIGKILLed builder's orphaned lock is stolen atomically; no duplicate commit") {
    val dir = freshDir()
    val staller = hammer(dir, "soak/steal/v1", "stall")
    // wait until the staller actually HOLDS the lock (the entry dir's
    // .lock sibling exists), then kill it mid-build — heartbeat dies
    // with the process, so the lock goes stale after 3 s
    val deadline = System.currentTimeMillis + 60000
    def lockFile(): Option[java.io.File] =
      Option(new java.io.File(dir).listFiles).getOrElse(Array.empty)
        .find(f => f.isFile && f.getName.endsWith(".lock"))
    while (lockFile().isEmpty && System.currentTimeMillis < deadline)
      Thread.sleep(50)
    assert(lockFile().isDefined, "staller never acquired the lock")
    staller.destroyForcibly()
    staller.waitFor()
    val ps = (1 to 3).map(_ => hammer(dir, "soak/steal/v1", "build"))
    val outs = ps.map(drain)
    outs.foreach { case (rc, out) =>
      assert(rc == 0, s"hammer exited $rc:\n$out")
      assert(out.contains("count=1000"), s"wrong read-back:\n$out")
    }
    val built = outs.count(_._2.contains("HAMMER built"))
    assert(built == 1,
      s"expected exactly one post-steal builder, got $built:\n" +
        outs.map(_._2).mkString("---\n"))
    val entries = entryDirs(dir)
    assert(entries.size == 1, s"expected one cache entry, got $entries")
    val parts = Option(entries.head.listFiles).getOrElse(Array.empty)
      .count(_.getName.endsWith(".parquet"))
    assert(parts > 0, "committed entry has no data files")
  }
}
