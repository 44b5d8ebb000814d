package graft

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Job-level memoization — the reference's result reuse: a job is keyed
  * by a hash of its data + functions files, and resubmitting a finished
  * job returns the stored result immediately (`client.py:57-69`,
  * `worker.py:41-57`, `jobtracker.py:164-167`).
  *
  * Spark-first translation: the key is (canonicalized optimized plan,
  * input-file snapshot). The canonicalized plan normalizes attribute ids
  * and aliases — two queries that differ only cosmetically share a key;
  * the file snapshot (path, length, mtime) invalidates the entry the
  * moment any input changes, which the reference's content hash of only
  * the first 5 lines cannot do (`client.py:57-69` — a mid-file edit
  * reuses a stale result there; not here).
  *
  * The cache directory is plain parquet + the `_SUCCESS` marker as the
  * commit flag, so a killed writer never yields a half-cached hit —
  * idempotent-commit discipline again (reference P4).
  */
object ResultCache {

  /** Per-path build locks (round 10): with shared parents materialized
    * by MANY declared queries (the kNN graph has six consumers, the
    * ANN models five), two queries racing on one UNBUILT key would
    * both see no `_SUCCESS` and write the same directory concurrently —
    * parquet overwrite is not safe against an interleaved second
    * writer. A JVM-wide stripe per cache path makes the build
    * single-flight: the loser blocks, re-checks the marker, and reads
    * the winner's committed files. */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(path: String): Object =
    buildLocks.computeIfAbsent(path, _ => new Object)

  /** Cross-PROCESS single-flight (round 11, r10 verdict item 7): the
    * cache dir is shared across driver JVMs (bench + verify + tests can
    * overlap on one machine), so the JVM stripe alone leaves an
    * interleaved-second-writer window between processes. An O_EXCL
    * `.lock` marker next to the entry closes it: `Files.createFile` is
    * atomic on POSIX, the loser polls until the marker clears (then
    * re-checks `_SUCCESS` — normally a free hit on the winner's
    * commit), and a marker older than [[StaleLockMs]] is presumed
    * orphaned by a killed builder and stolen. The `_SUCCESS` protocol
    * stays the correctness backstop: even a mis-stolen lock can at
    * worst rebuild, never half-read.
    *
    * Round 12 (r11 advice, medium): the steal is ATOMIC and live locks
    * are HEARTBEAT-refreshed. The old delete-then-recreate steal let
    * every waiter cross the age threshold in the same 100 ms window:
    * waiter A deletes+recreates, waiter B's delete removes A's FRESH
    * lock, and two `mode("overwrite")` writers interleave on one cache
    * path — a `_SUCCESS`-marked dir with both writers' part files.
    * Now a stale lock is stolen by `Files.move(ATOMIC_MOVE)` to a
    * unique grave name: exactly one mover wins (the losers' moves throw
    * and they re-poll), and only the winner re-creates. A long LIVE
    * build (the epoch-file ranks can exceed 30 min at scale) is never
    * presumed dead because [[startHeartbeat]] re-touches the holder's
    * lock mtime every [[HeartbeatMs]]. */
  // sys-prop overridable (defaults are the production values): the
  // cross-PROCESS soak spec compresses both windows to seconds so a
  // killed builder's steal path runs inside a test, with heartbeat ≪
  // stale preserved — the same ratio production relies on.
  private def StaleLockMs: Long = sys.props.get("graft.cache.staleLockMs")
    .map(_.toLong).getOrElse(30L * 60 * 1000)
  private def HeartbeatMs: Long = sys.props.get("graft.cache.heartbeatMs")
    .map(_.toLong).getOrElse(5L * 60 * 1000)

  private lazy val heartbeats =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val th = new Thread(r, "graft-cache-lock-heartbeat")
      th.setDaemon(true); th
    })

  private def startHeartbeat(
      lock: java.nio.file.Path): java.util.concurrent.ScheduledFuture[_] =
    heartbeats.scheduleAtFixedRate(() => {
      try Files.setLastModifiedTime(lock,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis))
      catch { case _: java.io.IOException => () } // released mid-beat: fine
    }, HeartbeatMs, HeartbeatMs, java.util.concurrent.TimeUnit.MILLISECONDS)

  /** One acquisition attempt: O_EXCL create, or an atomic steal of a
    * stale lock. Returns whether THIS caller now holds the lock.
    *
    * Round 13 (r12 advice): the holder's `token` (a per-acquisition
    * UUID) is written INTO the lock file at create time — a single
    * open(O_CREAT|O_EXCL)+write, still atomic for mutual exclusion —
    * so release can be OWNERSHIP-CHECKED. Without it, a holder paused
    * past [[StaleLockMs]] (STW pause, machine sleep — the heartbeat
    * thread is paused too) gets its lock stolen; on resume its
    * unconditional `finally deleteIfExists` would delete the NEW
    * holder's LIVE lock, re-opening the two-concurrent-writers window
    * the atomic steal exists to close. [[releaseIfOwned]] deletes only
    * while the file still carries the releaser's own token. */
  private[graft] def tryAcquire(lock: java.nio.file.Path, token: String): Boolean =
    try {
      Files.write(lock, token.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      true
    }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val age =
          try System.currentTimeMillis -
            Files.getLastModifiedTime(lock).toMillis
          catch { case _: java.io.IOException => 0L } // vanished: retry
        if (age <= StaleLockMs) false
        else {
          val grave = lock.resolveSibling(
            lock.getFileName.toString + ".stale-" + java.util.UUID.randomUUID)
          try {
            Files.move(lock, grave,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            Files.deleteIfExists(grave)
            try {
              Files.write(lock, token.getBytes("UTF-8"),
                java.nio.file.StandardOpenOption.CREATE_NEW,
                java.nio.file.StandardOpenOption.WRITE)
              true
            }
            catch { case _: java.nio.file.FileAlreadyExistsException => false }
          } catch { case _: java.io.IOException => false } // lost the race
        }
    }

  /** Delete `lock` only if it still carries `token` — a resumed holder
    * whose lock was stolen mid-pause reads the thief's token and backs
    * off. (The read-then-delete window is microseconds against a steal
    * precondition of [[StaleLockMs]] of silence, so the residual race
    * requires a second full staleness period inside it.) */
  private[graft] def releaseIfOwned(lock: java.nio.file.Path, token: String): Unit =
    try {
      if (new String(Files.readAllBytes(lock), "UTF-8") == token)
        Files.deleteIfExists(lock)
      ()
    } catch { case _: java.io.IOException => () } // already gone: fine

  private def crossProcessLocked[T](path: String)(f: => T): T = {
    val lock = Paths.get(path + ".lock")
    val token = java.util.UUID.randomUUID.toString
    Files.createDirectories(lock.getParent)
    while (!tryAcquire(lock, token)) Thread.sleep(100)
    val beat = startHeartbeat(lock)
    try f finally { beat.cancel(false); releaseIfOwned(lock, token) }
  }

  /** Non-blocking variant for [[sweep]]: one acquisition attempt (with
    * the stale-steal path), skip on contention instead of polling — a
    * session-construction sweep must never park behind a live builder's
    * heartbeated lock. */
  private def tryLocked(path: String)(f: => Unit): Boolean = {
    val lock = Paths.get(path + ".lock")
    val token = java.util.UUID.randomUUID.toString
    Files.createDirectories(lock.getParent)
    if (!tryAcquire(lock, token)) false
    else { try f finally releaseIfOwned(lock, token); true }
  }

  /** The single-flight build protocol shared by every entry point:
    * JVM stripe → cross-process marker → `_SUCCESS` re-check → build or
    * touch. On a hit the marker's mtime is refreshed so [[sweep]]'s
    * LRU order tracks USE, not creation. Returns whether the entry was
    * already committed. */
  private def buildCommitted(path: String)(build: => Unit): Boolean =
    lockFor(path).synchronized {
      crossProcessLocked(path) {
        val marker = Paths.get(s"$path/_SUCCESS")
        val hit = Files.exists(marker)
        if (!hit) build
        else Files.setLastModifiedTime(marker,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis))
        hit
      }
    }

  private def fileSnapshot(f: String): String = {
    val p = Paths.get(f.stripPrefix("file:"))
    val (len, mtime) =
      if (Files.exists(p)) (Files.size(p), Files.getLastModifiedTime(p).toMillis)
      else (-1L, -1L)
    s"$f|$len|$mtime"
  }

  /** Stable key for (plan, inputs).
    *
    * COLLISION GUARD (round 10): a plan rooted at a non-file relation —
    * e.g. the `LogicalRDD` a `localCheckpoint`ed iterative loop leaves
    * behind — canonicalizes WITHOUT identity (attribute ids normalized,
    * no files), so two different checkpoint-rooted computations with the
    * same shape would collide on one key (observed: the textual and
    * semantic drop lists, both `filter(id =!= label).project(id)` over a
    * (id, label, size) RDD — the semantic list silently read the textual
    * list's cache). When the plan traces to zero input files, the
    * ANALYZED plan string (real attribute names + RDD ids) is mixed in:
    * such keys never falsely collide, at the cost of never hitting
    * across re-constructions — callers who want reuse for
    * checkpoint-rooted parents declare identity explicitly via
    * [[runCachedKeyed]]. */
  def fingerprint(df: DataFrame): String = {
    val plan = df.queryExecution.optimizedPlan.canonicalized.toString
    val files = df.inputFiles.sorted.map(fileSnapshot)
    val md = MessageDigest.getInstance("SHA-256")
    md.update(plan.getBytes("UTF-8"))
    if (files.isEmpty)
      md.update(df.queryExecution.analyzed.toString.getBytes("UTF-8"))
    files.foreach(f => md.update(f.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString.take(32)
  }

  /** Run-or-reuse: if a committed result for this (plan, inputs) exists
    * under `cacheDir`, read it; otherwise execute, persist, and read
    * back. Returns the result plus whether it was a cache hit. */
  def runCached(df: DataFrame, cacheDir: String): (DataFrame, Boolean) = {
    val spark = df.sparkSession
    val key = fingerprint(df)
    val path = s"$cacheDir/$key"
    val committed =
      buildCommitted(path)(df.write.mode("overwrite").parquet(path))
    (spark.read.parquet(path), committed)
  }

  /** Run-or-reuse under an EXPLICIT semantic key — for computations
    * whose plan identity can't be read off the plan itself (iterative
    * loops that materialize through `localCheckpoint` construct
    * EAGERLY and leave only an identityless `LogicalRDD`; see
    * [[fingerprint]]'s collision guard). The caller declares
    *
    *  - `name`: the computation's identity INCLUDING its governing
    *    constants and a version tag (e.g. "textDropIds/v1") — bump the
    *    tag when the LOGIC changes, the key cannot see code;
    *  - `inputs`: the source relations the computation reads — their
    *    file snapshots invalidate the entry when data changes, same
    *    contract as [[runCached]];
    *  - `df`: the computation, BY NAME — on a committed hit it is
    *    never constructed, so an eager iterative parent skips its
    *    whole loop, not just the final write. That is the round-10
    *    `pl_dedup_signals` win: the corpus's two most expensive
    *    closures run once per input snapshot, and every later consumer
    *    pays one parquet read. */
  def runCachedKeyed(name: String, inputs: Seq[DataFrame], cacheDir: String)(
      df: => DataFrame): (DataFrame, Boolean) = {
    val (path, committed) = materializeKeyed(name, inputs, cacheDir)(df)
    (inputs.head.sparkSession.read.parquet(path), committed)
  }

  /** [[runCachedKeyed]] without the read-back: returns the committed
    * parquet DIRECTORY path (plus hit flag) for consumers that want the
    * location rather than a DataFrame — e.g. a file STREAM source
    * replaying the materialized data as micro-batches. Same key, same
    * `_SUCCESS` commit discipline. */
  def materializeKeyed(name: String, inputs: Seq[DataFrame], cacheDir: String)(
      df: => DataFrame): (String, Boolean) = {
    val path = keyedPath(name, inputs, cacheDir)
    val committed =
      buildCommitted(path)(df.write.mode("overwrite").parquet(path))
    (path, committed)
  }

  /** [[materializeKeyed]] with HIVE-partitioned layout: the committed
    * entry is `partitionCols`-partitioned parquet, so consumers that
    * filter on a partition column read only its directories (the
    * lenient-CSV quarantine split's shape: valid and corrupt halves
    * prunable without caching the feed). */
  def materializeKeyedPartitioned(name: String, inputs: Seq[DataFrame],
      cacheDir: String, partitionCols: Seq[String])(
      df: => DataFrame): (String, Boolean) = {
    val path = keyedPath(name, inputs, cacheDir)
    val committed = buildCommitted(path)(
      df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path))
    (path, committed)
  }

  /** [[materializeKeyed]] with ORC layout (round 12, r11 verdict item
    * 4): same key + `_SUCCESS` commit discipline, the committed entry
    * is ORC — the write half of the ORC read-parity roundtrip
    * (`Tables.orcTable` is the read half). */
  def materializeKeyedOrc(name: String, inputs: Seq[DataFrame],
      cacheDir: String)(df: => DataFrame): (String, Boolean) = {
    val path = keyedPath(name, inputs, cacheDir)
    val committed =
      buildCommitted(path)(df.write.mode("overwrite").orc(path))
    (path, committed)
  }

  private def keyedPath(name: String, inputs: Seq[DataFrame],
      cacheDir: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(name.getBytes("UTF-8"))
    inputs.flatMap(_.inputFiles).sorted.map(fileSnapshot)
      .foreach(f => md.update(f.getBytes("UTF-8")))
    s"$cacheDir/${md.digest().map("%02x".format(_)).mkString.take(32)}"
  }

  /** [[materializeKeyed]] for ORDERED multi-file replay: each part lands
    * as one single parquet FILE `part_k.parquet` with strictly
    * increasing mtimes, so a file STREAM source with
    * `maxFilesPerTrigger=1` replays the parts as ordered micro-batches
    * (FileStreamSource picks oldest-mtime first) — the deterministic
    * drop-directory shape the multi-batch parity queries need. Same
    * key + `_SUCCESS` commit discipline; a killed writer leaves no
    * marker and the next caller rebuilds from scratch (the build dir is
    * cleared first, so no stale part from a dead attempt survives). */
  def materializeKeyedOrdered(name: String, inputs: Seq[DataFrame],
      cacheDir: String)(parts: => Seq[DataFrame]): (String, Boolean) = {
    val path = keyedPath(name, inputs, cacheDir)
    val committed = buildCommitted(path)(buildOrdered(path)(parts))
    (path, committed)
  }

  private def rmTree(p: java.io.File): Unit = {
    if (p.isDirectory && !Files.isSymbolicLink(p.toPath))
      Option(p.listFiles).foreach(_.foreach(rmTree))
    p.delete(); ()
  }

  private def buildOrdered(path: String)(parts: => Seq[DataFrame]): Unit = {
    rmTree(new java.io.File(path))
    Files.createDirectories(Paths.get(path))
    parts.zipWithIndex.foreach { case (part, k) =>
      val stage = s"$path/_stage_$k"
      part.coalesce(1).write.mode("overwrite").parquet(stage)
      // Files.list must be CLOSED (unlike listFiles) — each open
      // stream pins a directory fd for the JVM's lifetime (r10 advice)
      val listing = Files.list(Paths.get(stage))
      val f =
        try listing.filter(_.toString.endsWith(".parquet")).iterator().next
        finally listing.close()
      val target = Paths.get(s"$path/part_$k.parquet")
      Files.move(f, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(
          1700000000000L + k * 60000L))
      rmTree(new java.io.File(stage))
    }
    Files.createFile(Paths.get(s"$path/_SUCCESS"))
    ()
  }

  /** Byte-budget LRU sweep (round 11, r10 verdict item 7): the cache
    * dir accretes kNN graphs, ANN models, drop lists, and epoch files
    * across rounds with nothing ever deleting them. Keeps the
    * most-recently-USED committed entries (LRU order = `_SUCCESS`
    * mtime, which [[buildCommitted]] refreshes on every hit) up to
    * `maxBytes`; evicts the rest, plus any UNCOMMITTED debris older
    * than [[StaleLockMs]] (a dead builder's half-write — younger ones
    * may be builds in flight and are left alone). Evicting a LIVE
    * entry is safe for correctness (the next consumer rebuilds — the
    * memoization contract is reuse-or-recompute, never
    * required-presence) but not for a concurrently READING query, so
    * run it between query batches: [[GraftSession]] sweeps once at
    * session construction. Returns the evicted entry paths.
    *
    * Round 12 (r11 advice): (a) committed entries touched within the
    * [[StaleLockMs]] grace window are NEVER evicted, even over budget —
    * a freshly-launched process must not yank an entry a concurrently
    * running bench/verify/test JVM is mid-read (readers hold no lock
    * during the lazy parquet scan; recency is the only cross-process
    * liveness signal we have); (b) eviction uses [[tryLocked]], so a
    * live builder's heartbeated lock makes the sweep SKIP that entry
    * rather than park 100 ms-polling behind it; (c) orphaned sibling
    * `.lock` files (builder killed before writing any entry dir) and
    * abandoned steal graves older than the stale window are reaped, so
    * the next accessor of that key no longer burns the full 30-min
    * steal timeout on a lock the sweep already knows is dead. */
  def sweep(cacheDir: String, maxBytes: Long): Seq[String] = {
    def du(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
      else f.length
    val root = new java.io.File(cacheDir)
    val all = Option(root.listFiles).getOrElse(Array.empty)
    val entries = all.filter(f => f.isDirectory && !f.getName.startsWith("."))
    val now = System.currentTimeMillis
    case class E(dir: java.io.File, bytes: Long, mtime: Long, committed: Boolean)
    val scanned = entries.map { d =>
      val succ = new java.io.File(d, "_SUCCESS")
      E(d, du(d), if (succ.exists) succ.lastModified else d.lastModified,
        succ.exists)
    }
    val (committed, debris) = scanned.partition(_.committed)
    val staleDebris = debris.filter(now - _.mtime > StaleLockMs)
    var budget = maxBytes
    val evicted = committed.sortBy(-_.mtime).flatMap { e =>
      if (e.bytes <= budget) { budget -= e.bytes; None }
      else if (now - e.mtime <= StaleLockMs) None // grace: possibly mid-read
      else Some(e)
    }
    val removed = (evicted ++ staleDebris).filter { e =>
      lockFor(e.dir.getPath).synchronized {
        tryLocked(e.dir.getPath)(rmTree(e.dir))
      }
    }.map(_.dir.getPath).toSeq
    // Dead-lock debris: a `.lock` with no entry dir (builder died before
    // its first write) or a steal grave whose mover died mid-steal. Both
    // are unreachable by the entry sweep above; age-gate so a LIVE
    // builder's heartbeated lock is never touched.
    all.filter(f => f.isFile && now - f.lastModified > StaleLockMs).foreach {
      f =>
        val n = f.getName
        if (n.contains(".lock.stale-")) { f.delete(); () }
        else if (n.endsWith(".lock") &&
          !new java.io.File(root, n.stripSuffix(".lock")).exists) {
          f.delete(); ()
        }
    }
    removed
  }

  /** The default on-disk location + budget, shared by every caller that
    * doesn't name its own (sys-prop overridable). */
  def defaultDir: String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-result-cache"
  def defaultBudgetBytes: Long =
    sys.props.get("graft.cache.maxBytes").map(_.toLong).getOrElse(8L << 30)
}
