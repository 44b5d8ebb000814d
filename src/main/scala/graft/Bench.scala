package graft
import org.apache.spark.sql.SparkSession

/** Bench main (driver contract): times every declared query on
  * SPARK_GRAFT_SF_DIR, prints one JSON line.
  *
  * Queries run in sorted-name order, partitioned into CHUNKS of
  * SPARK_GRAFT_RESTART_EVERY queries (default 1 = per-query session
  * isolation; 0 = one session for the whole sweep, the pre-round-7
  * protocol). Each chunk gets a FRESH SparkSession and the previous
  * one is stopped. Why: three consecutive rounds of driver benches
  * produced >2x "regressions" on unchanged code, with reps RISING
  * within a query and ~0 GC delta. The round-6 detail held the tell —
  * `gc_sec` ≈ 0 for nearly every query: with a 128 GiB heap, GC almost
  * never fires, and Spark's ContextCleaner is GC-DRIVEN (it cleans
  * shuffles/broadcasts/accumulators only when their weak references
  * are enqueued). No GC → no cleanup → 130+ queries × 3 reps
  * accumulate broadcast blocks, shuffle files, and listener/status
  * state in one JVM, and everything sorted later pays a growing tax
  * that per-rep block hygiene cannot reach (it only drops EXPLICIT
  * caches/checkpoints). Stopping the SparkContext deletes the shuffle
  * dirs, drops the block manager, and resets listener state — while
  * the JVM stays hot (JIT + the static codegen class cache survive),
  * so the restart cost lands OUTSIDE the timed regions. Isolated A/B
  * (`SPARK_GRAFT_ONLY=q05_nation` vs the in-sweep number) confirmed
  * the sweep tax: 2.47 s in-sweep vs ~1.0 s isolated on identical code.
  *
  * Default 1 (not a larger chunk) because chunk COMPOSITION is itself
  * a confounder: measured at chunk=16, a heavy iterative query
  * (gr_pagerank) landing in a chunk before fast scan queries taxed its
  * chunk-mates up to 7x (mr_count_histogram 0.38→2.59 s purely from a
  * 2-name shift in sorted order when queries were added). Per-query
  * sessions make every number independent of what else is declared —
  * the property a regression gate actually needs. Cost: ~136 sequential
  * context restarts ≈ +2 min wall, all outside the timed regions.
  *
  * Each query is timed end-to-end (plan + execute + count)
  * SPARK_GRAFT_REPS times (default 3) and reports the MEDIAN (lower
  * median for even-length rep arrays — with per-rep-session reps every
  * draw is independent, so for a 2-rep fast-path query the lower of
  * the two is the stall-robust estimator; the upper would hand one
  * stalled rep the committed number).
  *
  * SURVIVAL (round 16, r15 verdict item 1 — BENCH_r15.json was rc=124
  * with parsed:null because the 252-query sweep outgrew the driver's
  * 3600 s cap and everything was emitted only at sweep end):
  *   1. INCREMENTAL EMISSION — after every query visit the full JSON
  *      artifact (marked "partial":true) is rewritten to
  *      bench_detail.json, so a kill at any point leaves a complete
  *      machine-readable record of everything measured so far.
  *   2. SHUTDOWN HOOK — SIGTERM (what `timeout` sends) runs JVM
  *      shutdown hooks; ours prints the partial JSON line to stdout so
  *      even the driver's stdout capture gets a parseable artifact
  *      from a killed run.
  *   3. DEADLINE GOVERNOR — SPARK_GRAFT_DEADLINE_S (default 3300,
  *      ≤ 0 disables): before each visit, project finish time as
  *      elapsed + visits_remaining × mean-wall-per-visit (the mean
  *      includes session cycles and canaries, so it over-estimates —
  *      degrading a touch early beats dying). When projected to
  *      overrun: a query that already has ≥1 rep SKIPS its remaining
  *      visits ("reps_cut"); a query with 0 reps still runs once,
  *      without warm-up ("no_warmup"). Every query always gets a
  *      number; the degradation is recorded per-query in "degraded".
  *
  * FAST PATH (round 16, r15 verdict item 2 — cut the sweep's fixed
  * wall cost so the surface fits the hour with headroom): with
  * SPARK_GRAFT_FASTPATH=1 (default), queries whose committed reference
  * price (bench_ref.json) is < 0.5 s (147 of the 252 at r15 close) run
  * 2 reps instead of 3 — one whole visit ≈ session cycle + warm-up +
  * timed run ≈ 2 s wall saved per query, ~5 min per sweep. Both
  * surviving reps KEEP their warm-up: the round-16 A/B also measured
  * the verdict's other candidate (skipping the warm-up execution on
  * sub-0.5 s queries) and rejected it — without a warm-up the fresh
  * session's spin-up lands INSIDE the timed region, a PER-SESSION cost
  * that no sweep length amortizes; the no-warm reps read +0.15-0.2 s
  * (fn_json 0.379 vs 0.212 same-window control), i.e. a permanent
  * additive bias on exactly the sub-second medians the classifier
  * compares to ref, and when the skip hit a query's FIRST visit it ate
  * the whole JVM warm-in (q08_distinct_flags 15.4 s vs 0.33 warm) and
  * tripped the stall guard on 5 of 8 A/B queries. The 2-rep median is
  * the LOWER of two warm independent draws — a small optimistic bias
  * vs the 3-rep middle, bounded by rep noise (~0.02 s), and
  * stall-robust. Queries with no ref entry (debuts) always get the
  * full protocol.
  *
  * STALL GUARD (round 10): if the rep spread exceeds 3x the rep
  * minimum, up to 2 extra reps are APPENDED (never substituted) and
  * the median is taken over the whole array. Rationale: the r9
  * committed artifact recorded ev_sessions as [0.39, 5.38, 6.25] —
  * rep 1 matched the query's 3-round history and an environment stall
  * during reps 2-3 set the committed median to 13x truth. Under
  * per-rep sessions every rep is an independent draw, so a >3x
  * outlier is environmental by construction; appending keeps the
  * artifact honest while one stalled rep can no longer set the
  * committed median. Fired retries are listed per-query in
  * "stall_retries". Retries respect the deadline governor.
  *
  * DIAGNOSABILITY: the output carries per-query rep times and GC-time
  * deltas, not just medians, so a future regression is attributable
  * from BENCH_r*.json alone (one cold rep vs all reps; GC-bound vs
  * plan change). The grand total ("value") is printed LAST in the JSON
  * line so a tail-truncated capture still sees it; the full object is
  * also written to bench_detail.json for post-hoc reads. */
object Bench {
  private def gcSecs: Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime.max(0L)).sum / 1e3
  }

  /** All knobs, env-parsed in main; a spec drives run() directly. */
  final case class Config(
      sfDir: String,
      cpus: Int = 32,
      reps: Int = 3,
      restartEvery: Int = 1,
      only: Option[String] = None,
      keepBlocks: Boolean = false,
      repSessions: Boolean = true,
      orderSeed: Long = 12,
      deadlineS: Double = 3300,
      fastPath: Boolean = true,
      detailPath: String = "bench_detail.json",
      refPath: String = "bench_ref.json")

  def main(args: Array[String]): Unit = {
    val cfg = Config(
      sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt,
      restartEvery = sys.env.getOrElse("SPARK_GRAFT_RESTART_EVERY", "1").toInt,
      // SPARK_GRAFT_ONLY=<substring> restricts the run for single-query
      // diagnosis; unset (the driver's case) runs everything.
      only = sys.env.get("SPARK_GRAFT_ONLY"),
      // SPARK_GRAFT_KEEP_BLOCKS=1 skips per-rep block hygiene — the A/B
      // switch for attributing cold-state vs plan regressions.
      keepBlocks = sys.env.get("SPARK_GRAFT_KEEP_BLOCKS").contains("1"),
      repSessions = sys.env.getOrElse("SPARK_GRAFT_REP_SESSIONS", "1") == "1",
      orderSeed = sys.env.getOrElse("SPARK_GRAFT_ORDER_SEED", "12").toLong,
      deadlineS = sys.env.getOrElse("SPARK_GRAFT_DEADLINE_S", "3300").toDouble,
      fastPath = sys.env.getOrElse("SPARK_GRAFT_FASTPATH", "1") == "1",
      detailPath =
        sys.env.getOrElse("SPARK_GRAFT_DETAIL_PATH", "bench_detail.json"),
      refPath = sys.env.getOrElse("SPARK_GRAFT_REF_PATH", "bench_ref.json"))
    println(run(cfg))
  }

  /** Runs the sweep; returns the final JSON line (also printed by the
    * shutdown hook if the JVM dies first). */
  def run(cfg: Config): String = {
    val t0Wall = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - t0Wall) / 1e9

    // committed clean reference: {"__band__": b, "<query>": sec} —
    // used by the fast path (rep/warm-up trimming) and the classifier
    val ref: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(cfg.refPath)), "UTF-8")
        """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }

    // SPARK_GRAFT_REP_SESSIONS=1 (default): every REP of every query gets
    // its own SparkSession. Round 7's per-QUERY isolation killed
    // cross-query contamination but left the 3 reps sharing a session,
    // and iterative/multi-job queries churn their OWN state: isolated
    // A/B on gr_pagerank gave reps 3.23/3.69/14.21 s in one session —
    // rising monotonically — and a synchronous inter-rep drain of
    // everything the GC-starved ContextCleaner would clean (StateDrain:
    // shuffles, broadcasts, listener backlog) did NOT flatten it
    // (3.97/7.05/14.87), so the residual churn lives in state a session
    // restart alone resets. The cost of per-rep sessions is ~0: in the
    // round-7 driver detail, rep 1 (the fresh-session rep) was NEVER
    // slower than the median by >0.3 s on any of 137 queries (JIT + the
    // static codegen cache survive restarts), while shared-session churn
    // inflated medians by 9.5 s total. Per-rep sessions make every rep
    // an independent draw from the same distribution — the property a
    // median actually wants. 0 = shared-session reps (the A/B switch,
    // with StateDrain hygiene between reps).
    //
    // single ONLY value = substring match (the historical diagnosis
    // switch); a comma-separated list = exact names, so one A/B run can
    // carry a flagged query plus its controls without substring
    // collisions.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        cfg.only.forall { o =>
          if (o.contains(",")) o.split(',').map(_.trim).contains(n)
          else n.contains(o)
        }
      }
    val chunks =
      if (cfg.restartEvery <= 0) Seq(ordered)
      else ordered.grouped(cfg.restartEvery).toSeq

    def freshSession() = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = GraftSession.builder(cfg.cpus, cfg.cpus).getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    // SWEEP-ORDER RANDOMIZATION (round 12, r11 verdict item 7): the r11
    // sweep carried a 2-2.9x regression burst across four ta_* queries
    // that are CONTIGUOUS in sorted order — the signature of a
    // time-local box stall, which an alphabetical sweep converts into a
    // family-shaped "regression" the protocol cannot distinguish from a
    // real one. Per-rep-session reps are independent draws, so the
    // sweep may visit queries in ANY order: each rep PASS visits every
    // query once in a deterministically seeded shuffle (seed + pass
    // index), making consecutive visits unrelated names and the three
    // reps of one query far apart in time — a stall now lands as
    // uncorrelated single-rep noise (which the median and stall guard
    // already absorb) instead of a correlated family burst. The
    // executed order is logged in the artifact ("order": permutation
    // indices into the sorted name list, one array per pass) so any
    // future burst can be read against WHEN each rep actually ran.
    // Fixed default seed: reproducible across rounds; override via
    // SPARK_GRAFT_ORDER_SEED for A/B on the order itself.
    val passOrders: Seq[Vector[Int]] =
      if (!cfg.repSessions) Seq.empty
      else (0 until cfg.reps).map { r =>
        new scala.util.Random(cfg.orderSeed + r)
          .shuffle(ordered.indices.toVector)
      }

    // fast-path protocol per query (see the FAST PATH scaladoc):
    // debuts (no ref entry) always get the full protocol
    def plannedReps(name: String): Int =
      if (cfg.fastPath && ref.get(name).exists(_ < 0.5))
        math.min(2, cfg.reps)
      else cfg.reps

    // canary containers live outside the branch so the JSON emission
    // sees them; the shared-session A/B branch leaves them empty
    // (band: null there — that branch carries its own controls)
    val canaryRef = Seq(
      "ta_token_stats" -> 0.10, "q12_running_total" -> 0.11,
      "q08_distinct_flags" -> 0.17).filter(c =>
      SparkEntry.queries.contains(c._1))
    val canaryAcc = scala.collection.mutable.LinkedHashMap(
      canaryRef.map { case (n, _) => n -> Vector.empty[Double] }: _*)

    // all mutable sweep state lives behind this lock so the shutdown
    // hook can snapshot it mid-sweep without tearing
    val lock = new Object
    final class Acc {
      var times: Vector[Double] = Vector.empty
      var gc = 0.0
      var extra = 0
      var warmFails = 0
      var degraded: String = null // "reps_cut" | "no_warmup" (governor)
    }
    val acc = ordered.map { case (n, _) => n -> new Acc }.toMap

    def r3(v: Double) = math.rint(v * 1000) / 1000

    /** Serializes the complete artifact from current state. Safe to
      * call at any point in the sweep (partial=true) or at the end. */
    def emitLine(partial: Boolean): String = lock.synchronized {
      val results = ordered.map { case (name, _) =>
        val a = acc(name); (name, a.times, a.gc, a.extra, a.warmFails)
      }
      // LOWER median for even-length arrays (round 16): per-rep-session
      // reps are independent draws, so the lower middle is the
      // stall-robust pick — the upper would let one stalled rep of a
      // 2-rep fast-path query set the committed number
      val medians = results.map { case (k, ts, _, _, _) =>
        k -> (if (ts.isEmpty) -1.0
              else { val s = ts.sorted; r3(s((s.length - 1) / 2)) })
      }
      val qs = medians.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      // CHRONOLOGICAL rep order (round 8; earlier rounds sorted here,
      // which made every reps[] array look monotonically rising and
      // hid which rep was actually slow)
      val repJson = results.map { case (k, ts, _, _, _) =>
        "\"" + k + "\":" + ts.map(r3).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val gcJson = results.map { case (k, _, g, _, _) =>
        "\"" + k + "\":" + r3(g) }.mkString("{", ",", "}")
      // only the queries where the stall guard fired / a warm-up
      // failed / the governor degraded — empty objects read as
      // "nothing to report", keeping the line short
      val retryJson = results.collect { case (k, _, _, e, _) if e > 0 =>
        "\"" + k + "\":" + e }.mkString("{", ",", "}")
      val warmFailJson = results.collect { case (k, _, _, _, w) if w > 0 =>
        "\"" + k + "\":" + w }.mkString("{", ",", "}")
      val degradedJson = ordered.flatMap { case (n, _) =>
        Option(acc(n).degraded).map(d => "\"" + n + "\":\"" + d + "\"")
      }.mkString("{", ",", "}")
      val total = r3(medians.map(_._2).filter(_ >= 0).sum)
      val orderJson = passOrders
        .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      // window-band estimate: median canary ratio to its pinned
      // clean-window reference (see the canary comment below); null
      // when no canary ran (SPARK_GRAFT_ONLY or the shared-session A/B
      // branch)
      val canaryJson = canaryAcc.map { case (n, ts) =>
        "\"" + n + "\":" + ts.map(r3).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val canaryRefJson = canaryRef.map { case (n, v) =>
        "\"" + n + "\":" + v }.mkString("{", ",", "}")
      val ratios = canaryRef.flatMap { case (n, rf) =>
        canaryAcc(n).map(_ / rf) }.sorted
      val bandJson =
        if (ratios.isEmpty) "null"
        else r3(ratios((ratios.length - 1) / 2)).toString
      // STALL-ARTIFACT CLASSIFIER (r14 verdict item 5): the rule the
      // verdicts applied by hand, emitted by the sweep itself against
      // the committed clean reference. Sub-second ref prices recorded
      // in an elevated window carry that window's additive band — the
      // r15 ref was regenerated at band 1.247, inflating thresholds
      // ~25% on exactly the queries where detection matters (r15
      // verdict "what's wrong" 2) — so they are normalized DOWN by the
      // recorded ref band at classify time; with threshold
      // = 2 × max(band, 1) × cleanRef, a query whose MEDIAN exceeds
      // the threshold is
      //   - "suspect" if its BEST rep is ALSO beyond the threshold
      //     (every independent draw elevated ⇒ plausibly real drift —
      //     investigate), or
      //   - "stall_cleared" if any rep is inside (a clean draw exists
      //     ⇒ the elevation is window noise; auto-cleared).
      // New queries (no ref entry) are never classified — they get a
      // debut price in BASELINE.md instead.
      val (suspectJson, clearedJson) = {
        val band = if (ratios.isEmpty) Double.NaN
                   else ratios((ratios.length - 1) / 2)
        if (ref.isEmpty || band.isNaN) ("{}", "{}")
        else {
          val refBand = ref.getOrElse("__band__", 1.0)
          def cleanRef(p: Double) = if (p < 1.0) p / refBand else p
          val classed = results.flatMap { case (name, ts, _, _, _) =>
            ref.get(name).filter(_ => ts.nonEmpty).flatMap { p =>
              val thr = 2.0 * math.max(band, 1.0) * cleanRef(p)
              val s = ts.sorted
              val med = s((s.length - 1) / 2)
              if (med <= thr) None
              else Some((name, med, ts.min, thr, ts.min > thr))
            }
          }
          def js(xs: Seq[(String, Double, Double, Double, Boolean)]) =
            xs.map { case (n, m, b, t, _) =>
              "\"" + n +
                s"""\":{"median":${r3(m)},"best":${r3(b)},"threshold":${r3(t)}}"""
            }.mkString("{", ",", "}")
          (js(classed.filter(_._5)), js(classed.filterNot(_._5)))
        }
      }
      // key order matters: a tail-only capture must still see the
      // total and the medians, so diagnostics come first and "value"
      // is last
      s"""{"metric":"total","unit":"sec","sf":"${cfg.sfDir}","n_reps":${cfg.reps},""" +
        s""""partial":$partial,"deadline_s":${cfg.deadlineS},""" +
        s""""elapsed_s":${r3(elapsedS)},"fast_path":${cfg.fastPath},""" +
        s""""order_seed":${cfg.orderSeed},"order":$orderJson,""" +
        // drain_ok is only meaningful when the shared-session branch
        // ran StateDrain; in the default per-rep mode the drain never
        // executes, and asserting its health would be unfalsifiable —
        // emit null so A/B readers can tell "succeeded" from "never ran"
        s""""restart_every":${cfg.restartEvery},"rep_sessions":${cfg.repSessions},""" +
        s""""drain_ok":${if (cfg.repSessions) "null" else StateDrain.healthy.toString},""" +
        s""""stall_retries":$retryJson,"warm_fails":$warmFailJson,""" +
        s""""degraded":$degradedJson,""" +
        s""""suspect":$suspectJson,"stall_cleared":$clearedJson,""" +
        s""""canary":$canaryJson,"canary_ref":$canaryRefJson,"band":$bandJson,""" +
        s""""gc_sec":$gcJson,"reps":$repJson,"queries":$qs,"value":$total}"""
    }

    // only a FULL sweep may overwrite the round artifact — an isolated
    // SPARK_GRAFT_ONLY diagnosis run must not clobber the 252-query
    // detail file BASELINE.md cites (it happened; see round 8). An
    // EXPLICIT detail path (spec / A/B runs) always writes.
    def writeDetail(line: String): Unit =
      if (cfg.only.isEmpty || cfg.detailPath != "bench_detail.json")
        try java.nio.file.Files.write(
          java.nio.file.Paths.get(cfg.detailPath),
          // newline-terminated: POSIX text file, clean diffs
          (line + "\n").getBytes("UTF-8"))
        catch { case _: Throwable => }

    // SHUTDOWN HOOK: `timeout` sends SIGTERM, which runs JVM shutdown
    // hooks — print + persist whatever has accumulated, marked partial,
    // so a killed sweep still yields a driver-parseable artifact
    val finished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hook = new Thread(() => if (!finished.get) {
      val line = emitLine(partial = true)
      writeDetail(line)
      println(line)
      Console.out.flush()
    })
    Runtime.getRuntime.addShutdownHook(hook)

    if (cfg.repSessions) {
      // per-rep isolation: session create/stop lands OUTSIDE the timed
      // region; each rep re-plans from the loader in a clean context.
      //
      // WARM-UP (round 9): round 8 shipped per-rep sessions WITHOUT a
      // warm-up, so all 3 reps were cold (fresh thread pools, footer
      // reads, first whole-stage codegen per session) and the sweep
      // total inflated 2.6x on unchanged code — median(cold,cold,cold)
      // measures session start-up, not the query. The round-7 objection
      // to warm-ups (a 4th execution's shuffle/broadcast churn inflating
      // LATER reps) only applied to shared sessions, where churn
      // accumulates across reps; here every rep's session dies right
      // after its timed run, so the warm-up's only surviving effects are
      // the ones we want warm (page cache, JIT, codegen cache — JVM-
      // level, deliberately shared). Between warm-up and the timed run,
      // block hygiene (clearCache + blocking unpersist + StateDrain)
      // drops the warm-up's explicit blocks synchronously, outside the
      // clock, so the timed rep starts from clean BLOCK state in a warm
      // JVM — an independent warm draw, which is what a median wants.
      // Every timed rep keeps its warm-up (warm=false exists only for
      // the governor's emergency last-resort rep — see FAST PATH for
      // why a no-warm-up rep is additively biased).
      //
      // (time-if-ok, gc-delta, warm-fail-count): the shared one-rep
      // machinery — fresh session, warm-up, block hygiene, timed run
      def execOnce(
          fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
          warm: Boolean): (Option[Double], Double, Int) = {
        val gc0 = gcSecs
        val spark = freshSession()
        var warmFails = 0
        if (warm) {
          // NonFatal only (advice r9): an OOM/fatal JVM error in the
          // warm-up must propagate, not leave a wounded JVM that the
          // timed run then "measures"; a non-fatal warm-up failure is
          // counted so a cold-timed query is visible in the artifact
          try { fn(spark, cfg.sfDir).count() }
          catch { case scala.util.control.NonFatal(_) => warmFails += 1 }
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          // the streaming-parity queries leave their memory-sink
          // result registered as a temp view (the view's plan pins the
          // sink's rows) — drop the warm-up's views so the timed rep
          // doesn't run with the warm-up's whole output resident
          try spark.catalog.listTables().collect()
            .filter(_.isTemporary)
            .foreach(t => spark.catalog.dropTempView(t.name))
          catch { case scala.util.control.NonFatal(_) => }
          StateDrain(spark)
        }
        val t0 = System.nanoTime()
        val ok = try { fn(spark, cfg.sfDir).count(); true }
                 catch { case scala.util.control.NonFatal(_) => false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.stop()
        (if (ok) Some(elapsed) else None, gcSecs - gc0, warmFails)
      }
      var queryVisits = 0 // governor's mean-wall divisor (canaries and
                          // ref loading land in elapsed ⇒ conservative)
      def runOnce(name: String,
          fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
          warm: Boolean): Unit = {
        val (t, gc, wf) = execOnce(fn, warm)
        queryVisits += 1
        lock.synchronized {
          val a = acc(name)
          a.gc += gc
          a.warmFails += wf
          t.foreach(v => a.times = a.times :+ v)
        }
      }
      // DEADLINE GOVERNOR projection (see the SURVIVAL scaladoc)
      def overrunProjected(visitsRemaining: Int): Boolean =
        cfg.deadlineS > 0 && queryVisits >= 1 &&
          elapsedS + visitsRemaining * (elapsedS / queryVisits) >
            cfg.deadlineS
      // WINDOW-BAND CANARIES (round 13, r12 verdict item 6): the
      // dominant residual measurement confounder is the box's window
      // band — a uniform ADDITIVE ~+0.1 s elevation on sub-second
      // queries while a driver/judge session is active (three rounds of
      // BASELINE.md calibrations carry the signature; heavies are
      // untouched). Each rep pass interleaves three cheap never-flagged
      // canaries (one per family: text scan-agg, window running total,
      // distinct flags) at FIXED positions — start, middle, end of the
      // pass, rotating which canary takes which position per pass — and
      // the artifact carries "band": the median canary time ratio to
      // its pinned clean-window reference. band ≈ 1 → clean window,
      // read medians absolutely; band ≫ 1 → sub-second medians carry
      // that elevation and ratio-to-control is the valid read. Canary
      // runs use the same per-rep-session machinery but land in their
      // OWN accumulator. Skipped under SPARK_GRAFT_ONLY: the
      // isolated-A/B protocol carries its own co-located controls.
      def runCanary(slot: Int): Unit =
        if (cfg.only.isEmpty && canaryRef.nonEmpty) {
          val n = canaryRef(slot % canaryRef.size)._1
          execOnce(SparkEntry.queries(n), warm = true)._1
            .foreach(t => lock.synchronized {
              canaryAcc(n) = canaryAcc(n) :+ t
            })
        }
      var visitsLeft = ordered.map { case (n, _) => plannedReps(n) }.sum
      passOrders.zipWithIndex.foreach { case (ord, pass) =>
        runCanary(pass)
        val mid = ord.size / 2
        ord.zipWithIndex.foreach { case (i, k) =>
          if (k == mid && ord.size > 1) runCanary(pass + 1)
          val (name, fn) = ordered(i)
          if (pass < plannedReps(name)) {
            if (overrunProjected(visitsLeft)) {
              lock.synchronized {
                val a = acc(name)
                // first label wins: a query that ran cold once and then
                // lost its remaining passes stays "no_warmup" — the
                // stronger caveat about its one number
                if (a.degraded == null)
                  a.degraded =
                    if (a.times.nonEmpty) "reps_cut" else "no_warmup"
              }
              // 0-rep queries must still produce a number — run once,
              // cold (no warm-up execution), and never again
              if (acc(name).times.isEmpty) runOnce(name, fn, warm = false)
            } else runOnce(name, fn, warm = true)
            visitsLeft -= 1
            writeDetail(emitLine(partial = true))
          }
        }
        runCanary(pass + 2)
      }
      // STALL GUARD retries (see scaladoc) — run as a final pass, so
      // they are also time-decorrelated from the rep that tripped them;
      // each retry re-checks the deadline (one projected visit)
      ordered.foreach { case (name, fn) =>
        def spread = lock.synchronized {
          val a = acc(name)
          (a.times, a.extra)
        }
        var (ts, extra) = spread
        while (ts.nonEmpty && extra < 2 && ts.max > 3 * ts.min &&
            !overrunProjected(1)) {
          runOnce(name, fn, warm = true)
          lock.synchronized { acc(name).extra += 1 }
          writeDetail(emitLine(partial = true))
          val s = spread; ts = s._1; extra = s._2
        }
      }
    } else chunks.foreach { chunk =>
      val spark = GraftSession.builder(cfg.cpus, cfg.cpus).getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // drop every resident storage block: cached plans +
      // (local)checkpoint blocks are never shared across reps (each rep
      // re-plans from the loader), so this only stops them accumulating
      // within a chunk. blocking=true: async removal runs on
      // block-manager threads and can execute DURING the next timed rep
      // (the round-5 q22_unpivot rep spread 0.68/2.98/4.09 s had
      // exactly that signature); synchronous removal costs milliseconds
      // OUTSIDE the timed region and makes reps independent.
      // NOTE: do NOT add System.gc() here to nudge the ContextCleaner —
      // measured (round 7): it tightens an iterative query's own rep
      // spread in isolation, but at sweep scale the enqueued cleanups
      // run ASYNC on block-manager threads DURING the next timed rep
      // (the round-5 q22 mechanism) and the 134-query total regresses
      // 71.6 → 93.4 s. Round 8 adds StateDrain here: the exact cleanups
      // the ContextCleaner would do (shuffles, broadcasts, listener
      // backlog) performed SYNCHRONOUSLY between reps, outside the
      // clock. Measured caveat (BASELINE.md round 8): the drain did NOT
      // flatten an iterative query's shared-session reps (gr_pagerank
      // 3.97/7.05/14.87 with it — the residual churn lives in state
      // only a context restart resets), which is why per-rep sessions
      // are the default and this branch is the A/B control, kept
      // drained so the comparison isolates the restart itself.
      def dropBlocks(): Unit = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        StateDrain(spark)
      }
      // warm-up: first query of the chunk once (footer reads, first
      // codegen, fresh-session thread pools — all outside the clock).
      // SKIPPED for single-query chunks: there the warm-up would be a
      // 4th execution of the query itself in one session, which for
      // self-churning iterative queries (dd_components) inflates the
      // later reps' shuffle-file state more than the cold rep costs —
      // the median of 3 absorbs the one cold rep instead.
      var chunkWarmFails = 0
      if (chunk.size > 1) {
        try { chunk.head._2(spark, cfg.sfDir).count() }
        catch { case scala.util.control.NonFatal(_) => chunkWarmFails += 1 }
        dropBlocks()
      }
      // a failed rep is excluded from the median; a query with zero
      // successful reps reports the -1 sentinel (a broken query must
      // read as broken, never as a fast success)
      chunk.foreach { case (name, fn) =>
        val gc0 = gcSecs
        def runOnce(): Option[Double] = {
          val t0 = System.nanoTime()
          val ok = try { fn(spark, cfg.sfDir).count(); true }
                   catch { case scala.util.control.NonFatal(_) => false }
          // stop the clock BEFORE hygiene: blocking block removal is
          // inter-rep maintenance, not query cost
          val elapsed = (System.nanoTime() - t0) / 1e9
          if (!cfg.keepBlocks) dropBlocks()
          if (ok) Some(elapsed) else None
        }
        var times = (1 to cfg.reps).flatMap(_ => runOnce()).toVector
        // same stall guard as the per-rep-session branch (see above);
        // in this A/B branch reps share a session, so an outlier can
        // also be self-churn — the appended retries make that visible
        // (they stay high) rather than masking it
        var extra = 0
        while (times.nonEmpty && extra < 2 && times.max > 3 * times.min) {
          runOnce().foreach(t => times = times :+ t)
          extra += 1
        }
        lock.synchronized {
          val a = acc(name)
          a.times = times
          a.gc = gcSecs - gc0
          a.extra = extra
          a.warmFails = if (name == chunk.head._1) chunkWarmFails else 0
        }
        writeDetail(emitLine(partial = true))
      }
      // stop the context: deletes shuffle dirs, drops the block
      // manager, resets listener state; the JVM (JIT, codegen cache)
      // stays hot for the next chunk
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    val line = emitLine(partial = false)
    finished.set(true)
    try Runtime.getRuntime.removeShutdownHook(hook)
    catch { case _: IllegalStateException => } // already shutting down
    writeDetail(line)
    line
  }
}
