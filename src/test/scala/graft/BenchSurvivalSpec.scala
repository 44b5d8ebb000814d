package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Bench survival machinery (round 16, r15 verdict item 1): the r15
  * driver artifact was rc=124 / parsed:null — the sweep outgrew the
  * driver's 3600 s cap and Bench emitted everything only at sweep end.
  * This spec forks REAL `graft.Bench` JVMs (Bench stops SparkContexts,
  * so it must not share this test JVM's session) and pins the three
  * survival behaviors:
  *
  *  1. DEADLINE GOVERNOR — a 5-query sweep under an artificially tiny
  *     deadline (1 s) completes with rc=0, every query carrying a
  *     median, the run marked non-partial, and the degradation
  *     recorded per-query ("reps_cut" / "no_warmup");
  *  2. INCREMENTAL EMISSION + SHUTDOWN HOOK — a sweep SIGTERMed
  *     mid-flight (the `timeout` kill signal) still leaves a complete
  *     machine-readable artifact: the detail file carries
  *     "partial":true with at least one measured rep, and the hook
  *     prints a parseable partial line to stdout.
  *
  * Forked JVMs reuse this (forked) test JVM's classpath and the
  * build's add-opens list, exactly like [[CacheSoakSpec]]. */
class BenchSurvivalSpec extends AnyFunSuite {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private val fiveQueries =
    "fn_array,fn_bitwise,fn_math,fn_regex,fn_string"

  private def forkBench(workDir: java.io.File, deadlineS: String,
      extraEnv: Map[String, String] = Map.empty): Process = {
    val javaBin = sys.props("java.home") + "/bin/java"
    val cmd = (Seq(javaBin, "-Xmx4g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC") ++ addOpens ++
      Seq("-cp", sys.props("java.class.path"), "graft.Bench")).asJava
    val pb = new ProcessBuilder(cmd)
    pb.directory(workDir)
    pb.redirectErrorStream(false)
    pb.redirectOutput(new java.io.File(workDir, "stdout.txt"))
    pb.redirectError(new java.io.File(workDir, "stderr.txt"))
    val env = pb.environment()
    env.put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    env.put("SPARK_GRAFT_CPUS", "4")
    env.put("SPARK_GRAFT_ONLY", fiveQueries)
    env.put("SPARK_GRAFT_DEADLINE_S", deadlineS)
    env.put("SPARK_GRAFT_DETAIL_PATH",
      new java.io.File(workDir, "detail.json").getAbsolutePath)
    env.put("SPARK_GRAFT_REF_PATH", "/root/repo/bench_ref.json")
    extraEnv.foreach { case (k, v) => env.put(k, v) }
    pb.start()
  }

  private def lastJsonLine(f: java.io.File): String = {
    val lines = Files.readAllLines(f.toPath).asScala
      .filter(l => l.startsWith("{") && l.endsWith("}"))
    assert(lines.nonEmpty, s"no JSON line in ${f.getName}")
    lines.last
  }

  private def jsonStr(line: String, key: String): Option[String] =
    // [,{] anchor: "reps" must not match inside "n_reps"
    ("[,{]\"" + key + "\":(\\{[^}]*\\}|\"[^\"]*\"|[^,}]+)").r
      .findFirstMatchIn(line).map(_.group(1))

  test("deadline governor: tiny deadline degrades reps, never dies") {
    val dir = Files.createTempDirectory("bench-governor").toFile
    val p = forkBench(dir, deadlineS = "1")
    assert(p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS),
      "governed sweep did not finish")
    assert(p.exitValue() == 0, {
      val err = new String(Files.readAllBytes(
        Paths.get(dir.toString, "stderr.txt")))
      s"rc=${p.exitValue()}\n${err.takeRight(2000)}"
    })
    val line = lastJsonLine(new java.io.File(dir, "stdout.txt"))
    // the run COMPLETED (partial only marks a killed sweep)
    assert(jsonStr(line, "partial").contains("false"))
    // every requested query carries a real median — the artifact is
    // complete even though the deadline was absurd
    val queries = jsonStr(line, "queries").get
    fiveQueries.split(',').foreach { q =>
      val v = ("\"" + q + "\":([-0-9.]+)").r.findFirstMatchIn(queries)
        .map(_.group(1).toDouble)
      assert(v.exists(_ >= 0.0), s"$q missing/failed in $queries")
    }
    // the degradation is recorded: after the first visit the governor
    // projects overrun, so the other four queries run exactly once
    // without warm-up and the first loses its remaining passes
    val degraded = jsonStr(line, "degraded").get
    assert(degraded.contains("no_warmup"),
      s"expected no_warmup entries in $degraded")
    assert(fiveQueries.split(',').count(degraded.contains) >= 4,
      s"expected >=4 degraded queries in $degraded")
    // explicit detail path: written even under SPARK_GRAFT_ONLY
    val detail = lastJsonLine(new java.io.File(dir, "detail.json"))
    assert(jsonStr(detail, "partial").contains("false"))
  }

  test("SIGTERM mid-sweep leaves a parseable partial artifact") {
    val dir = Files.createTempDirectory("bench-sigterm").toFile
    val detailFile = new java.io.File(dir, "detail.json")
    val p = forkBench(dir, deadlineS = "0") // governor off: full sweep
    // wait for the incremental emission to record >=1 measured rep
    val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
    def measuredRep(): Boolean = detailFile.exists() && {
      val line = try lastJsonLine(detailFile) catch {
        case _: Throwable => return false
      }
      jsonStr(line, "reps").exists(_.contains("[")) &&
        "\\[[0-9]".r.findFirstIn(jsonStr(line, "reps").get).nonEmpty
    }
    while (!measuredRep() && System.nanoTime() < deadline && p.isAlive)
      Thread.sleep(200)
    assert(measuredRep(), "no incremental emission before timeout")
    p.destroy() // SIGTERM — what `timeout` sends the sweep
    val exited = p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS)
    if (!exited) p.destroyForcibly()
    assert(exited, "JVM did not exit on SIGTERM")
    // the shutdown hook printed a partial line to stdout…
    val line = lastJsonLine(new java.io.File(dir, "stdout.txt"))
    assert(jsonStr(line, "partial").contains("true"), line.take(300))
    // …and the artifact carries at least one real measurement
    val reps = jsonStr(line, "reps").get
    assert("\\[[0-9]".r.findFirstIn(reps).nonEmpty,
      s"no measured rep in partial artifact: ${reps.take(200)}")
    // the detail file agrees (incremental path, independent of stdout)
    val detail = lastJsonLine(detailFile)
    assert(jsonStr(detail, "partial").contains("true"))
  }
}
