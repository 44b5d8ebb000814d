ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "simplemapreduceframeworkspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Throughput collector for a batch engine (optimization r16): an
  // isolated A/B on the GC-heavy bench subset read ParallelGC -8.5%
  // vs G1 at the same 8g heap (sim_recall_report 3.94->2.94,
  // st_asof_join_late 5.65->4.96; controls flat), while 16g-vs-8g G1
  // read neutral-to-negative. Batch jobs care about GC throughput,
  // not pause latency; override for latency-sensitive deployments.
  s"-XX:+Use${sys.env.getOrElse("SPARK_GRAFT_GC", "ParallelGC")}",
)

// ---------------------------------------------------------------------
// Parallel forked test groups (optimization r17, VERDICT r16 item 2):
// the suite grew to 2021-2441 s of WALL on one sequential local[4]
// JVM, which outgrew the driver's `sbt test` budget (r16 run was
// KILLED mid-suite, tests_ok=false) while 28 of the box's 32 cores sat
// idle. Standard sbt remedy: partition the suites into N groups, each
// forked into its OWN JVM (own SparkSession, own temp state — the
// isolation semantics of a sequential run are preserved PER GROUP;
// suites never share a JVM with a concurrently-running suite, and all
// cross-process state under /tmp is already cross-process-safe:
// ResultCache holds O_EXCL locks, stream checkpoints are pid-unique).
// Wall becomes max(group), bounded by the heaviest suites, which the
// weight hints below spread across groups (weights = measured suite
// seconds from this round's timing run; unlisted suites default 30).
// SPARK_GRAFT_TEST_GROUPS=1 restores the single sequential JVM.
val testGroupCount: Int =
  sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "8").toInt
// Per-suite wall-seconds estimates for the greedy packer (refreshed
// from the r17 grouped timing run); only RELATIVE weights matter, so
// stale entries degrade balance, never correctness.
val suiteWeights: Map[String, Int] = Map(
  "graft.fuzz.FuzzQuerySpec" -> 82,
  "graft.fuzz.FuzzDifferentialR5Spec" -> 390,
  "graft.fuzz.FuzzDifferentialR6Spec" -> 137,
  "graft.fuzz.FuzzDifferentialR7Spec" -> 139,
  "graft.fuzz.FuzzDifferentialR8Spec" -> 139,
  "graft.fuzz.FuzzDifferentialR9Spec" -> 147,
  "graft.fuzz.FuzzDifferentialR10Spec" -> 379,
  "graft.fuzz.FuzzDifferentialR11Spec" -> 394,
  "graft.fuzz.FuzzDifferentialR12Spec" -> 399,
  "graft.fuzz.FuzzThreeWayR5Spec" -> 211,
  "graft.fuzz.FuzzThreeWayR6Spec" -> 87,
  "graft.fuzz.FuzzThreeWayR7Spec" -> 87,
  "graft.fuzz.FuzzThreeWayR8Spec" -> 82,
  "graft.fuzz.FuzzThreeWayR9Spec" -> 87,
  "graft.fuzz.FuzzThreeWayR10Spec" -> 233,
  "graft.fuzz.FuzzThreeWayR11Spec" -> 194,
  "graft.fuzz.FuzzThreeWayR12Spec" -> 235,
  "graft.streaming.MultiBatchParitySpec" -> 218,
  "graft.streaming.CheckpointRecoverySpec" -> 172,
  "graft.streaming.LateDataSpec" -> 160,
  "graft.streaming.StreamParitySpec" -> 279,
  "graft.operators.SimilaritySpec" -> 102,
  "graft.streaming.FunnelTtlSpec" -> 90,
  "graft.operators.PipelineSpec" -> 89,
  "graft.operators.GraphSpec" -> 76,
  "graft.CacheSoakSpec" -> 72,
  "graft.operators.DedupSpec" -> 57,
  "graft.streaming.EventStreamsSpec" -> 56,
  "graft.operators.TextAnalysisSpec" -> 53,
  "graft.BenchSurvivalSpec" -> 48,
  "graft.streaming.DedupStreamsSpec" -> 44,
  "graft.operators.MultimodalSpec" -> 38,
  "graft.operators.AdvancedSpec" -> 35,
  "graft.operators.ConcurrencySpec" -> 32,
  "graft.mr.GoldenCorpusSpec" -> 30,
  "graft.operators.EventsSpec" -> 28,
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val jo = (Test / javaOptions).value.toVector
  val n = testGroupCount.max(1)
  val fo = ForkOptions()
    .withRunJVMOptions(jo)
    .withEnvVars(sys.env.filter(_._1.startsWith("SPARK_")))
  if (n <= 1) Seq(Tests.Group("tests", tests, Tests.SubProcess(fo)))
  else {
    // greedy longest-first bin packing into n groups
    val bins = Array.fill(n)(0L)
    val assigned = Array.fill(n)(Vector.empty[TestDefinition])
    tests.sortBy(t =>
      (-suiteWeights.getOrElse(t.name, 30), t.name)).foreach { t =>
      val i = bins.indexOf(bins.min)
      bins(i) += suiteWeights.getOrElse(t.name, 30).toLong
      assigned(i) = assigned(i) :+ t
    }
    assigned.toSeq.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
      Tests.Group(s"g$i", ts, Tests.SubProcess(fo))
    }
  }
}
// sbt's default caps ForkedTestGroup concurrency at 1 — raise it to the
// group count (each group JVM runs a local[4] session, so n=6 groups
// subscribe ~24 cores; heap is n x Xmx, well inside the box).
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount.max(1)),
  Tags.limitAll(math.max(4, testGroupCount + 2)),
)
