package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round evidence dump: write each named query's
  * `.explain("formatted")` output to `<outDir>/<query>_<tag>.txt`
  * (the `plans/r16/` before/after artifacts the judge reads).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> <name>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(cpus, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    // SPARK_GRAFT_PLAN_EXEC=1: execute the query and dump the FINAL
    // adaptive plan (isFinalPlan=true) — the only place AQE's runtime
    // join-strategy flips (e.g. a SortMergeJoin rewritten to
    // BroadcastHashJoin under the session broadcast threshold) are
    // visible; the pre-execution dump shows the initial plan for both
    // sides of such an A/B.
    //
    // r16 ADVICE fix: the old exec mode ran `df.write.format("noop")`,
    // which builds a SEPARATE QueryExecution — `df.queryExecution`
    // itself never executed, so the "final" dump was still the initial
    // plan (every r16 bcast artifact shows isFinalPlan=false). Drive
    // the df's OWN QueryExecution to completion instead, and fail
    // loudly if the dumped adaptive plan is not final.
    val exec = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, d)
        val plan = if (exec) {
          df.queryExecution.toRdd.foreach(_ => ())
          val p = df.queryExecution.executedPlan.toString
          require(!p.contains("isFinalPlan=false"),
            s"$n: executed-plan dump still carries isFinalPlan=false — " +
              "the dumped QueryExecution did not run")
          p
        } else df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"${n}_$tag.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] wrote ${n}_$tag.txt (${plan.length} chars)")
      } catch {
        case e: Exception => println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
