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
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, d)
        val plan = df.queryExecution.explainString(
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
