package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder(cpus, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY restricts the dump for fast local oracle checks,
    // with the SAME rule as Bench (r14 advice — the two tools diverged:
    // Bench read comma lists as exact names, Verify as substrings, so
    // one env value selected different sets): a single value is a
    // substring match (the historical diagnosis switch), a
    // comma-separated list is EXACT names. The driver sets no env and
    // always dumps everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    SparkEntry.queries
      .filter { case (name, _) =>
        only.forall { o =>
          if (o.contains(",")) o.split(',').map(_.trim).contains(name)
          else name.contains(o)
        }
      }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Per-query block hygiene (r16 advice): query functions may pin
      // blocks for their own lifetime — the dd_* shared-subtree
      // materializations localCheckpoint O(corpus tokens) per query,
      // and the streaming parity queries register their memory sink as
      // a temp view whose plan pins the sink rows. Verify runs all 269
      // queries in ONE session, so without an explicit release the
      // residency grows with every query visited (Bench's per-rep
      // sessions release implicitly; this is the same dropBlocks
      // discipline). The result is already committed to parquet above,
      // so nothing downstream depends on the blocks.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      try spark.catalog.listTables().collect()
        .filter(_.isTemporary)
        .foreach(t => spark.catalog.dropTempView(t.name))
      catch { case scala.util.control.NonFatal(_) => }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
