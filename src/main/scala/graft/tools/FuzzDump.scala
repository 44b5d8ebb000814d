package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump a seed range of fuzz plans as (parquet result,
  * oracle_sql.json) in the Verify layout, so `tools/check_oracle.py`
  * cross-validates the SQL renderer against real DuckDB — the
  * renderer-level differential that backs promoting fixed seeds to
  * declared `fz_*` queries. */
object FuzzDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, fromS, toS) = (args(0), args(1), args(2), args(3))
    // optional 5th arg: grammar revision (default LatestRev — sweeps
    // always run the newest grammar; pinned seeds name their own)
    val rev = if (args.length > 4) args(4).toInt else graft.fuzz.Fuzz.LatestRev
    val spark = graft.GraftSession.local(8)
    new java.io.File(outDir).mkdirs()
    val sqls = (fromS.toLong to toS.toLong).flatMap { seed =>
      val p = graft.fuzz.Fuzz.genPlan(seed, rev)
      val name = f"fz_s$seed%04d"
      try {
        // the Out variants: DECIMAL result columns normalized to DOUBLE
        // on both sides (the external pandas compare renders DuckDB
        // decimals as floats — see Fuzz.toDFOut)
        graft.fuzz.Fuzz.toDFOut(p, spark, sfDir).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        Some(name -> graft.fuzz.Fuzz.toSqlOut(p))
      } catch {
        // NonFatal only (r12 advice): an OOM/LinkageError must kill the
        // sweep, not leave a wounded JVM "dumping" the remaining seeds
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[fuzzdump] $name failed: ${e.getMessage}")
          None
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      sqls.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
