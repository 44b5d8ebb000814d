package graft.tools

/** Dev tool: run ad-hoc SQL text through `spark.sql` over the fuzz
  * catalog's temp views and WRITE each result to
  * `<outDir>/q<i>.parquet` — the dump twin of [[RawSql]], for
  * comparing Spark's SQL-frontend output against DuckDB row-by-row
  * when hand-minimizing a wrong-RESULTS divergence (counts alone,
  * which RawSql prints, cannot show which values differ).
  *
  * Usage: runMain graft.tools.RawSqlDump <sfDir> <outDir> <sql>...
  */
object RawSqlDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    graft.fuzz.Fuzz.catalog.keys.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    args.drop(2).zipWithIndex.foreach { case (sql, i) =>
      try {
        spark.sql(sql).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/q$i.parquet")
        println(s"[rawsqldump] #$i OK -> $outDir/q$i.parquet")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"[rawsqldump] #$i ERROR ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
