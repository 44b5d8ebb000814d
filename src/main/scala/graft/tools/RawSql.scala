package graft.tools

/** Dev tool: run ad-hoc SQL text through `spark.sql` over the fuzz
  * catalog's temp views (first arg = sf dir, each later arg = one SQL
  * string) and print row counts or the failure — for hand-minimizing
  * SQL-frontend divergences found by [[SqlProbe]]/FuzzQuerySpec.
  */
object RawSql {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    graft.fuzz.Fuzz.catalog.keys.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    args.tail.zipWithIndex.foreach { case (sql, i) =>
      try {
        val n = spark.sql(sql).collect().length
        println(s"[rawsql] #$i OK rows=$n")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"[rawsql] #$i ERROR ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
