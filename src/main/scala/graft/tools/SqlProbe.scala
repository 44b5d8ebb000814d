package graft.tools

/** Dev tool: run named fuzz seeds' SQL rendering through SPARK'S OWN
  * parser (`spark.sql`) and compare against the reference interpreter
  * — the single-seed form of FuzzQuerySpec's three-way differential,
  * for iterating on a failing seed without re-running the full
  * 1200-seed spec. Seeds may carry a revision suffix `seed@rev`
  * (default [[graft.fuzz.Fuzz.LatestRev]]).
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val seeds = args.tail.map { a =>
      a.split('@') match {
        case Array(s, r) => (s.toLong, r.toInt)
        case Array(s)    => (s.toLong, graft.fuzz.Fuzz.LatestRev)
      }
    }
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    import graft.fuzz.Fuzz
    val tables = Fuzz.loadTables(spark, sfDir)
    Fuzz.catalog.keys.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    seeds.foreach { case (seed, rev) =>
      val p = Fuzz.genPlan(seed, rev)
      val sql = Fuzz.toSql(p)
      try {
        val got = Fuzz.canonSpark(spark.sql(sql))
        val exp = Fuzz.canonRef(Fuzz.eval(p, tables), p.schema)
        if (got == exp)
          println(s"[sqlprobe] seed $seed@r$rev AGREE rows=${got.size}")
        else {
          println(s"[sqlprobe] seed $seed@r$rev DIFFER " +
            s"spark=${got.size} ref=${exp.size}")
          println(sql)
        }
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"[sqlprobe] seed $seed@r$rev ERROR ${e.getClass.getName}: " +
          s"${e.getMessage}")
        println(sql)
      }
    }
  }
}
