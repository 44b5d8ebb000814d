package graft.tools

/** Dev tool: run single fuzz seeds through the Spark-vs-interpreter
  * differential outside the spec's fixed sweep range — used to
  * adjudicate oracle-side failures (is it our renderer or the oracle
  * engine?). Prints AGREE/DIFFER per seed plus the SQL on differ. */
object FuzzCheckOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    // seeds may carry a revision suffix "seed@rev" (default LatestRev)
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
    seeds.foreach { case (seed, rev) =>
      val p = Fuzz.genPlan(seed, rev)
      val got = Fuzz.canonSpark(Fuzz.toDF(p, spark, sfDir))
      val exp = Fuzz.canonRef(Fuzz.eval(p, tables), p.schema)
      if (got == exp) println(s"[fuzzcheck] seed $seed@r$rev AGREE rows=${got.size}")
      else {
        println(s"[fuzzcheck] seed $seed@r$rev DIFFER spark=${got.size} ref=${exp.size}")
        println(Fuzz.toSql(p))
      }
    }
    spark.stop()
  }
}
