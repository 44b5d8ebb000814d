package graft.tools

/** Round-12 smoke: the three new declared queries on sf0.001. */
object Smoke12 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    for (q <- Seq("q01_pricing_summary_orc", "mm_frame_dupes_real",
        "st_sessions_changelog")) {
      val t0 = System.nanoTime
      val df = graft.SparkEntry.queries(q)(spark, d)
      val n = df.count()
      println(f"$q%-28s rows=$n%6d  ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    graft.SparkEntry.queries("mm_frame_dupes_real")(spark, d)
      .orderBy("doc_a").show(6)
    spark.stop()
  }
}
