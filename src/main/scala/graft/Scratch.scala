package graft

/** Dev scratchpad — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(8, 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q02_revenue_filter", "q03_segment_revenue", "q09_brand_stats", "ta_token_stats")) {
      println(s"==== $q ====")
      SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
