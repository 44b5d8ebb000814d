package graft.tools

/** Dev probe: time each sim_* declared query end-to-end (count
  * terminal) at a given sf dir, one JVM, printing per-query seconds —
  * the attribution tool for the 30× scale point. */
object SimProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("sim_cosine_pairs", "sim_knn_self", "sim_dedup_corpus")
    val spark = graft.GraftSession.builder(32, 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val rows = graft.operators.Similarity.queries(n)(spark, d).count()
        println(f"[simprobe] $n rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
      }
    }
    spark.stop()
  }
}
