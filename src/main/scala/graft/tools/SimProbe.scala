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
    val AuditTau = 0.75
    def run(n: String): org.apache.spark.sql.DataFrame = n match {
      // de-confounded audit arms (r15 verdict item 4): same pipelines,
      // τ raised out of the background-cosine tail — on a ScaleStress
      // corpus the planted twins are the expected output
      case "audit_pairs" => graft.operators.Similarity.auditPairs(spark, d, AuditTau)
      case "audit_dedup" => graft.operators.Similarity.auditDedup(spark, d, AuditTau)
      case _ => graft.operators.Similarity.queries(n)(spark, d)
    }
    names.foreach { n =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val rows = run(n).count()
        println(f"[simprobe] $n rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
      }
      // corpus-structure check for the ScaleStress replica recipes: pairs
      // crossing a replica boundary (ids differ in their 10⁷ stride slot)
      // should be ≈0 when the decorrelation mask works (r15 verdict item 4)
      if (n == "sim_cosine_pairs" || n == "audit_pairs") {
        import org.apache.spark.sql.functions._
        val p = run(n)
        val cross = p.where(
          floor(col("vec_a") / 10000000L) =!= floor(col("vec_b") / 10000000L)).count()
        println(s"[simprobe] $n cross_replica_pairs=$cross")
      }
    }
    spark.stop()
  }
}
