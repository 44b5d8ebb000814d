package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage attribution of the cosinePairs layouts. */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = graft.GraftSession.builder(32, 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = e.count()
    val k = if (n <= 6400) 6 else if (n <= 25600) 8 else 10
    val l = Map(6 -> 8, 8 -> 12, 10 -> 17)(k)
    println(s"[pairprobe] n=$n k=$k l=$l")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pairprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val bv = graft.operators.Similarity.bucketIds(e, k, l).join(e, "vec_id")
    time("bv count") { println("  bv=" + bv.count()) }
    val x = bv.select(col("table_id"), col("bucket"),
      col("vec_id").as("vec_a"), col("v").as("va"))
    val y = bv.select(col("table_id"), col("bucket"),
      col("vec_id").as("vec_b"), col("v").as("vb"))
    val joined = x.join(y,
      x("table_id") === y("table_id") && x("bucket") === y("bucket") &&
        col("vec_a") < col("vec_b"))
    time("join emit count") { println("  pairs=" + joined.count()) }
    val scored = joined.select(col("vec_a"), col("vec_b"),
      expr("cosine_sim(va, vb)").as("cos_sim"))
      .where(col("cos_sim") >= 0.45)
    time("scored+filtered count") { println("  surv=" + scored.count()) }
    time("distinct count") { println("  dist=" + scored.distinct().count()) }
    println("[pairprobe] PLAN:")
    scored.explain("formatted")
    spark.stop()
  }
}
