package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: price the LSH bucket-id computation and candidate
  * generation in isolation at a given sf dir, to attribute the
  * adaptive-(k,L) slowdown (codegen fallback vs candidate volume). */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = graft.GraftSession.builder(32, 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = e.count()
    println(s"[lshprobe] n=$n")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lshprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for ((bits, tables) <- Seq((6, 8), (8, 12), (10, 17))) {
      val b = graft.operators.Similarity.bucketIds(e, bits, tables)
      time(s"bucketIds k=$bits L=$tables count") { b.count() }
      time(s"bucketIds k=$bits L=$tables count (2nd)") { b.count() }
      val cand = b.as("x").join(b.as("y"),
        col("x.table_id") === col("y.table_id") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id"), col("y.vec_id"))
      time(s"candidates k=$bits L=$tables count") { println("  cand=" + cand.count()) }
      time(s"candidates-distinct k=$bits L=$tables") { println("  dist=" + cand.distinct().count()) }
    }
    spark.stop()
  }
}
