package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: isolate sim_dedup_corpus's stages at a stress scale —
  * cosine pairs, connected components, and the final anti-join — to
  * locate the stats-estimation BigInteger blowup seen at 30×. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = graft.GraftSession.builder(32, 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairs = graft.operators.Similarity.queries("sim_cosine_pairs")(spark, d)
      .select(col("vec_a"), col("vec_b"))
    time("pairs count") { println("  pairs=" + pairs.count()) }
    val cc = time("components build+exec") {
      val c = graft.operators.Dedup.connectedComponents(pairs)
      println("  cc=" + c.count()); c
    }
    val drop = cc.where(col("doc_id") =!= col("component_id"))
      .select(col("doc_id").as("vec_id"))
    time("drop count") { println("  drop=" + drop.count()) }
    val out = graft.sources.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"))
      .join(drop, Seq("vec_id"), "left_anti")
    time("anti-join count") { println("  out=" + out.count()) }
    spark.stop()
  }
}
