package graft

/** Dev scratchpad — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val d = "/root/testdata/sf0.001"
    val jac = operators.Dedup.queries("dd_ngram_jaccard")(spark, d)
    println("jaccard pairs sf0.001:")
    jac.show(30, false)
    val sh = operators.Dedup.simhashPairs(spark, d, 8)
    println("simhash pairs (<=8):")
    sh.show(30, false)
    val brute = operators.Similarity.queries("sim_topk_cosine")(spark, d)
    val lsh = operators.Similarity.queries("sim_topk_lsh")(spark, d)
    val b = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val l = lsh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"brute=${b.size} lsh=${l.size} overlap=${(b & l).size} recall=${(b & l).size.toDouble / b.size}")
    spark.stop()
  }
}
