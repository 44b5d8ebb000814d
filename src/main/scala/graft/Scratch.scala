package graft

import org.apache.spark.sql.functions._

/** Dev scratchpad — not part of the library surface. */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[time] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32, 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    time("shingleSets count")(println(operators.Dedup.shingleSets(spark, d).count()))
    val ex = operators.Dedup.shingleSets(spark, d)
      .where(col("set_size") > 0)
      .select(col("doc_id"), col("set_size"), explode(col("sh")).as("shingle"))
    time("exploded shingles")(println(ex.count()))
    val freq = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    time("distinct shingles")(println(freq.count()))
    println("df quantiles: " + freq.stat.approxQuantile("df", Array(0.5, 0.9, 0.99, 1.0), 0.01).mkString(","))

    import org.apache.spark.sql.expressions.Window
    val tau = 0.8
    val prefix = ex.join(freq, "shingle")
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))))
      .where(col("r") <= col("set_size") - ceil(col("set_size") * tau) + 1)
      .select(col("doc_id"), col("set_size"), col("shingle"))
    time("prefix rows")(println(prefix.count()))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.set_size") >= col("b.set_size") * tau &&
        col("b.set_size") >= col("a.set_size") * tau)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("candidate rows (pre-distinct)")(println(cand.count()))
    time("candidate pairs (distinct)")(println(cand.distinct().count()))

    time("minhash signatures")(println(operators.Dedup.minhashSignatures(spark, d).count()))
    time("full dd_minhash_lsh")(println(operators.Dedup.queries("dd_minhash_lsh")(spark, d).count()))
    time("full dd_ngram_jaccard")(println(operators.Dedup.queries("dd_ngram_jaccard")(spark, d).count()))
    spark.stop()
  }
}
