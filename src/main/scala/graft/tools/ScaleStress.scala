package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Dev tool (r14 verdict item 3 — the first MEASURED scale audit):
  * derive a `factor`×-larger corpus from an existing sf dir by
  * deterministic id-shifted replication, so the heaviest operators can
  * be timed at two scales and report a measured scaling exponent
  * instead of a by-construction argument. Writes ONLY the four tables
  * the heavy set reads (documents, embeddings, events, lineitem) into `dest`
  * in the standard `<table>.parquet` layout, so `Bench` runs against
  * it with `SPARK_GRAFT_SF_DIR=<dest>`.
  *
  * Replication preserves each table's STRUCTURE rather than stacking
  * exact copies (which would measure an adversarial all-duplicates
  * corpus, not scale):
  *   - ids shift by `replica × 10⁷` (disjoint id spaces — the
  *     bipartite graph becomes `factor` disjoint copies, so graph
  *     fixpoints see `factor`× nodes with unchanged component sizes);
  *   - document text mutates per replica (every 5th word, offset by
  *     the replica index, gets a replica suffix): ~20% token churn
  *     pushes cross-replica shingle Jaccard far below the near-dup
  *     thresholds, so dedup group-size DISTRIBUTIONS are preserved at
  *     `factor`× group count instead of every group fanning ×factor;
  *   - embeddings CYCLIC-SHIFT their dimensions by `replica × 7`:
  *     norm and value distribution are exactly preserved while the
  *     cosine between a vector and its shifted copy collapses to the
  *     random-vector baseline, so neighbor structure stays
  *     replica-local instead of every LSH/IVF bucket densifying
  *     ×factor (a first attempt used a ±0.003 additive perturbation —
  *     far inside cosine noise, and the sim_* ratios measured bucket
  *     blow-up, not scale).
  *
  * Deterministic throughout (no RNG), so two runs produce identical
  * corpora. Usage:
  *   runMain graft.tools.ScaleStress <srcSfDir> <destDir> [factor]
  */
object ScaleStress {
  private val IdStride = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dest = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.GraftSession.builder(cpus, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dest).mkdirs()

    def write(df: DataFrame, table: String, files: Int): Unit =
      df.repartition(files).write.mode(SaveMode.Overwrite)
        .parquet(s"$dest/$table.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docsX = (0 until factor).map { i =>
      val base = docs
        .withColumn("doc_id", col("doc_id") + lit(i * IdStride))
      val mutated =
        if (i == 0) base
        else base.withColumn("text", expr(
          s"array_join(transform(split(text, ' '), " +
            s"(w, p) -> IF(p % 5 = $i % 5, concat(w, '_r$i'), w)), ' ')"))
      mutated.withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionAll _)
    write(docsX, "documents", factor * 2)

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embX = (0 until factor).map { i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i * IdStride))
        .withColumn("embedding", expr(
          s"transform(embedding, (x, j) -> element_at(embedding, " +
            s"1 + pmod(j + $i * 7, size(embedding))))"))
    }.reduce(_ unionAll _)
    write(embX, "embeddings", factor)

    // events: disjoint user spaces per replica — the as-of merge and
    // the window composition both key on user_id, so 10× events means
    // 10× users at unchanged per-user history length (the production
    // shape), and the ts distribution is untouched
    val ev = spark.read.parquet(s"$src/events.parquet")
    val evX = (0 until factor).map { i =>
      ev.withColumn("event_id", col("event_id") + lit(i * IdStride))
        .withColumn("user_id", col("user_id") + lit(i * IdStride))
    }.reduce(_ unionAll _)
    write(evX, "events", factor * 2)

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val liX = (0 until factor).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * IdStride))
        .withColumn("l_partkey", col("l_partkey") + lit(i * IdStride))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * IdStride))
    }.reduce(_ unionAll _)
    write(liX, "lineitem", factor * 4)

    Seq("documents", "embeddings", "events", "lineitem").foreach { t =>
      println(s"[scalestress] $t rows=" +
        spark.read.parquet(s"$dest/$t.parquet").count())
    }
    spark.stop()
  }
}
