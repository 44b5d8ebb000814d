package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Similarity search over the `embeddings` table (`Array[Float]` 64-dim).
  *
  * Two paths, as a 100 TB design demands:
  *   - [[topkBrute]]: exact brute force — broadcast the (small) query set,
  *     one scan of the corpus, per-query top-k via window. The baseline
  *     and the oracle-checked truth.
  *   - [[topkLsh]]: random-hyperplane LSH — corpus bucketed by L sign
  *     signatures; only same-bucket candidates are scored. The scan →
  *     bucket-join replaces the all-pairs scoring; recall is tested
  *     differentially against the brute-force truth.
  *
  * Scoring uses the native codegen'd [[graft.functions.CosineSimilarity]]
  * expression (`cosine_sim` via GraftExtensions).
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Exact top-5 cosine neighbors for queries vec_id < 10. */
  private val topkBrute: Q = (s, d) => {
    val e = vecs(s, d)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"),
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos_sim").desc, col("vec_id"))).as("rnk"))
      .where(col("rnk") <= 5)
  }

  /** Cosine near-dup pairs at τ ≥ 0.45 (brute force; the LSH/banding
    * path is the scale variant, as with Dedup). τ chosen below this
    * corpus's max pair similarity so the check is non-trivial. */
  private val cosinePairs: Q = (s, d) => {
    val e = vecs(s, d)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        expr("cosine_sim(a.v, b.v)").as("cos_sim"))
      .where(col("cos_sim") >= 0.45)
  }

  // ---- LSH scale path ---------------------------------------------------
  private val Tables_L = 8  // hash tables
  private val Bits_K = 6    // hyperplanes per table

  /** Deterministic ±1 hyperplanes (seeded per table/bit) — fixed model
    * shipped as literals, no training pass. */
  private[graft] val planes: Array[Array[Array[Double]]] =
    Array.tabulate(Tables_L, Bits_K) { (t, j) =>
      val rnd = new scala.util.Random(7919L * t + 104729L * j + 42)
      Array.fill(64)(if (rnd.nextBoolean()) 1.0 else -1.0)
    }

  /** Sign-bit signature per (table, vector): bit j = sign of
    * dot(v, plane_tj), via the codegen'd `dot_prod` expression (an
    * interpreted higher-order aggregate here costs ~50× per row).
    * Returns (vec_id, v, table_id, bucket). */
  private[graft] def buckets(df: DataFrame): DataFrame = {
    def dotWithPlane(t: Int, j: Int) =
      expr(s"dot_prod(v, array(${planes(t)(j).mkString(", ")}))")
    val bucketCols = (0 until Tables_L).map { t =>
      (0 until Bits_K).map { j =>
        when(dotWithPlane(t, j) > 0.0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
    }
    df.withColumn("bucket_arr", array(bucketCols: _*))
      .select(col("vec_id"), col("v"), posexplode(col("bucket_arr")))
      .toDF("vec_id", "v", "table_id", "bucket")
  }

  /** Approximate top-5: score only same-bucket candidates in any of the
    * L tables. At 100 TB the bucket join shuffles each vector L times
    * instead of scoring it against every query. */
  private val topkLsh: Q = (s, d) => {
    val b = buckets(vecs(s, d))
    // Explicit renames: qb derives from b, so same-named columns would
    // resolve to one attribute (trivially-true join condition).
    val qb = b.where(col("vec_id") < 10)
      .toDF("query_id", "qv", "q_table", "q_bucket")
    val cand = b.join(qb,
        col("table_id") === col("q_table") && col("bucket") === col("q_bucket") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"), col("v"))
      .distinct()
    cand.withColumn("cos_sim", expr("cosine_sim(qv, v)"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"),
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos_sim").desc, col("vec_id"))).as("rnk"))
      .where(col("rnk") <= 5)
  }

  // ---- IVF scale path ---------------------------------------------------
  private val IvfLists = 16  // inverted lists (pseudo-centroids)
  private val IvfProbes = 4  // lists searched per query

  /** IVF-style ANN without a training pass: pseudo-centroids are fixed
    * unit ±1 vectors (the same deterministic family as the LSH planes);
    * every vector is assigned to its best-dot-product list, queries
    * probe their `IvfProbes` best lists. One shuffle on list id; each
    * query scores |corpus|·(probes/lists) candidates instead of all —
    * the coarse-quantizer half of IVF-Flat (public FAISS design),
    * k-means refinement being an offline upgrade that only changes the
    * assignment table. */
  private[graft] val centroids: Array[Array[Double]] =
    Array.tabulate(IvfLists) { c =>
      val rnd = new scala.util.Random(15485863L * (c + 1))
      Array.fill(64)(if (rnd.nextBoolean()) 1.0 else -1.0)
    }

  private def centroidDot(c: Int) =
    expr(s"dot_prod(v, array(${centroids(c).mkString(", ")}))")

  /** (…input cols…, list_id[] of the k best centroids). */
  private def assignLists(df: DataFrame, k: Int): DataFrame = {
    val scored = df.withColumn("c_scores",
      array((0 until IvfLists).map(centroidDot): _*))
    scored.withColumn("lists", expr(
      s"""transform(slice(array_sort(zip_with(c_scores, sequence(0, ${IvfLists - 1}),
          (s, i) -> struct(-s AS negs, i AS idx))), 1, $k), x -> x.idx)"""))
      .drop("c_scores")
  }

  /** Approximate top-5 via IVF lists: corpus in 1 list each, queries
    * probe 4. */
  private val topkIvf: Q = (s, d) => {
    val corpus = assignLists(vecs(s, d), 1)
      .select(col("vec_id"), col("v"), col("lists")(0).as("list_id"))
    val qs = assignLists(vecs(s, d).where(col("vec_id") < 10), IvfProbes)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(col("lists")).as("list_id"))
    corpus.join(qs, Seq("list_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("v"))
      .distinct()
      .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"),
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos_sim").desc, col("vec_id"))).as("rnk"))
      .where(col("rnk") <= 5)
  }

  val queries: Map[String, Q] = Map(
    "sim_topk_cosine" -> topkBrute,
    "sim_cosine_pairs" -> cosinePairs,
    "sim_topk_lsh" -> topkLsh,
    "sim_topk_ivf" -> topkIvf,
  )

  // Oracle mirrors the Expression's exact fold: left-to-right products,
  // dot/(sqrt(na)*sqrt(nb)).
  private val cosSql = (a: String, b: String) =>
    s"""list_reduce(list_transform(list_zip($a, $b), x -> x[1] * x[2]), (p, q) -> p + q) /
        (sqrt(list_reduce(list_transform($a, x -> x * x), (p, q) -> p + q)) *
         sqrt(list_reduce(list_transform($b, x -> x * x), (p, q) -> p + q)))"""

  val oracle: Map[String, String] = Map(
    "sim_topk_cosine" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
          q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
          p AS (SELECT query_id, e.vec_id AS neighbor_id,
                  ${cosSql("qv", "v")} AS cos_sim
                FROM e JOIN q ON e.vec_id <> q.query_id)
          SELECT query_id, neighbor_id, cos_sim, rnk FROM (
            SELECT query_id, neighbor_id, cos_sim,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM p) WHERE rnk <= 5""",
    "sim_cosine_pairs" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
            ${cosSql("a.v", "b.v")} AS cos_sim
          FROM e a JOIN e b ON a.vec_id < b.vec_id
          WHERE ${cosSql("a.v", "b.v")} >= 0.45""",
    // sim_topk_lsh: no oracle (approximate; recall tested differentially
    // against sim_topk_cosine in SimilaritySpec) → rows-only check.
  )
}
