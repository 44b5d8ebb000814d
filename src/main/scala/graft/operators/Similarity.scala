package graft.operators

import graft.Checkpoints.CheckpointOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Similarity search over the `embeddings` table (`Array[Float]` 64-dim).
  *
  * Three declared paths, each with a 100 TB shape:
  *   - [[topkBrute]]: exact brute force — broadcast the (small) query set,
  *     one scan of the corpus, per-query top-k via window. The baseline
  *     and the oracle-checked exact truth.
  *   - [[topkLsh]] / [[cosinePairs]]: random-hyperplane LSH — corpus
  *     bucketed by L sign signatures ((k, L) corpus-size-adaptive, one
  *     native `lsh_buckets` kernel); only same-bucket candidates are
  *     scored. The SMALL-query path ([[topkLsh]]) moves id-only
  *     candidate rows and re-joins vectors once; the SELF-join paths
  *     ([[cosinePairs]]/[[knnSelf]]) carry vectors INTO the bucket
  *     join (corpus × L bounded shuffle) and score pairs inside the
  *     join's pipelined stream, so the quadratic-in-occupancy pair
  *     stream never materializes. The hyperplanes are fixed seeded ±1
  *     vectors, so the whole candidate set is deterministic and the
  *     DuckDB oracle replicates it bit-exactly (dot products are ±v_i
  *     sums folded left-to-right in both engines).
  *   - [[topkIvf]]: IVF coarse quantization — one list per corpus vector,
  *     queries probe 4; the list join is broadcast (queries are few), so
  *     no corpus shuffle at all. Also literal-deterministic and oracled.
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

  // ---- LSH scale path ---------------------------------------------------
  private val Tables_L = 8  // hash tables at the base design point (k = 6)
  private val Bits_K = 6    // hyperplanes per table at the base design point

  // Adaptive sizing (the round-15 scale audit's one real flag): with a
  // FIXED bit count, mean bucket occupancy grows linearly with corpus
  // size and same-bucket candidate PAIRS grow quadratically in it —
  // sim_cosine_pairs measured exponent ≥ 2.4 on the 10×→30× interval
  // (BASELINE.md). Fix: k(n) = smallest k in [6, 12] with 2^k · 100 ≥ n
  // (mean occupancy ≤ ~100; integer-exact, so the DuckDB oracle's
  // `par` CTE reproduces it bit-for-bit), and L(k) rises with k to hold
  // the design recall: miss = (1 − p^k)^L ≤ 0.02 at design similarity
  // 0.9, p = 1 − θ/π ≈ 0.856 (Indyk–Motwani random-hyperplane family).
  // Per +1 bit, occupancy halves while L grows ×≈1.17, so candidate
  // work per vector stays bounded — the audit's quadratic knee becomes
  // a sawtooth around linear. At n ≤ 6400 (sf ≤ 0.1) the formula
  // yields the base (k=6, L=8): every declared value and committed
  // price is unchanged; adaptivity engages only on stress corpora.
  private val BucketTarget = 100L
  private val MinBits = 6
  private[graft] val MaxBits = 12
  private[graft] val tablesForBits: Map[Int, Int] =
    Map(6 -> 8, 7 -> 10, 8 -> 12, 9 -> 14, 10 -> 17, 11 -> 20, 12 -> 24)
  private[graft] def bitsFor(n: Long): Int =
    (MinBits to MaxBits).find(j => (BucketTarget << j) >= n).getOrElse(MaxBits)
  private val MaxTables = tablesForBits(MaxBits)

  /** Deterministic ±1 hyperplanes (seeded per table/bit) — fixed model
    * shipped as literals, no training pass. Generated out to the
    * adaptive maximum (24 × 12) from the shared
    * [[graft.functions.LshPlanes]] family (the native `lsh_buckets`
    * expression holds the same matrix); the base 8 × 6 block is
    * bit-identical to every prior round (same per-(t,j) seeds). */
  private[graft] val planes: Array[Array[Array[Double]]] =
    Array.tabulate(MaxTables, MaxBits)(graft.functions.LshPlanes.plane)

  /** ID-only LSH assignments: (vec_id, table_id, bucket). Bit j of a
    * table's bucket = sign of dot(v, plane_tj), via the codegen'd
    * `dot_prod` expression (an interpreted higher-order aggregate here
    * costs ~50× per row). Vectors are dropped BEFORE any join: candidate
    * generation and dedup move 12-byte rows, never ~1 KB vector rows —
    * at 100 TB the bucket join shuffles ids, and each surviving
    * candidate fetches its vector exactly once. */
  private[graft] def bucketIds(df: DataFrame, bits: Int = Bits_K,
                               tables: Int = Tables_L): DataFrame =
    // ONE native expression for all L bucket ids (LshBuckets). The
    // obvious composition — one codegen'd dot_prod per (t, j), each
    // embedding its 64-literal plane — bloats the generated projection
    // past Janino's 64 KB method limit at the adaptive design points
    // (measured: 8-16 s per pass at k=6..8, outright interpreted
    // fallback at k=10), which is why the kernel owns the whole loop.
    df.withColumn("bucket_arr", expr(s"lsh_buckets(v, $tables, $bits)"))
      .select(col("vec_id"), posexplode(col("bucket_arr")))
      .toDF("vec_id", "table_id", "bucket")

  /** Approximate top-5: score only same-bucket candidates in any of the
    * L tables. The query-side bucket table (|Q|·L rows) broadcasts, so
    * candidate generation is a map-side join over corpus bucket ids;
    * dedup runs on (query_id, vec_id) pairs; vectors join back once. */
  /** Corpus-size-adaptive (bits, tables): one metadata-only count of
    * the embeddings table picks the design point; the oracle's `par`
    * CTE computes the identical integers from the identical count. */
  private def lshParams(s: SparkSession, d: String): (Int, Int) = {
    val k = bitsFor(Tables.embeddings(s, d).count())
    (k, tablesForBits(k))
  }

  private val topkLsh: Q = (s, d) => {
    val e = vecs(s, d)
    val (k, l) = lshParams(s, d)
    val b = bucketIds(e, k, l)
    // bucket the query side AFTER the filter: 10 vectors get hashed, not
    // a second full-corpus pass (bucketIds is per-row, so this is
    // equivalent — and the query-side subtree stays broadcast-sized).
    // Same (k, l) as the corpus side: probes must hash into the same
    // tables.
    val qb = bucketIds(e.where(col("vec_id") < 10), k, l)
      .toDF("query_id", "q_table", "q_bucket")
    val cand = b.join(broadcast(qb),
        col("table_id") === col("q_table") && col("bucket") === col("q_bucket") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val qv = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    cand.join(e, "vec_id")
      .join(broadcast(qv), "query_id")
      .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"),
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos_sim").desc, col("vec_id"))).as("rnk"))
      .where(col("rnk") <= 5)
  }

  /** Cosine near-dup pairs at τ ≥ 0.45: LSH candidates + exact verify —
    * the same candidates-then-verify contract as
    * [[Dedup]]'s `dd_minhash_lsh`. Declared semantics are "pairs sharing
    * ≥1 LSH bucket with exact cosine ≥ τ": the candidate set is
    * deterministic (fixed ±1 hyperplanes), every reported pair carries
    * its EXACT similarity (precision 1), and the DuckDB oracle replicates
    * the bucketing bit-for-bit — a hash-verified check, unlike the brute
    * all-pairs formulation this replaces, which planned as an O(n²)
    * nested-loop join (dead at 100×). Recall vs brute force follows the
    * band-collision curve (1−(1−p^K)^L, p = 1−θ/π): ≈ 1 at true near-dup
    * similarity (≥ 0.9), by design NOT 1 in the sub-0.6 noise regime —
    * the standard ANN-dedup trade (SimilaritySpec pins both properties
    * differentially against brute force). */
  /** Verify-in-the-join layout (round 15): vectors ride the bucket
    * rows ONCE (corpus × L ≈ bounded shuffle), the bucket self-join's
    * pair stream is scored and τ-filtered INSIDE whole-stage codegen —
    * the P candidate pairs (P ≫ L·n at any occupancy target) are never
    * materialized, shuffled, or distinct'ed — and only the τ-survivors
    * dedup. Replaces the id-only-candidates-then-rejoin form whose two
    * sort-merge joins shipped a 512-byte vector per candidate pair
    * (measured 224 s at the 30× stress point vs ~20 s for this shape;
    * same declared semantics, same oracle). */
  private val cosinePairs: Q = (s, d) => {
    val (k, l) = lshParams(s, d)
    cosinePairsAt(s, d, k, l)
  }

  /** The adaptive-arm GATE query (r15 verdict item 3): `sim_cosine_
    * pairs_k8` runs the identical pipeline with the design point
    * FORCED to (k=8, l=12) — the k(n)-breakpoint the stress corpora
    * hit — so the k ≥ 7 plane matrix, the one-kernel `lsh_buckets`
    * path above the base point, and the oracle's guarded `bucketSql`
    * cases all carry a DuckDB-hash CORRECTNESS row at every sf instead
    * of only uncommitted probe runs. */
  private val cosinePairsK8: Q = (s, d) => cosinePairsAt(s, d, 8, 12)

  private def cosinePairsAt(s: SparkSession, d: String,
      k: Int, l: Int, tau: Double = 0.45): DataFrame = {
    val e = vecs(s, d)
    val bv = bucketIds(e, k, l).join(e, "vec_id")
    val x = bv.select(col("table_id"), col("bucket"),
      col("vec_id").as("vec_a"), col("v").as("va"))
    val y = bv.select(col("table_id"), col("bucket"),
      col("vec_id").as("vec_b"), col("v").as("vb"))
    x.join(y,
        x("table_id") === y("table_id") && x("bucket") === y("bucket") &&
        col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        expr("cosine_sim(va, vb)").as("cos_sim"))
      .where(col("cos_sim") >= tau)
      .distinct()
  }

  /** Scale-audit entry points (r15 verdict item 4): the SAME pipeline
    * as `sim_cosine_pairs` / `sim_dedup_corpus` with the τ threshold
    * raised out of the background-cosine tail. At dim 64 the corpus's
    * pairwise-cosine distribution has std ≈ 1/√dim ≈ 0.125, so
    * τ = 0.45 (~3.6σ) sits INSIDE the random tail — near-dup pair
    * count at that τ grows ~quadratically in n for ANY fixed
    * continuous embedding distribution, which confounds scaling
    * exponents with output growth. τ = 0.75 (~6σ) admits only planted
    * or true near-dup structure, so the audit measures the PIPELINE
    * (bucketing, bucket join, verify, dedup) at controlled linear
    * output. Declared-query semantics are untouched. */
  private[graft] def auditPairs(s: SparkSession, d: String, tau: Double): DataFrame = {
    val (k, l) = lshParams(s, d)
    cosinePairsAt(s, d, k, l, tau)
  }

  private[graft] def auditDedup(s: SparkSession, d: String, tau: Double): DataFrame = {
    val drops = Dedup.connectedComponents(
        auditPairs(s, d, tau).select(col("vec_a"), col("vec_b")))
      .where(col("doc_id") =!= col("component_id"))
      .select(col("doc_id").as("vec_id"))
    Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      .join(drops, Seq("vec_id"), "left_anti")
  }

  private val KnnSelfK = 5

  /** Self-kNN join: EVERY corpus vector's top-[[KnnSelfK]] nearest
    * LSH-candidate neighbors — the embedding-pipeline workhorse that
    * feeds SemDeDup clustering, diversity sampling, and the doc-level
    * affinity graph (`gr_knn_graph`'s construction on semantic edges
    * instead of co-occurrence). Differs from [[topkBrute]]/[[topkLsh]]
    * (a SMALL query set against the corpus — broadcastable) in that
    * every vector is a query, so the all-pairs form is O(n²) and dead
    * at scale; declared semantics are "top-k among vectors sharing ≥1
    * LSH bucket" — deterministic candidates (fixed ±1 hyperplanes),
    * exact cosine on every survivor, (cos DESC, id) tie-break.
    *
    * 100 TB shape: [[cosinePairs]]' discipline with a per-vector
    * window on top — the bucket join and dedup move id-only rows,
    * vectors join exactly twice (probe + neighbor side, both hash
    * joins on id), and the row_number window partitions by vec_id
    * over ONLY that vector's LSH candidates (collision-bounded, never
    * the corpus). */
  private val knnSelf: Q = (s, d) => {
    // same verify-in-the-join layout as [[cosinePairs]], plus a
    // BUCKET-LOCAL top-k before the global one: if nbr is in a
    // vector's global top-k under the total order (cos DESC, nbr),
    // then in EVERY bucket containing both, fewer than k candidates
    // outrank it — so it survives that bucket's local top-k, and
    // top-k(dedup(∪ local top-k)) = top-k(dedup(all pairs)) exactly.
    // The local window rides the join's (table, bucket) hash
    // partitioning (no extra exchange, one in-partition sort of
    // 40-byte rows), and the dedup + global window then run on
    // ≤ L·k rows per vector instead of the full scored pair stream
    // (77M → ≤5M at the 30× stress point).
    val e = vecs(s, d)
    val (k, l) = lshParams(s, d)
    val bv = bucketIds(e, k, l).join(e, "vec_id")
    val x = bv.select(col("table_id"), col("bucket"),
      col("vec_id"), col("v").as("va"))
    val y = bv.select(col("table_id"), col("bucket"),
      col("vec_id").as("nbr"), col("v").as("vb"))
    x.join(y,
        x("table_id") === y("table_id") && x("bucket") === y("bucket") &&
        col("vec_id") =!= col("nbr"))
      .select(x("table_id"), x("bucket"), col("vec_id"), col("nbr"),
        expr("cosine_sim(va, vb)").as("cos_sim"))
      .withColumn("lrnk", row_number().over(
        Window.partitionBy("table_id", "bucket", "vec_id")
          .orderBy(col("cos_sim").desc, col("nbr"))))
      .where(col("lrnk") <= KnnSelfK)
      .select("vec_id", "nbr", "cos_sim")
      .distinct()
      .withColumn("rnk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos_sim").desc, col("nbr"))))
      .where(col("rnk") <= KnnSelfK)
      .select("vec_id", "nbr", "rnk", "cos_sim")
  }

  /** Embedding-level deduped corpus — the SemDeDup-style pipeline
    * (public design: Abbas et al. 2023, "SemDeDup": semantic dedup via
    * embedding-space near-dup clusters) composed end-to-end from parts
    * that are each already oracle-checked: [[cosinePairs]] near-dup
    * pairs (LSH buckets + exact cosine ≥ 0.45) → connected components
    * (min-label propagation + pointer jumping, `Dedup`'s operator) →
    * keep each cluster's min-id representative, anti-join the rest out.
    * The embedding analog of `dd_dedup_corpus`: that one drops textual
    * near-dups, this one drops SEMANTIC near-dups text hashing can't
    * see (translations, paraphrases, re-encodes).
    *
    * 100 TB shape: inherits its parts' — id-only candidate joins and
    * banded buckets from [[cosinePairs]], O(log diameter) rounds and
    * O(1)-round resident state from `connectedComponents`, and the
    * final anti-join moves only the (small) drop list against the
    * corpus scan. */
  /** Semantic near-dup drop list: non-representative members of the
    * cosine-cluster closure. Shared by [[semDedupCorpus]] and the
    * multi-signal `pl_dedup_signals`. */
  private[graft] def semDropIds(s: SparkSession, d: String): DataFrame =
    Dedup.connectedComponents(cosinePairs(s, d).select(col("vec_a"), col("vec_b")))
      .where(col("doc_id") =!= col("component_id"))
      .select(col("doc_id").as("vec_id"))

  private lazy val semDedupCorpus: Q = (s, d) =>
    Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      .join(semDropIds(s, d), Seq("vec_id"), "left_anti")

  // ---- IVF scale path ---------------------------------------------------
  private val IvfLists = 16  // inverted lists (pseudo-centroids)
  private val IvfProbes = 4  // lists searched per query

  /** IVF-style ANN without a training pass: pseudo-centroids are fixed
    * unit ±1 vectors (the same deterministic family as the LSH planes);
    * every vector is assigned to its best-dot-product list, queries
    * probe their `IvfProbes` best lists — the coarse-quantizer half of
    * IVF-Flat (public FAISS design), k-means refinement being an offline
    * upgrade that only changes the assignment table. */
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
    * probe 4. The 40-row query side broadcasts, so the list "join" is
    * map-side over the corpus scan — zero corpus shuffle before the
    * final (narrow) top-k window. A corpus vector sits in exactly one
    * list, so a (query, vec) pair can match at most once: no dedup
    * exists on this path (the old `distinct()` here shuffled every
    * candidate with two 64-dim vectors for a dedup that removed
    * nothing). */
  private val topkIvf: Q = (s, d) => {
    val corpus = assignLists(vecs(s, d), 1)
      .select(col("vec_id"), col("v"), col("lists")(0).as("list_id"))
    val qs = assignLists(vecs(s, d).where(col("vec_id") < 10), IvfProbes)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(col("lists")).as("list_id"))
    corpus.join(broadcast(qs), Seq("list_id"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"),
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos_sim").desc, col("vec_id"))).as("rnk"))
      .where(col("rnk") <= 5)
  }

  // ---- Scalar-quantization scale path ------------------------------------

  /** Scalar-quantized (SQ8 / int8) approximate top-5 — the embedding
    * MEMORY scale path (public FAISS `SQ8` design): each vector is
    * quantized per-vector to int8 codes (scale = max|v|/127,
    * q_i = floor(v_i/scale + 0.5) — floor(x+0.5), not round(), because
    * round-half tie semantics differ across engines), and cosine is
    * computed entirely from EXACT int64 sums — the per-vector scale
    * cancels in cosine, so no float accumulation appears anywhere and
    * the score is bit-identical across engines (the norms are ≤ 64·127²
    * ≪ 2⁵³; the final sqrt/divide is one IEEE operation per side).
    *
    * 100 TB shape: the quantized corpus is 4× smaller than float32
    * (16× vs the float64 scoring form) — at serving scale the int8
    * codes column is what you'd store and scan, and the integer dot is
    * the SIMD-friendly kernel every public ANN library ships. Zero
    * vectors are excluded on both sides (scale 0 has no code), queries
    * broadcast, the corpus never shuffles. Rank fidelity vs the exact
    * brute-force path is pinned differentially in [[SimilaritySpec]]. */
  /** Per-vector SQ8 codes: max-abs scale, round-half-up to int8 range.
    * Shared by [[topkSq8]] and [[kmeansSq8]]. */
  private def sq8Codes(s: SparkSession, d: String): DataFrame =
    vecs(s, d)
      .where(expr("array_max(transform(v, x -> abs(x))) > 0D"))
      .withColumn("scale", expr("array_max(transform(v, x -> abs(x))) / 127.0D"))
      .withColumn("q", expr("transform(v, x -> CAST(floor(x / scale + 0.5D) AS BIGINT))"))
      .select(col("vec_id"), col("q"))

  private val topkSq8: Q = (s, d) => topkSq8From(sq8Codes(s, d))

  /** [[topkSq8]] body over a caller-supplied code table, so
    * [[recallReport]] can hand every SQ8-consuming path the SAME
    * materialized codes instead of each path re-quantizing the corpus. */
  private def topkSq8From(qz: DataFrame): DataFrame = {
    val qq = qz.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    // scoring runs on the codegen'd integer kernel (dot_prod_long), not
    // interpreted higher-order aggregates — same exact int64 sums,
    // ~3× less per-pair cost; dot_prod_long(q, q) is the squared norm
    qz.join(broadcast(qq), col("vec_id") =!= col("query_id"))
      .withColumn("cos_q", expr(
        """CAST(dot_prod_long(q, qq) AS DOUBLE) /
           (sqrt(CAST(dot_prod_long(q, q) AS DOUBLE)) *
            sqrt(CAST(dot_prod_long(qq, qq) AS DOUBLE)))"""))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_q"),
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos_q").desc, col("vec_id"))).as("rnk"))
      .where(col("rnk") <= 5)
  }

  /** Per-label centroids (class prototypes — the embedding-space
    * aggregate behind nearest-centroid classification and IVF list
    * training). Output is flat (label, pos, n_vecs, centroid) rows —
    * one per vector dimension.
    *
    * Determinism: a distributed double sum is ORDER-DEPENDENT (fp
    * addition doesn't associate), so a naive avg() would hash-flake
    * against any oracle. Components are instead accumulated in
    * FIXED-POINT micro-units (floor(v·10⁶) per element — floor, not
    * round, because round-half tie semantics differ across engines):
    * int64 sums are exact and order-free, and the mean is one final
    * double division. Declared semantics = "micro-unit centroid",
    * mirrored exactly in the oracle; the 10⁻⁶ quantization is far below
    * any embedding's useful precision.
    *
    * 100 TB shape: posexplode → partial-agg sum — the shuffle carries
    * (label, pos) partial sums (|labels|·64 rows per partition), not
    * vectors. */
  private val labelCentroids: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")))
      .toDF("label", "pos", "v")
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)")).as("micros"))
      .selectExpr("label", "pos", "n_vecs",
        "CAST(micros AS DOUBLE) / (n_vecs * 1000000) AS centroid")

  /** The ANN quality contract as a TRACKED NUMBER: recall@5 of every
    * approximate path against the exact brute-force truth
    * ([[topkBrute]]), one row per path, over the standard query set
    * (vec_id < 10). Every path is literal-deterministic, so the whole
    * report is oracle-replayable — recall stops being a spec-side
    * inequality and becomes a hash-checked CORRECTNESS value the
    * driver regresses round over round.
    *
    * Counts are exact integers; the one `recall_at_5` division is a
    * single IEEE double op on identical integer operands in both
    * engines. 100 TB shape: each path's own plan (corpus never
    * shuffles; candidates join as ids) plus a broadcast of the 50-row
    * truth set — the report costs the sum of its paths, nothing more. */
  private lazy val recallReport: Q = (s, d) => {
    import s.implicits._
    // the truth set is BOUNDED (|Q|·5 = 50 rows) — materialize it once
    // on the driver (the trained-centroid LocalRelation discipline), so
    // the exact brute-force scan runs exactly once per report instead
    // of twice (the hit join and the n_truth count were two independent
    // subtrees re-executing the same most-expensive path)
    val truthRows = topkBrute(s, d)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val truth = truthRows.toDF("query_id", "neighbor_id")
      .withColumn("hit", lit(1))
    // the SQ8 code table feeds TWO paths (sq8 serving; ivf_trained
    // training + assignment + probe) and is corpus-sized, so a
    // LocalRelation is out — materialize it ONCE (localCheckpoint) and
    // hand the same blocks to both, instead of each path re-quantizing
    // the corpus from parquet. Values are unchanged (quantization is
    // deterministic), so the report hash is unchanged; the blocks stay
    // resident until the consumer's block hygiene drops them (the same
    // residency-visible discipline as gr_pagerank's edges).
    val codes = sq8Codes(s, d).checkpointFresh()
    val paths: Seq[(String, DataFrame)] = Seq(
      "ivf" -> topkIvf(s, d), "ivf_trained" -> topkIvfTrainedFrom(s, d, codes),
      "lsh" -> topkLsh(s, d), "sq8" -> topkSq8From(codes),
      "pq" -> topkPq(s, d))
    val returned = paths.map { case (n, q) =>
      q.select(lit(n).as("path"), col("query_id"), col("neighbor_id"))
    }.reduce(_.unionAll(_))
    returned
      .join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
      .groupBy("path").agg(
        countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_returned"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
      .withColumn("n_truth", lit(truthRows.length.toLong))
      .withColumn("recall_at_5",
        col("n_hits").cast("double") / col("n_truth"))
  }

  val queries: Map[String, Q] = Map(
    "sim_topk_cosine" -> topkBrute,
    "sim_cosine_pairs" -> cosinePairs,
    "sim_cosine_pairs_k8" -> cosinePairsK8,
    "sim_knn_self" -> knnSelf,
    "sim_dedup_corpus" -> semDedupCorpus,
    "sim_topk_lsh" -> topkLsh,
    "sim_topk_ivf" -> topkIvf,
    "sim_topk_ivf_trained" -> topkIvfTrained,
    "sim_topk_sq8" -> topkSq8,
    "sim_topk_pq" -> topkPq,
    "sim_recall_report" -> recallReport,
    "sim_label_centroids" -> labelCentroids,
    "sim_kmeans_sq8" -> kmeansSq8,
  )

  /** Distributed Lloyd's k-means over the SQ8 codes, ENTIRELY in exact
    * integer arithmetic — the clustering step behind IVF list training
    * and corpus bucketing, made hash-checkable: squared L2 distances
    * are int64 sums over int8 codes (`dot_prod_long` kernel), centroid
    * updates are per-dimension truncating integer means, and the
    * argmin ties break on centroid id. Seeds = codes of vec_id 0..k-1.
    * Float Lloyd's would drift with summation order; the quantized
    * form is bit-identical in any engine (same discipline as
    * `sim_label_centroids` / `gr_pagerank`). An empty cluster simply
    * drops (documented, deterministic).
    *
    * 100 TB shape: centroids BROADCAST every round (k·dim longs);
    * assignment is a narrow map over the corpus (argmin over k, no
    * join shuffle), and the update is one partial-agg'd
    * (cluster, dim)-keyed rollup — the textbook distributed Lloyd's.
    * Declared output is the per-cluster summary (size + exact integer
    * inertia), so the gate stays small at any corpus size. */
  private val KmeansK = 8
  private val KmeansIters = 2
  private lazy val kmeansSq8: Q = (s, d) => {
    val codes = sq8Codes(s, d)
    assignNearest(codes, trainedCentsCached(s, d, codes))
      .groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("dist")).cast("long").as("inertia"))
  }

  private val KmeansDistExpr =
    "dot_prod_long(q, q) - 2 * dot_prod_long(q, cq) + dot_prod_long(cq, cq)"

  /** Rank every (vector, centroid) pair by exact integer squared L2 —
    * rk ≤ p is an IVF probe set. Explodes |input|×k through a window
    * sort, so use it only on SMALL inputs (the query side); corpus-wide
    * assignment goes through [[assignNearest]]. */
  private def rankCentroids(codes: DataFrame, cents: DataFrame): DataFrame =
    codes.crossJoin(broadcast(cents))
      .withColumn("dist", expr(KmeansDistExpr))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))))

  /** Lloyd's assignment as a map-side-combinable AGGREGATE: min over
    * the lexicographic (dist, cid) struct is exactly the
    * (dist asc, cid asc) argmin the window form ranks, but the partial
    * agg collapses the k candidate rows per vector BEFORE the exchange
    * — the shuffle carries one row per vector, unsorted, instead of
    * sort-windowing k× the corpus per round. Output:
    * (vec_id, q, cid, dist). */
  private def assignNearest(codes: DataFrame, cents: DataFrame): DataFrame =
    codes.crossJoin(broadcast(cents))
      .withColumn("dist", expr(KmeansDistExpr))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cid"))).as("m"),
        first(col("q")).as("q")) // q is constant within a vec_id group
      .select(col("vec_id"), col("q"), col("m.cid").as("cid"),
        col("m.dist").as("dist"))

  /** `iters` unrolled Lloyd's rounds over the SQ8 codes → (cid, cq)
    * integer centroids. Shared by [[kmeansSq8]] (which summarizes the
    * final assignment) and [[topkIvfTrained]] (which SERVES from the
    * trained lists). */
  /** The trained model tables, MATERIALIZED once per embeddings
    * snapshot through [[graft.ResultCache]] (round 10, the
    * `pl_dedup_signals` parent discipline): the SQ8 k-means centroids
    * feed THREE declared queries (`sim_kmeans_sq8`,
    * `sim_topk_ivf_trained`, and the recall report's ivf_trained
    * path), and the PQ codebooks feed two (`sim_topk_pq` + the
    * report's pq path) — each was re-running its full Lloyd's
    * training per consumer. The cached tables are model-sized (k
    * rows / m·k rows of integer arrays), so the parquet read is
    * negligible; training remains bit-deterministic, so the cached
    * answer IS the inline answer (`adv_cached_query` contract). */
  private def modelCacheDir =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-result-cache"

  private def trainedCentsCached(s: SparkSession, d: String,
      codes: => DataFrame): DataFrame =
    // governing constants IN the key (r10 advice): a KmeansK change
    // must invalidate the persisted model automatically
    graft.ResultCache.runCachedKeyed(
      s"sq8TrainedCents/k$KmeansK/i$KmeansIters/v1",
      Seq(Tables.embeddings(s, d)), modelCacheDir)(
      trainedCents(codes, KmeansIters))._1

  private def pqCodebooksCached(s: SparkSession, d: String,
      sub: => DataFrame): DataFrame =
    graft.ResultCache.runCachedKeyed(
      s"pqCodebooks/m$PqM/k$PqK/s$PqScale/i$PqIters/v1",
      Seq(Tables.embeddings(s, d)), modelCacheDir)(pqTrain(sub, PqIters))._1

  private[graft] def trainedCents(codes: DataFrame, iters: Int): DataFrame = {
    var cents = codes.where(col("vec_id") < KmeansK)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    (1 to iters).foreach { _ =>
      cents = assignNearest(codes, cents)
        .select(col("cid"), posexplode(col("q")).as(Seq("pos", "component")))
        .groupBy("cid", "pos")
        .agg(expr("CAST(sum(component) AS BIGINT) DIV count(1)").as("cval"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, cval))), x -> x.cval)")
          .as("cq"))
    }
    cents
  }

  private[graft] def kmeansSq8Run(s: SparkSession, d: String, iters: Int): DataFrame = {
    val codes = sq8Codes(s, d)
    assignNearest(codes, trainedCents(codes, iters))
      .groupBy(col("cid").as("cluster_id"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("dist")).cast("long").as("inertia"))
  }

  // ---- Product quantization (PQ) -----------------------------------------
  private val PqM = 8        // subspaces
  private val PqSubDim = 8   // dims per subspace (PqM * PqSubDim = 64)
  private val PqK = 16       // centroids per subspace codebook
  private val PqIters = 1    // Lloyd rounds per codebook
  private val PqScale = 16384L // unit-norm fixed point: floor(v/||v||·2^14 + 0.5)
  private val PqRefine = 64  // ADC shortlist size fed to the exact re-rank

  /** Unit-normalized fixed-point codes for the PQ path. Unlike the SQ8
    * per-vector max-abs scale (which cancels in cosine but NOT in L2),
    * normalizing to the unit sphere first makes squared-L2 ranking
    * monotone with cosine — so PQ's approximate distances chase the
    * same truth set as every other path in the recall report. All
    * arithmetic after the two IEEE ops per element (divide by the
    * fold-ordered norm, scale) is exact int64, hash-identical across
    * engines. */
  private def pqNormCodes(s: SparkSession, d: String): DataFrame =
    vecs(s, d)
      .withColumn("nrm", expr("sqrt(dot_prod(v, v))"))
      .where(col("nrm") > 0D)
      .select(col("vec_id"), expr(
        s"transform(v, x -> CAST(floor(x / nrm * ${PqScale}.0D + 0.5D) AS BIGINT))")
        .as("q"))

  /** (vec_id, m, sq): the M contiguous sub-vectors of each code. */
  private def pqSub(codes: DataFrame): DataFrame =
    codes.select(col("vec_id"),
        explode(expr(s"sequence(0, ${PqM - 1})")).as("m"), col("q"))
      .select(col("vec_id"), col("m"),
        expr(s"slice(q, m * $PqSubDim + 1, $PqSubDim)").as("sq"))

  private val PqDistExpr =
    "dot_prod_long(sq, sq) - 2 * dot_prod_long(sq, cq) + dot_prod_long(cq, cq)"

  /** Per-(vector, subspace) nearest codebook entry — the same
    * map-side-combinable min-struct argmin as [[assignNearest]], keyed
    * by (vec_id, m); `cents` is (m, cid, cq) and broadcasts (M·K
    * rows). */
  private def pqAssign(sub: DataFrame, cents: DataFrame): DataFrame =
    sub.join(broadcast(cents), Seq("m"))
      .withColumn("dist", expr(PqDistExpr))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("cid"))).as("mm"),
        first(col("sq")).as("sq"))
      .select(col("vec_id"), col("m"), col("sq"),
        col("mm.cid").as("cid"), col("mm.dist").as("dist"))

  /** `iters` Lloyd rounds per subspace → (m, cid, cq) codebooks. Seeds
    * are the sub-vectors of vec_id 0..K-1 (the [[trainedCents]]
    * discipline, per subspace). Truncating integer means keep every
    * engine bit-identical. */
  private[graft] def pqTrain(sub: DataFrame, iters: Int): DataFrame = {
    var cents = sub.where(col("vec_id") < PqK)
      .select(col("m"), col("vec_id").as("cid"), col("sq").as("cq"))
    (1 to iters).foreach { _ =>
      cents = pqAssign(sub, cents)
        .select(col("m"), col("cid"),
          posexplode(col("sq")).as(Seq("pos", "comp")))
        .groupBy("m", "cid", "pos")
        .agg(expr("CAST(sum(comp) AS BIGINT) DIV count(1)").as("cval"))
        .groupBy("m", "cid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, cval))), x -> x.cval)")
          .as("cq"))
    }
    cents
  }

  /** Approximate top-5 by PRODUCT QUANTIZATION with asymmetric distance
    * and exact re-rank (public FAISS `PQ` + refine design, the memory
    * end-game of ANN serving): each vector stores only M=8 nibble
    * codes (4 bits each — 4 BYTES a vector instead of 256 for
    * float32), queries keep their full sub-vectors and score against a
    * per-query lookup table of exact int64 sub-distances, so a corpus
    * scan is M table lookups + adds per candidate; the ADC shortlist
    * ([[PqRefine]] per query) is then re-ranked by EXACT cosine over
    * the true vectors — the standard two-stage recipe (coarse scan
    * over 4-byte codes, exact math over a bounded candidate set).
    *
    * 100 TB shape: the codebooks are M·K tiny rows trained once
    * (corpus touched `iters+1` times, only (m, cid, dim) rollups
    * shuffle) and materialized driver-side (the bounded-model
    * LocalRelation discipline — 128 rows); the per-query LUT
    * (|Q|·M·K exact int64 distances) broadcasts; the encoded corpus —
    * 3 small ints a row — is the big operand and it never shuffles
    * wide: the ADC join is map-side against the broadcast LUT and the
    * (query, vec) partial sums combine before the exchange. The
    * re-rank touches |Q|·[[PqRefine]] vectors via an id JOIN (the
    * corpus is never broadcast). Every ADC distance is exact integer
    * arithmetic over deterministic fixed-point codes and the re-rank
    * is the shared cosine fold, so ranking (ties → lower neighbor_id)
    * is hash-exact cross-engine, and recall@5 vs the brute-force
    * truth is a DECLARED number in `sim_recall_report`. */
  private lazy val topkPq: Q = (s, d) => {
    import s.implicits._
    val sub = pqSub(pqNormCodes(s, d))
    val cents = pqCodebooksCached(s, d, sub).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2)))
      .toSeq.toDF("m", "cid", "cq")
    val enc = pqAssign(sub, cents)
      .select(col("vec_id"), col("m"), col("cid"))
    val lut = pqSub(pqNormCodes(s, d).where(col("vec_id") < 10))
      .select(col("vec_id").as("query_id"), col("m"), col("sq"))
      .join(broadcast(cents), Seq("m"))
      .withColumn("d", expr(PqDistExpr))
      .select(col("query_id"), col("m"), col("cid"), col("d"))
    val shortlist = enc.join(broadcast(lut), Seq("m", "cid"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("d")).cast("long").as("adist"))
      .select(col("query_id"), col("neighbor_id"),
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("adist"), col("neighbor_id"))).as("ark"))
      .where(col("ark") <= PqRefine)
      .select("query_id", "neighbor_id")
    val qv = vecs(s, d).where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    shortlist
      .join(vecs(s, d).withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos_sim", expr("cosine_sim(qv, v)"))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos_sim").desc, col("neighbor_id"))).as("rnk"))
      .where(col("rnk") <= 5)
  }

  // ---- IVF with TRAINED lists --------------------------------------------
  private val IvfTrainedProbes = 2

  /** IVF serving from REAL k-means lists — the end-to-end ANN story the
    * pseudo-centroid [[topkIvf]] stubs: lists are the [[KmeansK]]
    * integer centroids after [[KmeansIters]] Lloyd's rounds
    * ([[trainedCents]] — exactly `sim_kmeans_sq8`'s training), corpus
    * vectors live in their nearest list, queries probe their
    * [[IvfTrainedProbes]] best lists, and scoring is the exact int64
    * SQ8 cosine kernel. Everything is integer-deterministic, so the
    * oracle replays training AND serving bit-for-bit (the same
    * unrolled-round CTEs as `sim_kmeans_sq8`).
    *
    * 100 TB shape: training touches the corpus `iters + 1` times with
    * only (cluster, dim) rollups shuffling; the trained centroid table
    * (k·dim longs) broadcasts into both assignment and probe; serving
    * joins the corpus map-side against the broadcast probe set — the
    * corpus itself NEVER shuffles, same as [[topkIvf]]. Recall vs
    * brute force is pinned ≥ the pseudo-centroid path's in
    * [[SimilaritySpec]]. */
  private lazy val topkIvfTrained: Q = (s, d) =>
    topkIvfTrainedFrom(s, d, sq8Codes(s, d))

  private def topkIvfTrainedFrom(s: SparkSession, d: String,
      codes: DataFrame): DataFrame = {
    import s.implicits._
    // the trained centroid table is k rows but its PLAN is the whole
    // 2-round training, and it feeds BOTH the corpus assignment and the
    // query probe ranking — materialize the k rows on the driver (the
    // bounded model-update discipline, like bpeLearn's merges) and
    // rebuild a LocalRelation: training runs exactly once, and unlike a
    // localCheckpoint there are no resident blocks to leak on a shared
    // session after the query is consumed
    val cents = trainedCentsCached(s, d, codes).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
      .toSeq.toDF("cid", "cq")
    val corpus = assignNearest(codes, cents)
      .select(col("vec_id"), col("q"), col("cid"))
    val qs = rankCentroids(codes.where(col("vec_id") < 10), cents)
      .where(col("rk") <= IvfTrainedProbes)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("cid"))
    corpus.join(broadcast(qs), Seq("cid"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_q", expr(
        """CAST(dot_prod_long(q, qq) AS DOUBLE) /
           (sqrt(CAST(dot_prod_long(q, q) AS DOUBLE)) *
            sqrt(CAST(dot_prod_long(qq, qq) AS DOUBLE)))"""))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_q"),
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cos_q").desc, col("vec_id"))).as("rnk"))
      .where(col("rnk") <= 5)
  }

  // ---- DuckDB oracles ----------------------------------------------------
  // The LSH/IVF models are ±1 literals, so the oracle SQL regenerates the
  // exact bucketing from the same Scala arrays: dot products are sums of
  // ±v_i folded left-to-right in both engines → bit-identical signs →
  // identical candidate sets → hash-exact comparison even for the
  // "approximate" paths.

  // Mirrors CosineSimilarity's exact fold: left-to-right products,
  // dot/(sqrt(na)*sqrt(nb)).
  private val cosSql = (a: String, b: String) =>
    s"""list_reduce(list_transform(list_zip($a, $b), x -> x[1] * x[2]), (p, q) -> p + q) /
        (sqrt(list_reduce(list_transform($a, x -> x * x), (p, q) -> p + q)) *
         sqrt(list_reduce(list_transform($b, x -> x * x), (p, q) -> p + q)))"""

  private def dotSql(plane: Array[Double]): String =
    s"""list_reduce(list_transform(list_zip(v, [${plane.mkString(", ")}]),
        x -> x[1] * x[2]), (p, q) -> p + q)"""

  /** One adaptive bucket id per table: Σ_{j<k} 2^j · [dot(v, plane_tj)
    * > 0]. Guarded per bit on the `par` CTE's k — the `j >= k` branch
    * comes FIRST so CASE's mandated lazy evaluation never prices the
    * unused dots — and per table on l (NULL for t ≥ l, filtered by the
    * caller). At the declared scales (k=6, l=8) this evaluates exactly
    * the prior fixed-shape bucketing. */
  private def bucketSql(t: Int): String = {
    val bitsSum = (0 until MaxBits).map { j =>
      s"(CASE WHEN $j >= k THEN 0 WHEN ${dotSql(planes(t)(j))} > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
    s"(CASE WHEN $t >= l THEN NULL ELSE $bitsSum END)"
  }

  /** CTE `par(k, l)`: the corpus-size-adaptive design point, the same
    * integer arithmetic as [[bitsFor]]/[[tablesForBits]] — smallest k
    * in [6, 12] with 100·2^k ≥ count(embeddings), and the recall-
    * holding table count for that k. */
  private def parCte(p: String = ""): String = {
    val lCase = tablesForBits.toSeq.sorted
      .map { case (k, l) => s"WHEN $k THEN $l" }.mkString(" ")
    s"""${p}par AS (
          SELECT k, CASE k $lCase ELSE $MaxTables END AS l
          FROM (SELECT COALESCE(
                  (SELECT MIN(j) FROM range($MinBits, ${MaxBits + 1}) t(j)
                   WHERE ($BucketTarget::BIGINT << j) >= (SELECT count(*) FROM embeddings)),
                  $MaxBits) AS k))"""
  }

  /** The semantic drop-list closure as `p`-prefixed CTEs (no leading
    * WITH; caller supplies `WITH RECURSIVE`): LSH-bucket candidates +
    * exact cosine ≥ 0.45 pairs → transitive closure →
    * `${p}drop(vec_id)` = non-representative members. The prefixed twin
    * of the `sim_dedup_corpus` oracle body, for composition with other
    * closures; the hash gate keeps the renderings aligned. */
  private[graft] def duckSemDropCte(p: String): String =
    s"""${p}e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        ${parCte(p)},
        ${p}b AS (SELECT vec_id, table_id, bucket FROM (
                    SELECT vec_id,
                      unnest([${(0 until MaxTables).mkString(", ")}]) AS table_id,
                      unnest([${(0 until MaxTables).map(bucketSql).mkString(", ")}]) AS bucket
                    FROM ${p}e, ${p}par)
                  WHERE bucket IS NOT NULL),
        ${p}cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
                     FROM ${p}b x JOIN ${p}b y
                       ON x.table_id = y.table_id AND x.bucket = y.bucket
                      AND x.vec_id < y.vec_id),
        ${p}pairs AS (
          SELECT vec_a, vec_b
          FROM ${p}cand JOIN ${p}e ea ON ea.vec_id = vec_a
                        JOIN ${p}e eb ON eb.vec_id = vec_b
          WHERE ${cosSql("ea.v", "eb.v")} >= 0.45),
        ${p}edges AS (
          SELECT vec_a AS s, vec_b AS t FROM ${p}pairs
          UNION ALL SELECT vec_b, vec_a FROM ${p}pairs),
        ${p}reach AS (
          SELECT s, t FROM ${p}edges
          UNION
          SELECT r.s, e2.t FROM ${p}reach r JOIN ${p}edges e2 ON r.t = e2.s),
        ${p}drop AS (
          SELECT s AS vec_id FROM ${p}reach GROUP BY s
          HAVING LEAST(s, MIN(t)) <> s)"""

  /** CTE `b(vec_id, table_id, bucket)` — DuckDB zips parallel unnests;
    * rows for tables ≥ l carry a NULL bucket and are filtered here.
    * `par` (the design point) is injectable so a forced-(k, l) gate
    * query can exercise the adaptive arm (k > 6) at any corpus size —
    * the driver's sf0.01/sf0.1 counts always yield the base (6, 8), so
    * without forcing, the k ≥ 7 plane matrix and the guarded
    * [[bucketSql]] cases would ship gate-untested (r15 verdict
    * item 3). */
  private def bucketsCteWith(par: String): String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        $par,
        b AS (SELECT vec_id, table_id, bucket FROM (
                SELECT vec_id,
                  unnest([${(0 until MaxTables).mkString(", ")}]) AS table_id,
                  unnest([${(0 until MaxTables).map(bucketSql).mkString(", ")}]) AS bucket
                FROM e, par)
              WHERE bucket IS NOT NULL)"""

  private def bucketsCte: String = bucketsCteWith(parCte())

  /** Forced design point: the oracle-side twin of calling the Scala
    * path with explicit (bits, tables) instead of [[lshParams]]. */
  private def bucketsCteForced(k: Int, l: Int): String =
    bucketsCteWith(s"par AS (SELECT $k AS k, $l AS l)")

  /** CTE `asn(vec_id, list_id, rk)` — IVF centroid ranking per vector. */
  private def ivfCte: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        dots AS (SELECT vec_id,
                   unnest([${(0 until IvfLists).mkString(", ")}]) AS list_id,
                   unnest([${centroids.map(c => dotSql(c)).mkString(", ")}]) AS dot
                 FROM e),
        asn AS (SELECT vec_id, list_id,
                  ROW_NUMBER() OVER (PARTITION BY vec_id
                    ORDER BY dot DESC, list_id) AS rk
                FROM dots)"""

  /** Squared L2 over BIGINT code lists — exact, fold order irrelevant. */
  private def dsqSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
        x -> (x[1] - x[2]) * (x[1] - x[2])), (p, r) -> p + r)"""

  /** One Lloyd's round in SQL: assign to nearest centroid (tie → lower
    * cid), then per-dimension truncating integer means. */
  private def kmeansRoundSql(cents: String, asg: String, next: String): String =
    s"""$asg AS (
          SELECT vec_id, q, cid, dist FROM (
            SELECT z.vec_id, z.q, c.cid, ${dsqSql("z.q", "c.cq")} AS dist,
              ROW_NUMBER() OVER (PARTITION BY z.vec_id
                ORDER BY ${dsqSql("z.q", "c.cq")}, c.cid) AS rk
            FROM qz z CROSS JOIN $cents c) WHERE rk = 1),
        $next AS (
          SELECT cid, list(cval ORDER BY pos) AS cq FROM (
            SELECT cid, pos, CAST(sum(comp) AS BIGINT) // count(*) AS cval
            FROM (SELECT cid,
                    unnest([{'pos': i, 'comp': q[i]}
                            FOR i IN range(1, len(q) + 1)], recursive := true)
                  FROM $asg)
            GROUP BY cid, pos)
          GROUP BY cid)"""

  // Path-oracle SQL extracted to vals so sim_recall_report can nest the
  // same text verbatim — ONE oracle rendering per path, shared between
  // its own CORRECTNESS entry and the recall report's subqueries.
  private lazy val duckTopkCosineSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        p AS (SELECT query_id, e.vec_id AS neighbor_id,
                ${cosSql("qv", "v")} AS cos_sim
              FROM e JOIN q ON e.vec_id <> q.query_id)
        SELECT query_id, neighbor_id, cos_sim, rnk FROM (
          SELECT query_id, neighbor_id, cos_sim,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM p) WHERE rnk <= 5"""

  private lazy val duckTopkLshSql: String =
    s"""WITH $bucketsCte,
        cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id
                 FROM b c JOIN b q
                   ON c.table_id = q.table_id AND c.bucket = q.bucket
                 WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        sc AS (SELECT query_id, cand.vec_id AS neighbor_id,
                 ${cosSql("qe.v", "ce.v")} AS cos_sim
               FROM cand JOIN e ce ON ce.vec_id = cand.vec_id
                         JOIN e qe ON qe.vec_id = cand.query_id)
        SELECT query_id, neighbor_id, cos_sim, rnk FROM (
          SELECT query_id, neighbor_id, cos_sim,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM sc) WHERE rnk <= 5"""

  private lazy val duckTopkIvfSql: String =
    s"""WITH $ivfCte,
        corpus AS (SELECT vec_id, list_id FROM asn WHERE rk = 1),
        qs AS (SELECT vec_id AS query_id, list_id FROM asn
               WHERE rk <= $IvfProbes AND vec_id < 10),
        sc AS (SELECT query_id, c.vec_id AS neighbor_id,
                 ${cosSql("qe.v", "ce.v")} AS cos_sim
               FROM corpus c JOIN qs ON c.list_id = qs.list_id
                AND c.vec_id <> qs.query_id
               JOIN e ce ON ce.vec_id = c.vec_id
               JOIN e qe ON qe.vec_id = qs.query_id)
        SELECT query_id, neighbor_id, cos_sim, rnk FROM (
          SELECT query_id, neighbor_id, cos_sim,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM sc) WHERE rnk <= 5"""

  /** Training replayed via the SAME unrolled-round CTEs as
    * sim_kmeans_sq8, then serving: nearest trained list per corpus
    * vector, best-2 probes per query, exact int64 SQ8 cosine. */
  private lazy val duckTopkIvfTrainedSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        sc AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
               FROM e),
        qz AS (SELECT vec_id,
                 list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS q
               FROM sc WHERE scale > 0),
        c0 AS (SELECT vec_id AS cid, q AS cq FROM qz WHERE vec_id < $KmeansK),
        ${kmeansRoundSql("c0", "a1", "c1")},
        ${kmeansRoundSql("c1", "a2", "c2")},
        rkx AS (
          SELECT z.vec_id, z.q, c.cid,
            ROW_NUMBER() OVER (PARTITION BY z.vec_id
              ORDER BY ${dsqSql("z.q", "c.cq")}, c.cid) AS rk
          FROM qz z CROSS JOIN c2 c),
        corpus AS (SELECT vec_id, q, cid FROM rkx WHERE rk = 1),
        qs AS (SELECT vec_id AS query_id, q AS qq, cid FROM rkx
               WHERE rk <= $IvfTrainedProbes AND vec_id < 10),
        sims AS (SELECT query_id, c.vec_id AS neighbor_id,
                   CAST(list_reduce(list_transform(list_zip(c.q, qs.qq),
                          x -> x[1] * x[2]), (p, r) -> p + r) AS DOUBLE) /
                   (sqrt(CAST(list_reduce(list_transform(c.q, x -> x * x),
                          (p, r) -> p + r) AS DOUBLE)) *
                    sqrt(CAST(list_reduce(list_transform(qs.qq, x -> x * x),
                          (p, r) -> p + r) AS DOUBLE))) AS cos_q
                 FROM corpus c JOIN qs
                   ON c.cid = qs.cid AND c.vec_id <> qs.query_id)
        SELECT query_id, neighbor_id, cos_q, rnk FROM (
          SELECT query_id, neighbor_id, cos_q,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_q DESC, neighbor_id) AS rnk
          FROM sims) WHERE rnk <= 5"""

  /** Int64-exact quantized cosine: q, dot, and norms are integers in
    * both engines; the one float divide at the end is a single IEEE op. */
  private lazy val duckTopkSq8Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        sc AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
               FROM e),
        qz AS (SELECT vec_id,
                 list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS q
               FROM sc WHERE scale > 0),
        sims AS (SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(list_reduce(list_transform(list_zip(c.q, qs.q),
                          x -> x[1] * x[2]), (p, r) -> p + r) AS DOUBLE) /
                   (sqrt(CAST(list_reduce(list_transform(c.q, x -> x * x),
                          (p, r) -> p + r) AS DOUBLE)) *
                    sqrt(CAST(list_reduce(list_transform(qs.q, x -> x * x),
                          (p, r) -> p + r) AS DOUBLE))) AS cos_q
                 FROM qz c JOIN qz qs
                   ON qs.vec_id < 10 AND c.vec_id <> qs.vec_id)
        SELECT query_id, neighbor_id, cos_q, rnk FROM (
          SELECT query_id, neighbor_id, cos_q,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_q DESC, neighbor_id) AS rnk
          FROM sims) WHERE rnk <= 5"""

  /** DuckDB's WITH is legal inside a derived table, so each path oracle
    * nests unchanged: `FROM (<full path SQL>) AS x`. */
  /** PQ oracle: regenerate normalization, per-subspace training, corpus
    * encoding, LUT, and ADC ranking in SQL. The unit-norm fold
    * (`list_reduce` sum of squares, left-to-right) mirrors the Spark
    * `dot_prod` fold exactly; everything after the two IEEE ops per
    * element is int64. One Lloyd round unrolled (PqIters = 1). */
  private lazy val duckTopkPqSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        nz AS (SELECT vec_id, v,
                 sqrt(list_reduce(list_transform(v, x -> x * x),
                   (p, r) -> p + r)) AS nrm
               FROM e),
        nq AS (SELECT vec_id,
                 list_transform(v, x ->
                   CAST(floor(x / nrm * ${PqScale}.0 + 0.5) AS BIGINT)) AS q
               FROM nz WHERE nrm > 0),
        ms AS (SELECT unnest(range($PqM)) AS m),
        sub AS (SELECT vec_id, m,
                  list_slice(q, m * $PqSubDim + 1, (m + 1) * $PqSubDim) AS sq
                FROM nq CROSS JOIN ms),
        pc0 AS (SELECT m, vec_id AS cid, sq AS cq FROM sub WHERE vec_id < $PqK),
        pa1 AS (
          SELECT vec_id, m, sq, cid FROM (
            SELECT s.vec_id, s.m, s.sq, c.cid,
              ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                ORDER BY ${dsqSql("s.sq", "c.cq")}, c.cid) AS rk
            FROM sub s JOIN pc0 c ON c.m = s.m) WHERE rk = 1),
        pc1 AS (
          SELECT m, cid, list(cval ORDER BY pos) AS cq FROM (
            SELECT m, cid, pos, CAST(sum(comp) AS BIGINT) // count(*) AS cval
            FROM (SELECT m, cid,
                    unnest([{'pos': i, 'comp': sq[i]}
                            FOR i IN range(1, len(sq) + 1)], recursive := true)
                  FROM pa1)
            GROUP BY m, cid, pos)
          GROUP BY m, cid),
        enc AS (
          SELECT vec_id, m, cid FROM (
            SELECT s.vec_id, s.m, c.cid,
              ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                ORDER BY ${dsqSql("s.sq", "c.cq")}, c.cid) AS rk
            FROM sub s JOIN pc1 c ON c.m = s.m) WHERE rk = 1),
        lut AS (
          SELECT s.vec_id AS query_id, c.m, c.cid,
            ${dsqSql("s.sq", "c.cq")} AS d
          FROM sub s JOIN pc1 c ON c.m = s.m
          WHERE s.vec_id < 10),
        ad AS (
          SELECT l.query_id, x.vec_id AS neighbor_id,
            CAST(sum(l.d) AS BIGINT) AS adist
          FROM enc x JOIN lut l ON l.m = x.m AND l.cid = x.cid
          WHERE x.vec_id <> l.query_id
          GROUP BY 1, 2),
        shortlist AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY adist, neighbor_id) AS ark
            FROM ad) WHERE ark <= $PqRefine),
        rr AS (
          SELECT s.query_id, s.neighbor_id,
            ${cosSql("eq.v", "en.v")} AS cos_sim
          FROM shortlist s
          JOIN e eq ON eq.vec_id = s.query_id
          JOIN e en ON en.vec_id = s.neighbor_id)
        SELECT query_id, neighbor_id, cos_sim, rnk FROM (
          SELECT query_id, neighbor_id, cos_sim,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM rr) WHERE rnk <= 5"""

  private lazy val duckRecallReportSql: String = {
    val pathSubs = Seq(
      "ivf" -> duckTopkIvfSql,
      "ivf_trained" -> duckTopkIvfTrainedSql,
      "lsh" -> duckTopkLshSql,
      "sq8" -> duckTopkSq8Sql,
      "pq" -> duckTopkPqSql)
      .map { case (n, sql) =>
        s"SELECT '$n' AS path, query_id, neighbor_id FROM ($sql)"
      }.mkString("\n          UNION ALL ")
    s"""WITH truth AS (
          SELECT query_id, neighbor_id, 1 AS hit
          FROM ($duckTopkCosineSql)),
        paths AS (
          $pathSubs)
        SELECT path,
          count(DISTINCT query_id) AS n_queries,
          count(*) AS n_returned,
          CAST(sum(CASE WHEN hit IS NULL THEN 0 ELSE 1 END) AS BIGINT)
            AS n_hits,
          (SELECT count(*) FROM truth) AS n_truth,
          CAST(CAST(sum(CASE WHEN hit IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS DOUBLE) / (SELECT count(*) FROM truth) AS recall_at_5
        FROM paths LEFT JOIN truth USING (query_id, neighbor_id)
        GROUP BY path"""
  }

  val oracle: Map[String, String] = Map(
    "sim_kmeans_sq8" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
          sc AS (SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
                 FROM e),
          qz AS (SELECT vec_id,
                   list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS q
                 FROM sc WHERE scale > 0),
          c0 AS (SELECT vec_id AS cid, q AS cq FROM qz WHERE vec_id < $KmeansK),
          ${kmeansRoundSql("c0", "a1", "c1")},
          ${kmeansRoundSql("c1", "a2", "c2")},
          af AS (
            SELECT vec_id, cid, dist FROM (
              SELECT z.vec_id, c.cid, ${dsqSql("z.q", "c.cq")} AS dist,
                ROW_NUMBER() OVER (PARTITION BY z.vec_id
                  ORDER BY ${dsqSql("z.q", "c.cq")}, c.cid) AS rk
              FROM qz z CROSS JOIN c2 c) WHERE rk = 1)
          SELECT cid AS cluster_id, count(*) AS n_vecs,
            CAST(sum(dist) AS BIGINT) AS inertia
          FROM af GROUP BY cid""",
    "sim_topk_cosine" -> duckTopkCosineSql,
    "sim_topk_pq" -> duckTopkPqSql,
    "sim_recall_report" -> duckRecallReportSql,
    "sim_cosine_pairs" ->
      s"""WITH $bucketsCte,
          cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
                   FROM b x JOIN b y
                     ON x.table_id = y.table_id AND x.bucket = y.bucket
                    AND x.vec_id < y.vec_id)
          SELECT vec_a, vec_b, ${cosSql("ea.v", "eb.v")} AS cos_sim
          FROM cand JOIN e ea ON ea.vec_id = vec_a
                    JOIN e eb ON eb.vec_id = vec_b
          WHERE ${cosSql("ea.v", "eb.v")} >= 0.45""",
    // the adaptive-arm gate: identical body, design point forced to
    // (8, 12) on both sides — a hash mismatch here means the k ≥ 7
    // planes or the guarded bucketSql cases regressed
    "sim_cosine_pairs_k8" ->
      s"""WITH ${bucketsCteForced(8, 12)},
          cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
                   FROM b x JOIN b y
                     ON x.table_id = y.table_id AND x.bucket = y.bucket
                    AND x.vec_id < y.vec_id)
          SELECT vec_a, vec_b, ${cosSql("ea.v", "eb.v")} AS cos_sim
          FROM cand JOIN e ea ON ea.vec_id = vec_a
                    JOIN e eb ON eb.vec_id = vec_b
          WHERE ${cosSql("ea.v", "eb.v")} >= 0.45""",
    "sim_knn_self" ->
      s"""WITH $bucketsCte,
          cand AS (SELECT DISTINCT x.vec_id AS vec_id, y.vec_id AS nbr
                   FROM b x JOIN b y
                     ON x.table_id = y.table_id AND x.bucket = y.bucket
                    AND x.vec_id <> y.vec_id),
          sc AS (SELECT c.vec_id, c.nbr,
                   ${cosSql("ea.v", "eb.v")} AS cos_sim
                 FROM cand c JOIN e ea ON ea.vec_id = c.vec_id
                             JOIN e eb ON eb.vec_id = c.nbr),
          r AS (SELECT vec_id, nbr, cos_sim,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY cos_sim DESC, nbr) AS rnk
                FROM sc)
          SELECT vec_id, nbr, rnk, cos_sim FROM r WHERE rnk <= $KnnSelfK""",
    // the sim_cosine_pairs ground truth + recursive transitive closure
    // (dd_dedup_corpus's pattern): survivors = everything except
    // non-representative members of cosine near-dup clusters
    "sim_dedup_corpus" ->
      s"""WITH RECURSIVE $bucketsCte,
          cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
                   FROM b x JOIN b y
                     ON x.table_id = y.table_id AND x.bucket = y.bucket
                    AND x.vec_id < y.vec_id),
          pairs AS (
            SELECT vec_a, vec_b
            FROM cand JOIN e ea ON ea.vec_id = vec_a
                      JOIN e eb ON eb.vec_id = vec_b
            WHERE ${cosSql("ea.v", "eb.v")} >= 0.45),
          edges AS (
            SELECT vec_a AS s, vec_b AS t FROM pairs
            UNION ALL SELECT vec_b, vec_a FROM pairs),
          reach AS (
            SELECT s, t FROM edges
            UNION
            SELECT r.s, e2.t FROM reach r JOIN edges e2 ON r.t = e2.s),
          drop_list AS (
            SELECT s AS vec_id FROM reach GROUP BY s
            HAVING LEAST(s, MIN(t)) <> s)
          SELECT vec_id, label FROM embeddings
          WHERE vec_id NOT IN (SELECT vec_id FROM drop_list)""",
    "sim_topk_lsh" -> duckTopkLshSql,
    "sim_topk_ivf" -> duckTopkIvfSql,
    "sim_topk_ivf_trained" -> duckTopkIvfTrainedSql,
    "sim_topk_sq8" -> duckTopkSq8Sql,
    // parallel unnests zip; pos is 0-based to match posexplode
    "sim_label_centroids" ->
      """WITH x AS (
           SELECT label,
             unnest(range(0, len(embedding))) AS pos,
             unnest(embedding) AS v
           FROM embeddings),
         agg AS (
           SELECT label, pos, count(*) AS n_vecs,
             CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
                  AS BIGINT) AS micros
           FROM x GROUP BY label, pos)
         SELECT label, pos, n_vecs,
           CAST(micros AS DOUBLE) / (n_vecs * 1000000) AS centroid
         FROM agg""",
  )
}
