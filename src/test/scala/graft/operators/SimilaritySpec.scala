package graft.operators

import graft.SparkSpec

/** Similarity search: expression correctness on known vectors, brute-force
  * truth vs a local oracle, LSH structural properties + recall. */
class SimilaritySpec extends SparkSpec {

  test("cosine_sim expression on known vectors") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0), 0.0),
      (Array(1.0, 0.0), Array(1.0, 0.0), 1.0),
      (Array(1.0, 2.0), Array(2.0, 4.0), 1.0),
      (Array(1.0, 0.0), Array(-1.0, 0.0), -1.0),
      (Array(3.0, 4.0), Array(4.0, 3.0), 24.0 / 25.0)).toDF("a", "b", "want")
    val got = df.selectExpr("cosine_sim(a, b) AS got", "want").collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("cosine_sim accepts float arrays (widening cast)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
    assert(math.abs(df.selectExpr("cosine_sim(a, b)").head.getDouble(0) - 1.0) < 1e-12)
  }

  test("label centroids: fixed-point mean within 1e-6 of the true mean, full coverage") {
    import org.apache.spark.sql.functions._
    val df = Similarity.queries("sim_label_centroids")(spark, sfDir).cache()
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .collect().map(r =>
        (r.getAs[Int]("label"), r.getSeq[Float](1).map(_.toDouble).toArray))
    val dims = emb.head._2.length
    assert(df.count() === emb.map(_._1).distinct.length.toLong * dims)
    // floor quantization at 1e-6 bounds the centroid error by 1e-6
    val local = emb.groupBy(_._1).map { case (l, vs) =>
      (l, vs.map(_._2).transpose.map(c => c.sum / c.length).toArray)
    }
    df.collect().foreach { r =>
      val want = local(r.getAs[Int]("label"))(r.getAs[Int]("pos"))
      assert(math.abs(r.getAs[Double]("centroid") - want) <= 1e-6 + 1e-9)
    }
    df.unpersist()
  }

  test("brute-force top-k matches local Scala oracle") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < x.length) { dot += x(i)*y(i); na += x(i)*x(i); nb += y(i)*y(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val oracle = (for {
      (qid, qv) <- emb.filter(_._1 < 10)
      top = emb.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5)
      ((nid, c), i) <- top.zipWithIndex
    } yield (qid, nid, i + 1)).toSet
    val got = Similarity.queries("sim_topk_cosine")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == oracle)
  }

  test("IVF top-k: structural validity and deterministic recall floor") {
    val brute = Similarity.queries("sim_topk_cosine")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.queries("sim_topk_ivf")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(3) <= 5))
    val ivfSet = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivfSet).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVF recall $recall below floor")
  }

  test("sem-dedup corpus: survivors = union-find representatives of cosine clusters") {
    val pairs = Similarity.queries("sim_cosine_pairs")(spark, sfDir)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val allIds = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // independent third implementation: plain union-find over the pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb // min-id root
    }
    // canonical min-id root per node, then survivors = roots + untouched
    val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val expectedKept = allIds -- members.filter(m => find(m) != m)
    val got = Similarity.queries("sim_dedup_corpus")(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == expectedKept,
      s"only-got=${got -- expectedKept} only-expected=${expectedKept -- got}")
    assert(got.size < allIds.size, "fixture must contain at least one near-dup cluster")
  }

  test("trained IVF: valid structure, recall at least the pseudo-centroid path's") {
    val brute = Similarity.queries("sim_topk_cosine")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(q: String): Double = {
      val got = Similarity.queries(q)(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & got).size.toDouble / brute.size
    }
    val rows = Similarity.queries("sim_topk_ivf_trained")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(3) <= 5))
    // every (query, neighbor) pair is unique — one list per corpus
    // vector means no candidate can be generated twice
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
    val trained = recallOf("sim_topk_ivf_trained")
    val pseudo = recallOf("sim_topk_ivf")
    // deterministic on fixed data: trained lists must serve at least as
    // well as the untrained ±1 pseudo-centroids (the whole point of
    // wiring kmeans into the serving path)
    assert(trained >= pseudo, s"trained recall $trained < pseudo $pseudo")
  }

  test("SQ8 top-k: int8 quantization preserves neighbor ranking (high overlap vs exact)") {
    val brute = Similarity.queries("sim_topk_cosine")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Similarity.queries("sim_topk_sq8")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(3) <= 5))
    // quantized scores stay inside the cosine range
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
    val sq8 = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 over 64 dims perturbs each component by <= scale/2 ~ 0.4% of
    // max|v| — unlike LSH/IVF there is no bucketing miss, so top-5
    // overlap with the exact ranking should be near-total; 0.8 is the
    // conservative floor (ties near rank 5 can flip)
    val overlap = (brute & sq8).size.toDouble / brute.size
    assert(overlap >= 0.8, s"SQ8 top-5 overlap $overlap below floor")
  }

  test("PQ top-k: structural validity, determinism, recall above bucketing paths") {
    val rows = Similarity.queries("sim_topk_pq")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // exactly the standard query set, 5 ranked rows each, adist >= 0
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length == 5))
    assert(rows.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 5))
    // re-ranked scores are true cosines
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
    // deterministic: a rerun is row-identical
    val again = Similarity.queries("sim_topk_pq")(spark, sfDir).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // PQ scans every corpus vector (no bucketing miss — error comes only
    // from codebook quantization), so its recall must beat the
    // bucket-miss paths on fixed data
    val brute = Similarity.queries("sim_topk_cosine")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(q: String): Double = {
      val got = Similarity.queries(q)(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & got).size.toDouble / brute.size
    }
    val pq = recallOf("sim_topk_pq")
    val lsh = recallOf("sim_topk_lsh")
    assert(pq >= lsh, s"PQ recall $pq below LSH $lsh")
  }

  test("PQ plan: ADC lookup joins broadcast; the corpus side never sort-merges") {
    val df = Similarity.queries("sim_topk_pq")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the LUT and the query-vector table are tiny and must broadcast;
    // a SortMergeJoin anywhere means a corpus-sized side got sorted
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in PQ plan:\n$p")
    assert(!p.contains("SortMergeJoin"), s"sort-merge crept into the PQ serve plan:\n$p")
  }

  test("knn self-join: dense ranks, pairs dominated by rank-1, deterministic") {
    import org.apache.spark.sql.functions._
    val k1 = Similarity.queries("sim_knn_self")(spark, sfDir).cache()
    // ranks are dense 1..m with m <= K per vector
    val badRanks = k1.groupBy("vec_id")
      .agg(count(lit(1)).as("m"), max("rnk").as("mx"), min("rnk").as("mn"))
      .where(col("mx") =!= col("m") || col("mn") =!= 1 || col("m") > 5)
    assert(badRanks.count() === 0, badRanks.take(3).mkString("\n"))
    // a vector's rank-1 similarity dominates every cosine_pairs partner
    // it has (pairs candidates are a subset of knn candidates)
    val top1 = k1.where(col("rnk") === 1)
      .select(col("vec_id"), col("cos_sim").as("best"))
    val pairs = Similarity.queries("sim_cosine_pairs")(spark, sfDir)
    val partner = pairs.select(col("vec_a").as("vec_id"), col("cos_sim"))
      .union(pairs.select(col("vec_b").as("vec_id"), col("cos_sim")))
    val dominated = partner.join(top1, "vec_id")
      .where(col("cos_sim") > col("best"))
    assert(dominated.count() === 0, dominated.take(3).mkString("\n"))
    // neighbor never self, similarity in range
    assert(k1.where(col("vec_id") === col("nbr")).count() === 0)
    assert(k1.where(col("cos_sim") < -1.0001 || col("cos_sim") > 1.0001).count() === 0)
    val k2 = Similarity.queries("sim_knn_self")(spark, sfDir)
    assert(k1.exceptAll(k2).count() === 0 && k2.exceptAll(k1).count() === 0)
    k1.unpersist()
  }

  test("cosine pairs: precision 1 vs brute force, deterministic candidates") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < x.length) { dot += x(i)*y(i); na += x(i)*x(i); nb += y(i)*y(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = (for {
      (a, va) <- emb; (b, vb) <- emb if a < b
      c = cos(va, vb) if c >= 0.45
    } yield (a, b)).toSet
    val got = Similarity.queries("sim_cosine_pairs")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // precision 1: every reported pair is a true >= tau pair, with its
    // exact (not approximated) similarity
    val byId = emb.toMap
    got.foreach { case (a, b, c) =>
      assert(brute.contains((a, b)), s"($a,$b) not a true pair")
      assert(math.abs(cos(byId(a), byId(b)) - c) < 1e-12)
    }
    // fixed hyperplanes: candidate set is deterministic across runs
    val again = Similarity.queries("sim_cosine_pairs")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSet == again.toSet)
  }

  test("LSH top-k: subset of true candidates, deterministic recall floor") {
    val brute = Similarity.queries("sim_topk_cosine")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.queries("sim_topk_lsh")(spark, sfDir)
    val rows = lsh.collect()
    assert(rows.forall(_.getInt(3) <= 5))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
    val lshSet = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lshSet).size.toDouble / brute.size
    // Hash family is fixed → recall is deterministic; 0.3 measured on
    // this corpus, assert a floor with margin.
    assert(recall >= 0.2, s"LSH recall $recall below floor")
  }

  test("kmeans_sq8: full coverage, deterministic, Lloyd's inertia never increases") {
    import org.apache.spark.sql.functions._
    val a = Similarity.queries("sim_kmeans_sq8")(spark, sfDir).cache()
    // every quantizable vector lands in exactly one cluster
    val nCodes = graft.sources.Tables.embeddings(spark, sfDir)
      .where(expr("array_max(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> abs(x))) > 0D"))
      .count()
    assert(a.agg(sum("n_vecs")).head.getLong(0) === nCodes)
    assert(a.count() <= 8)
    assert(a.where(col("inertia") < 0).count() === 0)
    // identical rerun — no RNG anywhere
    val b = Similarity.queries("sim_kmeans_sq8")(spark, sfDir)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    // one more Lloyd's round can only tighten total inertia
    def inertia(iters: Int): Long =
      Similarity.kmeansSq8Run(spark, sfDir, iters)
        .agg(sum("inertia")).head.getLong(0)
    assert(inertia(2) <= inertia(1))
    a.unpersist()
  }
}
