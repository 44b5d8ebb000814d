package graft.operators

import graft.SparkSpec
import graft.functions.LshPlanes

/** The adaptive LSH design points, gate-covered (r15 verdict item 3 +
  * advice): until this spec, `bitsFor`/`tablesForBits` and the k > 6
  * arm of the `lsh_buckets` kernel were exercised only by uncommitted
  * stress probes — the driver gate's corpora always yield the base
  * (k=6, L=8). Pins: (1) the k(n) breakpoints and the recall-holding
  * L(k) table, (2) kernel-vs-composition bit-equality (the
  * `lsh_buckets` loop vs the per-(t, j) `dot_prod` expressions it
  * replaced), (3) the forced (k=8, L=12) pipeline against a local
  * brute-force bucketing oracle, (4) the 64-dim input contract,
  * (5) clean analysis errors on misuse. */
class LshDesignSpec extends SparkSpec {

  test("bitsFor breakpoints: smallest k in [6,12] with 100·2^k ≥ n") {
    // base plateau: everything the driver gate sees lands on k=6
    assert(Similarity.bitsFor(1L) === 6)
    assert(Similarity.bitsFor(6400L) === 6)
    // each breakpoint: 100·2^k is the last n served by k
    for (k <- 6 until 12) {
      val edge = 100L << k
      assert(Similarity.bitsFor(edge) === k, s"n=$edge")
      assert(Similarity.bitsFor(edge + 1) === k + 1, s"n=${edge + 1}")
    }
    // saturation: beyond 100·2^12 the design point stays at MaxBits
    assert(Similarity.bitsFor((100L << 12) + 1) === 12)
    assert(Similarity.bitsFor(Long.MaxValue) === 12)
  }

  test("tablesForBits: pinned values; L(k) is the MINIMAL table count " +
      "with miss ≤ 0.02 at design similarity 0.9") {
    assert(Similarity.tablesForBits ===
      Map(6 -> 8, 7 -> 10, 8 -> 12, 9 -> 14, 10 -> 17, 11 -> 20, 12 -> 24))
    // Indyk–Motwani random-hyperplane collision prob at cos = 0.9
    val p = 1.0 - math.acos(0.9) / math.Pi
    def miss(k: Int, l: Int) = math.pow(1.0 - math.pow(p, k), l)
    Similarity.tablesForBits.foreach { case (k, l) =>
      assert(miss(k, l) <= 0.02, s"k=$k l=$l miss=${miss(k, l)}")
      assert(miss(k, l - 1) > 0.02,
        s"k=$k: l=$l is not minimal (l-1 already holds recall)")
    }
  }

  test("lsh_buckets kernel = per-(t,j) dot_prod composition (k=6, L=8 " +
      "and k=8, L=12)") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    for ((bits, tables) <- Seq((6, 8), (8, 12))) {
      val comp = (0 until tables).map { t =>
        (0 until bits).map { j =>
          val lit = LshPlanes.plane(t, j).mkString("array(", ", ", ")")
          s"(CASE WHEN dot_prod(v, $lit) > 0D THEN ${1 << j} ELSE 0 END)"
        }.mkString(" + ")
      }.mkString("array(", ", ", ")")
      val rows = e.selectExpr(
        s"lsh_buckets(v, $tables, $bits) AS kern", s"$comp AS comp")
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[Int](0) === r.getSeq[Int](1),
          s"kernel/composition divergence at (k=$bits, L=$tables)")
      }
    }
  }

  test("forced (k=8, L=12): sim_cosine_pairs_k8 = local bucketing " +
      "oracle (candidate-set equality, exact cosines)") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(x: Array[Double], y: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < x.length) {
        dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // independent local re-derivation of the (8, 12) bucketing
    val (bits, tables) = (8, 12)
    def buckets(v: Array[Double]): Seq[(Int, Int)] =
      (0 until tables).map { t =>
        var b = 0
        for (j <- 0 until bits) {
          val pl = LshPlanes.plane(t, j)
          var dot = 0.0
          for (i <- v.indices) dot += v(i) * pl(i)
          if (dot > 0.0) b |= 1 << j
        }
        (t, b)
      }
    val byBucket = emb.flatMap { case (id, v) =>
      buckets(v).map(tb => (tb, id))
    }.groupBy(_._1).values
    val want = (for {
      grp <- byBucket.toSeq
      ids = grp.map(_._2).sorted
      i <- ids.indices; j <- (i + 1) until ids.length
    } yield (ids(i), ids(j))).distinct
      .filter { case (a, b) =>
        val m = emb.toMap; cos(m(a), m(b)) >= 0.45
      }.toSet
    val got = Similarity.queries("sim_cosine_pairs_k8")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(p => (p._1, p._2)).toSet === want,
      "candidate-set mismatch vs local (8,12) bucketing oracle")
    val m = emb.toMap
    got.foreach { case (a, b, c) =>
      assert(math.abs(cos(m(a), m(b)) - c) < 1e-12)
    }
  }

  test("lsh_buckets rejects non-64-dim vectors (engine/oracle " +
      "divergence guard)") {
    val ex = intercept[Throwable] {
      spark.range(1)
        .selectExpr("lsh_buckets(array(1.0D, 2.0D, 3.0D), 2, 2)")
        .collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("64-dim"), msgs.take(500))
  }

  test("lsh_buckets misuse fails as clean analysis errors") {
    import org.apache.spark.sql.AnalysisException
    val wrongArity = intercept[AnalysisException] {
      spark.range(1).selectExpr("lsh_buckets(array(1.0D), 2)").collect()
    }
    assert(wrongArity.getMessage.contains("lsh_buckets"))
    val nonFoldable = intercept[AnalysisException] {
      spark.range(3)
        .selectExpr("lsh_buckets(array(1.0D), CAST(id AS INT), 2)")
        .collect()
    }
    assert(nonFoldable.getMessage.contains("lsh_buckets"))
  }
}
