package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates the de-confounded scale-audit arm (r15 verdict item 4):
  * `Similarity.auditPairs/auditDedup` run the declared
  * sim_cosine_pairs / sim_dedup_corpus pipelines with τ raised out of
  * the background-cosine tail, and the ScaleStress recipe plants
  * deterministic twins (cos ≈ 0.85) as their expected output. This
  * spec reproduces the planted-twin construction on a synthetic
  * corpus and pins that the audit arm finds EXACTLY the planted
  * pairs — so a regression in the τ plumbing, the LSH recall at the
  * design similarity, or the components/anti-join stages fails
  * `sbt test` instead of only a stress probe. */
class AuditArmSpec extends SparkSpec {

  private val dim = 64

  /** Deterministic base vector for id i (LCG, same discipline as
    * ScaleStress.signedPerm). */
  private def vec(i: Long): Array[Float] = {
    var state = i * 6364136223846793005L + 1442695040888963407L
    Array.fill(dim) {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33).toDouble / (1L << 31).toDouble) - 0.5).toFloat
    }
  }

  /** Perturbed twin sized for cos ≈ 0.85: x + ε‖x‖·u/‖u‖ with u
    * deterministic and ε = 0.6197 ⇒ cos ≈ 1/√(1+ε²). */
  private def twin(i: Long, base: Array[Float]): Array[Float] = {
    val u = vec(i + 7777777L)
    val nx = math.sqrt(base.map(x => x.toDouble * x).sum)
    val nu = math.sqrt(u.map(x => x.toDouble * x).sum)
    val c = 0.6197 * nx / nu
    base.zip(u).map { case (x, e) => (x + c * e).toFloat }
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("audit_arm").toString
    import spark.implicits._
    val n = 500L
    val rows = (0L until n).flatMap { i =>
      val b = vec(i)
      val planted =
        if (i % 25 == 0) Seq((i + 5000000L, twin(i, b), (i % 10).toInt))
        else Nil
      Seq((i, b, (i % 10).toInt)) ++ planted
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("auditPairs at tau=0.75 finds exactly the planted twins") {
    val planted = (0L until 500L by 25L).map(i => (i, i + 5000000L)).toSet
    val got = Similarity.auditPairs(spark, dir, 0.75)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every found pair must be a planted one (background ~6σ —
    // crossings impossible), and recall at design cos 0.85 is ≥ 0.9
    // by the (k, L) table's construction
    assert(got.subsetOf(planted),
      s"non-planted pairs surfaced: ${got.diff(planted).take(5)}")
    assert(got.size >= (planted.size * 9) / 10,
      s"recall too low: ${got.size}/${planted.size}")
    // the twins really sit at the design similarity: every found pair
    // carries cos in [0.80, 0.90]
    val sims = Similarity.auditPairs(spark, dir, 0.75)
      .select(col("cos_sim")).collect().map(_.getDouble(0))
    assert(sims.forall(s => s >= 0.80 && s <= 0.90),
      s"planted cos outside band: ${sims.filter(s => s < 0.80 || s > 0.90).take(5).mkString(",")}")
  }

  test("auditDedup at tau=0.75 drops exactly one side of each found twin pair") {
    val found = Similarity.auditPairs(spark, dir, 0.75).count()
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val kept = Similarity.auditDedup(spark, dir, 0.75).count()
    // each pair is its own 2-vector component (twins are disjoint by
    // construction), so dedup drops exactly one id per found pair
    assert(kept == total - found, s"kept=$kept total=$total found=$found")
  }
}
