package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Attribution probe for q35_recursive_depth's residual per-job tax
  * (r13 verdict item 6). The declared query runs Spark 4's native
  * `WITH RECURSIVE` (UnionLoop), which MATERIALIZES each recursion
  * level as its own job — ~14 sequential jobs at sf0.1 key range —
  * so any fixed per-job cost is amplified 14×. Hypotheses A/B'd here,
  * 5 per-rep sessions each (the BASELINE.md isolated-control method,
  * warm-up run + timed run per session):
  *
  *   native      — the declared query, as shipped
  *   native-noaqe — same SQL with adaptive execution off (each level
  *                 re-plans under AQE; is the tax AQE re-planning?)
  *   one-plan    — the same recursion unrolled into chained
  *                 conditional projections (anc>1 ? (anc DIV 2,
  *                 depth+1) : unchanged), bounded by log2(max key)
  *                 read from a 1-row pre-job: ONE narrow job + the
  *                 final groupBy instead of a job per level. Same
  *                 rows as the native form by construction.
  *
  * If one-plan ≈ native, the tax is NOT per-job scheduling; if
  * one-plan is much cheaper, the native UnionLoop's per-level
  * materialization is the attributed cost (a Spark engine property,
  * recorded in BASELINE.md, not something the declared coverage query
  * should hide by abandoning WITH RECURSIVE). */
object Q35Probe {
  private def freshSession(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = GraftSession.builder(cpus, cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def nativeQ(s: SparkSession, d: String): DataFrame =
    graft.SparkEntry.queries("q35_recursive_depth")(s, d)

  /** The declared unrolled form (Relational.q35Unrolled) — the probe
    * drives the shipped implementation, not a private copy. */
  private def onePlan(s: SparkSession, d: String): DataFrame =
    graft.SparkEntry.queries("q35_depth_unrolled")(s, d)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val variants: Seq[(String, SparkSession => DataFrame)] = Seq(
      "native" -> (s => nativeQ(s, sfDir)),
      "native-noaqe" -> { s =>
        s.conf.set("spark.sql.adaptive.enabled", "false")
        nativeQ(s, sfDir)
      },
      "one-plan" -> (s => onePlan(s, sfDir)))

    // answer parity first — a probe that times the wrong answer is noise
    locally {
      val s = freshSession(cpus)
      val ref = nativeQ(s, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val alt = onePlan(s, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      require(ref == alt, s"one-plan diverges from native:\n$ref\n$alt")
      println(s"[q35probe] parity ok: ${ref.size} depth buckets")
      s.stop()
    }

    for ((label, mk) <- variants) {
      val reps = (1 to 5).map { _ =>
        val s = freshSession(cpus)
        try {
          mk(s).count() // warm-up: plans+runs once outside the clock
          val t0 = System.nanoTime()
          mk(s).count()
          (System.nanoTime() - t0) / 1e9
        } finally s.stop()
      }
      val med = reps.sorted.apply(2)
      println(f"[q35probe] $label%-12s median=$med%.3f " +
        reps.map(r => f"$r%.3f").mkString("[", "/", "]"))
    }
  }
}
