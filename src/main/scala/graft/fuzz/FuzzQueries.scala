package graft.fuzz

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixed-seed fuzz plans DECLARED as driver queries (round 12, r11
  * verdict item 5): the grammar's Spark rendering runs under the
  * driver's real DuckDB oracle every round via its SQL rendering —
  * the same differential `FuzzQuerySpec` runs in-repo against the
  * reference interpreter, now gated externally too. Seeds chosen for
  * structural diversity (a seed names the same plan forever —
  * java.util.Random's LCG is spec-pinned):
  *
  *   - 1:  inner FK join ∪ filtered copy → DISTINCT → filter
  *          (join + union + distinct over ~N(lineitem) rows);
  *   - 30: nested aggregations (2-key agg over a 2-key agg) with
  *          computed projections — the partial-agg pipeline shape;
  *   - 61: left join → grouped agg → ORDER BY ALL NULLS FIRST LIMIT
  *          (null-extension feeding grouping feeding top-k).
  */
object FuzzQueries {
  type Q = (SparkSession, String) => DataFrame

  private val seeds = Seq(1L, 30L, 61L)

  private def name(seed: Long): String = s"fz_seed$seed"

  val queries: Map[String, Q] = seeds.map { s =>
    name(s) -> ((spark: SparkSession, d: String) =>
      Fuzz.toDF(Fuzz.genPlan(s), spark, d))
  }.toMap

  val oracle: Map[String, String] =
    seeds.map(s => name(s) -> Fuzz.toSql(Fuzz.genPlan(s))).toMap
}
