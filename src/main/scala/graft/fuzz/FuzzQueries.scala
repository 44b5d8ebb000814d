package graft.fuzz

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixed-seed fuzz plans DECLARED as driver queries (round 12, r11
  * verdict item 5): the grammar's Spark rendering runs under the
  * driver's real DuckDB oracle every round via its SQL rendering —
  * the same differential `FuzzQuerySpec` runs in-repo against the
  * reference interpreter, now gated externally too.
  *
  * A seed names the same plan for as long as the GRAMMAR is unchanged
  * (java.util.Random's LCG is spec-pinned); extending the grammar
  * re-maps every seed, so declared seeds are re-chosen and re-verified
  * whenever the grammar grows (round 12 grew it once: IN-lists with
  * NULL members, CASE value expressions, length(), timestamp columns).
  * Current seeds, chosen for structural diversity — all three carry
  * IN-list predicates, timestamp comparisons, and CASE branches:
  *
  *   - 11: FK join ∪ filtered copy (union over ~N(lineitem) rows);
  *   - 45: FK join → ORDER BY ALL NULLS FIRST LIMIT (top-k over a
  *          null-injected join);
  *   - 49: FK join → grouped aggregation (null-extension feeding
  *          grouping).
  */
object FuzzQueries {
  type Q = (SparkSession, String) => DataFrame

  private val seeds = Seq(11L, 45L, 49L)

  private def name(seed: Long): String = s"fz_seed$seed"

  val queries: Map[String, Q] = seeds.map { s =>
    name(s) -> ((spark: SparkSession, d: String) =>
      Fuzz.toDF(Fuzz.genPlan(s), spark, d))
  }.toMap

  val oracle: Map[String, String] =
    seeds.map(s => name(s) -> Fuzz.toSql(Fuzz.genPlan(s))).toMap
}
