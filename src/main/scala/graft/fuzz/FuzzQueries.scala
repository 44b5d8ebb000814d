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
  * whenever the grammar grows. Round 13 grew it FOUR times: into the
  * DECIMAL(15,2) / guarded-division / cents-AVG / rank-window trap
  * zones; then into ROLLUP + CUBE grouping-set lattices with
  * GROUPING() flags, uncorrelated scalar subqueries, literal HAVING
  * rendering, and LAG/LEAD/NTILE; then into null-aware `[NOT] IN
  * (SELECT …)` membership subqueries; then into `LIMIT n OFFSET m`
  * and the RANGE-frame running sum (peer-inclusive CURRENT ROW — the
  * frame rule that diverges from ROWS exactly on duplicate peers) —
  * see the [[Fuzz]] scaladoc. The THIRD revision's sweep adjudicated
  * one engine bug per engine: the Spark 4.1.2 RemoveRedundantAliases
  * optimizer crash (pinned as an explicit Plan AST in `FuzzQuerySpec`)
  * and a DUCKDB 1.0.0 wrong-result optimizer bug — a
  * `x = y AND NOT (x >= y)` filter over a UNION ALL of aggregates
  * returns the x = y rows, i.e. the negated conjunct is dropped;
  * `PRAGMA disable_optimizer` agrees with Spark AND the reference
  * interpreter, minimal repro pinned in `tools/duckdb_bugpin.py`.
  * Current seeds, re-verified against the 1500-seed DuckDB sweep of
  * the FOURTH revision's map,
  * chosen so each exercises a revision feature WITH non-trivial
  * output (the previous pick left 4/6 seeds at zero rows — legitimate
  * agreements, but a 0=0 hash-match gates less than a populated one):
  *
  *   - 2:   1-key CUBE with 3 aggregates over doubly-filtered
  *          lineitem — the grouping-set lattice at fact scale
  *          (1150 rows at sf0.001);
  *   - 49:  Agg over `LIMIT 17 OFFSET 3` over a FULL OUTER join of
  *          orders and filtered customer — the skip-then-take rule
  *          feeding aggregation (revision 4);
  *   - 70:  NOT IN over a LEFT join of lineitem with filtered orders,
  *          probed against a filtered supplier subquery — the
  *          null-aware anti join at fact scale, output ~5k rows;
  *   - 114: scalar-subquery `<>` filter (1-row global aggregate of
  *          lineitem) over a SEMI join — correlated-EXISTS machinery
  *          under an UNKNOWN-propagating comparison, ~5k rows;
  *   - 176: 2-key Agg over a RANGE-frame running sum partitioned by
  *          l_orderkey over a self-union of lineitem — the
  *          peer-inclusive default frame at 120k-row scale, where the
  *          self-union GUARANTEES duplicate peers so RANGE ≠ ROWS on
  *          this very data (revision 4);
  *   - 220: NOT IN whose outer key is a GROUPING() FLAG of a ROLLUP
  *          over filtered region — rolled-up lattice markers probed
  *          through null-aware membership (3 rows, every lattice
  *          level represented);
  *   - 247: LEAD over an aggregate column of a 2-key CUBE on distinct
  *          filtered lineitem — offset-function successor ties over
  *          grouping-set output, 304 rows;
  *   - 336: Filter directly over a grouped Agg inside an EXCEPT ALL —
  *          rendered as a LITERAL `HAVING` clause (aggregate aliases
  *          inlined as aggregate expressions) through BOTH SQL
  *          frontends, composed with multiset set-op semantics,
  *          150 rows.
  */
object FuzzQueries {
  type Q = (SparkSession, String) => DataFrame

  private val seeds = Seq(2L, 49L, 70L, 114L, 176L, 220L, 247L, 336L)

  private def name(seed: Long): String = s"fz_seed$seed"

  val queries: Map[String, Q] = seeds.map { s =>
    name(s) -> ((spark: SparkSession, d: String) =>
      Fuzz.toDFOut(Fuzz.genPlan(s), spark, d))
  }.toMap

  val oracle: Map[String, String] =
    seeds.map(s => name(s) -> Fuzz.toSqlOut(Fuzz.genPlan(s))).toMap
}
