package graft.fuzz

import graft.SparkSpec

/** Differential query fuzzing (round 12, r11 verdict item 5): hundreds
  * of seeded random plans from the closed grammar, each executed by
  * Spark AND by the independent ANSI-semantics interpreter, compared as
  * canonical row multisets. A failure SHRINKS structurally (subplans,
  * re-checked) to a minimal failing node and prints it with its
  * DuckDB-runnable SQL, so a semantics corner reproduces outside the
  * test too. Seeds are fixed — the sweep is deterministic and a
  * regression names the exact seed. */
class FuzzQuerySpec extends SparkSpec {

  private lazy val tables = Fuzz.loadTables(spark, sfDir)

  /** Seeds whose DataFrame rendering hit a PINNED engine crash and
    * were adjudicated by fingerprint rather than compared (printed by
    * the sweep that collected them). */
  private val crashAdjudicated =
    scala.collection.mutable.ArrayBuffer.empty[String]

  /** None = agree; Some(diagnostic) = differ. */
  private def check(p: Fuzz.Plan): Option[String] = {
    val got =
      try Fuzz.canonSpark(Fuzz.toDF(p, spark, sfDir))
      catch {
        // the pinned Spark 4.1.2 RemoveRedundantAliases crash
        // (sentinel test below asserts the crash AND the
        // agreement-under-rule-exclusion): rev 9's seed remap put the
        // ROLLUP/CUBE-over-UNION shape inside the 400-seed window for
        // the first time (seed 237@r9). Adjudicate by shape guard +
        // the engine's own fingerprint — the same discipline the
        // three-way applies to the decorrelation crash — and record
        // the seed instead of comparing.
        case e: Throwable
            if Fuzz.rollupOverUnion(p) &&
              String.valueOf(e.getMessage)
                .contains("PLAN_VALIDATION_FAILED_RULE_IN_BATCH") &&
              String.valueOf(e.getMessage).contains("RemoveRedundantAliases") =>
          crashAdjudicated += p.toString.take(60)
          return None
      }
    val exp = Fuzz.canonRef(Fuzz.eval(p, tables), p.schema)
    if (got == exp) None
    else Some(
      s"spark rows=${got.size}, reference rows=${exp.size}\n" +
        s"spark-only sample: ${got.diff(exp).take(3)}\n" +
        s"reference-only sample: ${exp.diff(got).take(3)}")
  }

  /** Greedy structural minimization: while any subplan still fails,
    * descend into it. */
  private def minimize(p: Fuzz.Plan): Fuzz.Plan = {
    var cur = p
    var shrunk = true
    while (shrunk) {
      Fuzz.shrink(cur).find(sub => check(sub).isDefined) match {
        case Some(sub) => cur = sub
        case None      => shrunk = false
      }
    }
    cur
  }

  test("differential fuzz: 400 seeded plans agree between Spark and the reference interpreter") {
    val failures = (1L to 400L).flatMap { seed =>
      val p = Fuzz.genPlan(seed)
      check(p).map(msg => (seed, p, msg))
    }
    if (failures.nonEmpty) {
      val (seed, p, msg) = failures.head
      val m = minimize(p)
      fail(
        s"${failures.size} failing seed(s); first = $seed\n$msg\n" +
          s"minimal failing subplan:\n$m\n" +
          s"as DuckDB SQL:\n${Fuzz.toSql(m)}")
    }
  }

  test("differential fuzz, grammar revision 6: 400 seeded plans with residual ON predicates agree") {
    // revision 6 is ADDITIVE (Fuzz.genPlan(seed, rev)): the rev-5 map
    // above stays pinned; this sweep draws the NEW map, where half the
    // joins carry a residual ON predicate over the combined schema —
    // outer-join ON-vs-WHERE null-extension, correlated EXISTS with
    // non-equi conjuncts, and per-pair 3VL at the match site
    val failures = (1L to 400L).flatMap { seed =>
      val p = Fuzz.genPlan(seed, 6)
      check(p).map(msg => (seed, p, msg))
    }
    if (failures.nonEmpty) {
      val (seed, p, msg) = failures.head
      val m = minimize(p)
      fail(
        s"${failures.size} failing rev-6 seed(s); first = $seed\n$msg\n" +
          s"minimal failing subplan:\n$m\n" +
          s"as DuckDB SQL:\n${Fuzz.toSql(m)}")
    }
  }

  test("differential fuzz, grammar revision 7: 400 seeded plans with correlated scalar subqueries agree") {
    // revision 7 adds CorrScalar — correlated scalar subqueries in
    // the SELECT list, where the DataFrame rendering is the
    // HAND-DECORRELATED form (key-grouped aggregate + left outer join
    // + the COUNT-bug coalesce repair) and must agree with the naive
    // per-row interpreter on every seed, including the per-row
    // empty-slice COUNT-0-vs-SUM-NULL split
    val failures = (1L to 400L).flatMap { seed =>
      val p = Fuzz.genPlan(seed, 7)
      check(p).map(msg => (seed, p, msg))
    }
    if (failures.nonEmpty) {
      val (seed, p, msg) = failures.head
      val m = minimize(p)
      fail(
        s"${failures.size} failing rev-7 seed(s); first = $seed\n$msg\n" +
          s"minimal failing subplan:\n$m\n" +
          s"as DuckDB SQL:\n${Fuzz.toSql(m)}")
    }
  }

  test("differential fuzz, grammar revision 8: 400 seeded plans with correlated scalars in WHERE/HAVING agree") {
    // revision 8 adds CorrScalarCmp — the correlated scalar COMPARED
    // in WHERE or in a real HAVING, where the count-bug zone decides
    // row RETENTION (COUNT over an empty slice is 0 and compares;
    // SUM/MIN/MAX go NULL and the UNKNOWN comparison drops the row).
    // The hand-decorrelated DataFrame rendering must agree with the
    // naive per-row interpreter on every seed.
    val failures = (1L to 400L).flatMap { seed =>
      val p = Fuzz.genPlan(seed, 8)
      check(p).map(msg => (seed, p, msg))
    }
    if (failures.nonEmpty) {
      val (seed, p, msg) = failures.head
      val m = minimize(p)
      fail(
        s"${failures.size} failing rev-8 seed(s); first = $seed\n$msg\n" +
          s"minimal failing subplan:\n$m\n" +
          s"as DuckDB SQL:\n${Fuzz.toSql(m)}")
    }
  }

  test("differential fuzz, grammar revision 9: 400 seeded plans with correlated [NOT] IN agree") {
    // revision 9 adds CorrInSub — correlated [NOT] IN membership,
    // where InSub's null-aware 3VL rule runs over a PER-ROW correlated
    // slice: the empty slice is FALSE (NOT IN keeps the row, NULL cmp
    // included) while a NULL cmp or a miss against a NULL-bearing
    // slice is UNKNOWN (drops). The hand-decorrelated two-join
    // DataFrame rendering must agree with the naive per-row
    // interpreter on every seed.
    val failures = (1L to 400L).flatMap { seed =>
      val p = Fuzz.genPlan(seed, 9)
      check(p).map(msg => (seed, p, msg))
    }
    if (failures.nonEmpty) {
      val (seed, p, msg) = failures.head
      val m = minimize(p)
      fail(
        s"${failures.size} failing rev-9 seed(s); first = $seed\n$msg\n" +
          s"minimal failing subplan:\n$m\n" +
          s"as DuckDB SQL:\n${Fuzz.toSql(m)}")
    }
    if (crashAdjudicated.nonEmpty)
      info(s"${crashAdjudicated.size} plan(s) adjudicated under the " +
        "pinned RemoveRedundantAliases fingerprint")
  }

  test("differential fuzz, grammar revision 10: 400 seeded plans with quantified ANY/ALL comparisons agree") {
    // revision 10 adds CorrQuantCmp — `cmp <op> ANY|ALL` over a
    // per-row correlated slice, op from the four inequalities. The
    // hand-decorrelated census rendering (size / non-null count /
    // min / max + extreme comparison) must agree with the naive
    // per-row quantifier on every seed, including the mirrored
    // empty-slice asymmetry (ALL keeps, ANY drops) and the
    // slice-NULL UNKNOWN blocking ALL but not a satisfied ANY.
    val failures = (1L to 400L).flatMap { seed =>
      val p = Fuzz.genPlan(seed, 10)
      check(p).map(msg => (seed, p, msg))
    }
    if (failures.nonEmpty) {
      val (seed, p, msg) = failures.head
      val m = minimize(p)
      fail(
        s"${failures.size} failing rev-10 seed(s); first = $seed\n$msg\n" +
          s"minimal failing subplan:\n$m\n" +
          s"as DuckDB SQL:\n${Fuzz.toSql(m)}")
    }
  }

  test("differential fuzz, grammar revision 11: 400 seeded plans with ON-clause subqueries and LATERAL top-n agree") {
    // revision 11 adds JoinOnSub — a correlated [NOT] EXISTS / [NOT]
    // IN inside a JOIN ON clause, whose verdict decides JOIN MATCHING
    // (a FALSE/UNKNOWN verdict null-extends on LEFT/FULL where the
    // same predicate in WHERE would drop) — and LateralTopN, the
    // per-row correlated ORDER BY + LIMIT, the grammar's first
    // row-multiplying transform. The hand-decorrelated renderings
    // (per-left-row verdict column carried into the join condition;
    // row_number window + key join) must agree with the naive
    // interpreter on every seed.
    val failures = (1L to 400L).flatMap { seed =>
      val p = Fuzz.genPlan(seed, 11)
      check(p).map(msg => (seed, p, msg))
    }
    if (failures.nonEmpty) {
      val (seed, p, msg) = failures.head
      val m = minimize(p)
      fail(
        s"${failures.size} failing rev-11 seed(s); first = $seed\n$msg\n" +
          s"minimal failing subplan:\n$m\n" +
          s"as DuckDB SQL:\n${Fuzz.toSql(m)}")
    }
  }

  test("differential fuzz, grammar revision 12: 400 seeded plans with recursive CTEs and RANGE offset frames agree") {
    // revision 12 adds RecCte — the depth-bounded UNION ALL recursive
    // walk, whose DataFrame rendering is exact loop unrolling — and
    // RangeOffsetSum, the value-based window frame with ASC/DESC
    // offset arithmetic and the NULL-peer-group rule. Both
    // hand-built renderings must agree with the naive interpreter on
    // every seed.
    val failures = (1L to 400L).flatMap { seed =>
      val p = Fuzz.genPlan(seed, 12)
      check(p).map(msg => (seed, p, msg))
    }
    if (failures.nonEmpty) {
      val (seed, p, msg) = failures.head
      val m = minimize(p)
      fail(
        s"${failures.size} failing rev-12 seed(s); first = $seed\n$msg\n" +
          s"minimal failing subplan:\n$m\n" +
          s"as DuckDB SQL:\n${Fuzz.toSql(m)}")
    }
  }

  test("parse-gap sentinel: Spark 4.1.2 recursion is UNION-ALL-only") {
    // Why RecCte generates only the UNION ALL form: Spark 4.x's new
    // recursive-CTE support rejects the UNION (distinct) fixpoint
    // outright. FIXED ON UPGRADE: when this intercept fails, Spark
    // has gained distinct recursion — add a distinct-closure variant
    // to RecCte (termination without a depth bound) and fuzz it.
    Fuzz.catalog.keys.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    val e = intercept[Exception](spark.sql(
      "WITH RECURSIVE w(node) AS (SELECT n_nationkey FROM nation " +
        "WHERE n_nationkey < 3 UNION SELECT n.n_regionkey FROM nation n " +
        "JOIN w ON n.n_nationkey = w.node) SELECT * FROM w").collect())
    assert(String.valueOf(e.getMessage)
        .contains("UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"),
      s"FIXED ON UPGRADE: Spark now supports UNION recursion — extend " +
        s"RecCte (got: ${String.valueOf(e.getMessage).take(120)})")
  }

  test("parse-gap sentinel: Spark 4.1.2 cannot parse quantified comparisons (ANY/ALL subqueries)") {
    // The reason toSqlSpark exists: `<op> ANY (subquery)` is ANSI and
    // DuckDB plans it, but Spark's parser rejects it outright. Pinned
    // so the dialect split is justified by the engine's own behavior;
    // FIXED ON UPGRADE: when this intercept fails, Spark has gained
    // the syntax — converge toSqlSpark's CorrQuantCmp case back to
    // the literal quantified text and let the three-way run Spark's
    // own quantifier planning.
    Fuzz.catalog.keys.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    val e = intercept[Exception](spark.sql(
      "SELECT n_name FROM nation WHERE n_nationkey < ANY " +
        "(SELECT r_regionkey FROM region)").collect())
    assert(String.valueOf(e.getMessage).contains("PARSE_SYNTAX_ERROR"),
      s"FIXED ON UPGRADE: Spark now parses quantified comparisons — " +
        s"converge toSqlSpark (got: ${e.getMessage.take(120)})")
  }

  test("engine-bug sentinel: predicate-position correlated scalar over a correlated-scalar output fails at runtime (Spark 4.1.2)") {
    // The round-16 pin (found by the rev-11 selector remap at seed
    // 338, hand-minimized here): a WHERE-position correlated scalar
    // subquery whose correlation key is ITSELF a SELECT-list
    // correlated-scalar output makes Spark fail at RUNTIME on valid
    // ANSI SQL — two distinct ways. When the same column is also the
    // comparison operand, the decorrelated "scalar" join produces
    // multiple rows per key and the SCALAR_SUBQUERY_TOO_MANY_ROWS
    // guard trips; when only the correlation side uses it, the
    // subquery scheduler never sequences the inner scalar
    // ("Subquery … has not finished"). The SELECT-list spelling of
    // the same composition works, as do EXISTS and an uncorrelated
    // inner scalar — and DuckDB, the hand-decorrelated DataFrame
    // rendering, and the reference interpreter all agree on these
    // plans (rev-11 differential + 1500-seed DuckDB sweep cover seed
    // 338), so the SQL frontend alone is defective. FIXED ON
    // UPGRADE: when either intercept stops matching, drop the
    // corrScalarCmpOnCorrScalarOutput adjudication from the frontend
    // sweep and let the three-way compare results.
    Fuzz.catalog.keys.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    val innerScalar =
      "(SELECT (SELECT MAX(r_regionkey) FROM region r3 " +
        "WHERE r3.r_regionkey = co3.s_nationkey) AS cs3, " +
        "co3.s_suppkey FROM supplier co3) co1"
    val bothSides =
      s"SELECT cs3 FROM $innerScalar WHERE co1.cs3 > " +
        "(SELECT SUM(n_regionkey) FROM nation n1 " +
        "WHERE n1.n_nationkey = co1.cs3)"
    val corrSideOnly =
      s"SELECT cs3 FROM $innerScalar WHERE co1.s_suppkey > " +
        "(SELECT SUM(n_regionkey) FROM nation n1 " +
        "WHERE n1.n_nationkey = co1.cs3)"
    val e1 = intercept[Exception](spark.sql(bothSides).collect())
    assert(String.valueOf(e1.getMessage)
        .contains("SCALAR_SUBQUERY_TOO_MANY_ROWS"),
      s"FIXED ON UPGRADE (multi-row guard): retire the csc " +
        s"adjudication (got: ${String.valueOf(e1.getMessage).take(120)})")
    val e2 = intercept[Exception](spark.sql(corrSideOnly).collect())
    assert(String.valueOf(e2.getMessage).contains("has not finished"),
      s"FIXED ON UPGRADE (subquery scheduling): retire the csc " +
        s"adjudication (got: ${String.valueOf(e2.getMessage).take(120)})")
    // the guard itself recognizes the generated shape that found this
    assert(Fuzz.corrScalarCmpOnCorrScalarOutput(Fuzz.genPlan(338L, 11)),
      "shape guard no longer matches seed 338@r11 — the adjudication " +
        "in the frontend sweep would silently stop applying")
  }

  test("three-way differential: the rendered SQL through Spark's OWN parser agrees with the interpreter") {
    // Round 13 (r12 verdict item 3): toSql was written for DuckDB, and
    // the DataFrame rendering is what the driver gate executes — so the
    // DataFrame-API-vs-SQL-frontend consistency of Spark itself was
    // exercised only by q35 and the view-pushdown spec. Running the
    // IDENTICAL SQL text through spark.sql over raw views (the
    // rendering casts its own columns) closes that gap for every plan
    // the grammar can express. Dialect shims needed: two — sqlType
    // renders STRING, not VARCHAR (DuckDB aliases STRING to VARCHAR;
    // Spark rejects bare VARCHAR without a length), and rev 10's
    // quantified comparisons render through toSqlSpark's EXISTS
    // spelling because Spark has no ANY/ALL-subquery syntax at all
    // (the parse-gap sentinel above). Everything else (FULL JOIN,
    // EXCEPT/INTERSECT ALL, correlated EXISTS, ||, NULLIF, TIMESTAMP
    // literals, NULLS FIRST, ROUND, window frames) parses identically
    // on both frontends.
    Fuzz.catalog.keys.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    // every grammar map through the SQL frontend: the pinned rev-5
    // stream, the rev-6 stream with residual ON predicates (the
    // correlated-EXISTS spelling must decorrelate identically), and
    // the rev-7 stream whose correlated scalar subqueries run through
    // Spark's OWN RewriteCorrelatedScalarSubquery — the engine
    // decorrelator vs the hand-decorrelated DataFrame form — and the
    // rev-8 stream whose correlated scalars sit in WHERE/HAVING
    // predicates, and the rev-9 stream whose correlated [NOT] IN
    // membership runs Spark's null-aware predicate-subquery
    // decorrelation against the hand-built two-join form (round 15),
    // and the rev-10 stream whose quantified ANY/ALL comparisons run
    // Spark's correlated-EXISTS decorrelation via toSqlSpark's
    // 3VL-expanded spelling (the one node where the dialects' text
    // diverges — Spark cannot parse the quantifier)
    val adjudicated = scala.collection.mutable.ArrayBuffer.empty[String]
    val failures = Seq(5, 6, 7, 8, 9, 10, 11, 12).flatMap { rev =>
      (1L to 400L).flatMap { seed =>
        val p = Fuzz.genPlan(seed, rev)
        val sql = Fuzz.toSqlSpark(p)
        val got =
          try Some(Fuzz.canonSpark(spark.sql(sql)))
          catch {
            // the pinned Spark 4.1.2 decorrelation crash (sentinel
            // test below — two known trigger shapes: a correlated
            // scalar subquery over a bare UNION ALL, and one inside
            // an INTERSECT ALL / EXCEPT ALL branch): the engine dies
            // on its OWN frontend with this exact internal-error
            // fingerprint; the DataFrame rendering of the same plan
            // is covered by the rev-7 differential above, so the
            // seed is adjudicated, not skipped silently
            case e: java.util.NoSuchElementException
                if Fuzz.containsCorrScalar(p) &&
                  String.valueOf(e.getMessage).startsWith("key not found") =>
              adjudicated += s"$seed@r$rev"; None
            // the pinned RemoveRedundantAliases crash (its own
            // sentinel below): the SQL frontend hits the same
            // optimizer-batch validation failure as the DataFrame
            // path — rev 9's seed map is the first to draw the
            // ROLLUP/CUBE-over-UNION shape inside the 400-seed window
            case e: Throwable
                if Fuzz.rollupOverUnion(p) &&
                  String.valueOf(e.getMessage)
                    .contains("PLAN_VALIDATION_FAILED_RULE_IN_BATCH") &&
                  String.valueOf(e.getMessage)
                    .contains("RemoveRedundantAliases") =>
              adjudicated += s"$seed@r$rev(rra)"; None
            // the round-16 pinned WHERE/HAVING-position defect (its
            // own sentinel below): a predicate-position correlated
            // scalar whose correlation key or comparison operand is a
            // SELECT-list correlated-scalar output fails at RUNTIME
            // two ways — the multi-row guard trips on the
            // decorrelated join, or the subquery scheduler never
            // finishes the inner scalar. Reachable since rev 8; the
            // rev-11 selector remap first drew it in-window
            // (seed 338@r11). DuckDB + DataFrame + interpreter agree
            // on these plans (the rev-11 differential and the DuckDB
            // sweep both cover seed 338), so the SQL frontend alone
            // is wrong — adjudicated by shape + fingerprint.
            case e: Throwable
                if Fuzz.corrScalarCmpOnCorrScalarOutput(p) &&
                  (String.valueOf(e.getMessage)
                    .contains("SCALAR_SUBQUERY_TOO_MANY_ROWS") ||
                   String.valueOf(e.getMessage)
                    .contains("has not finished")) =>
              adjudicated += s"$seed@r$rev(csc)"; None
            case scala.util.control.NonFatal(e) =>
              fail(s"seed $seed@r$rev failed to parse/execute via spark.sql: $e\n$sql")
          }
        got.flatMap { g =>
          val exp = Fuzz.canonRef(Fuzz.eval(p, tables), p.schema)
          if (g == exp) None
          else if (Fuzz.corrScalarOverSortLimit(p) &&
              Fuzz.canonSpark(Fuzz.toDF(p, spark, sfDir)) == exp) {
            // the pinned EliminateSorts WRONG-RESULTS bug (sentinel
            // test below): a correlated SELECT-list scalar over an
            // ORDER BY … LIMIT child makes spark.sql keep arbitrary
            // rows. No error fingerprint exists for a wrong answer,
            // so the honest guard is the shape predicate PLUS a
            // re-verification that the DataFrame rendering of the
            // SAME plan agrees with the interpreter — the engine's
            // own two frontends disagreeing is the adjudication.
            adjudicated += s"$seed@r$rev(sort)"; None
          } else Some((s"$seed@r$rev", sql, g.size, exp.size))
        }
      }
    }
    info(s"adjudicated decorrelation-crash seeds: ${adjudicated.toList}")
    if (failures.nonEmpty)
      fail(s"${failures.size} SQL-frontend disagreement(s); first: ${failures.head}")
  }

  test("interpreter self-checks: 3VL, null groups, empty-input aggregates") {
    import Fuzz._
    // Kleene: NULL AND false = false (filter drops), NULL OR true = true
    val njNation = Project(Scan("nation"), Seq(
      "k" -> NullWhen(Cmp("=", Arith("%", Col("n_nationkey", LongT), LitL(2L)),
        LitL(0L)), Col("n_nationkey", LongT)),
      "r" -> (Col("n_regionkey", LongT): Expr)))
    // rows with k NULL (even keys): k < 5 is NULL; NULL AND (r < 0)
    // = false → dropped either way; NULL OR (r >= 0) = true → kept
    val andDrop = Filter(njNation,
      And(Cmp("<", Col("k", LongT), LitL(5L)), Cmp("<", Col("r", LongT), LitL(0L))))
    val orKeep = Filter(njNation,
      Or(Cmp("<", Col("k", LongT), LitL(5L)), Cmp(">=", Col("r", LongT), LitL(0L))))
    assert(check(andDrop).isEmpty)
    assert(check(orKeep).isEmpty)
    assert(canonSpark(toDF(orKeep, spark, sfDir)).size == 25,
      "NULL OR TRUE must keep every row")
    // NULL group key is a real group; SUM over the all-NULL slice is
    // NULL while COUNT is 0 — on an EMPTY input the global agg still
    // emits its one row
    val aggNull = Agg(njNation, Seq(Col("k", LongT)),
      Seq("c" -> CountCol(Col("k", LongT)), "s" -> SumL(Col("k", LongT))))
    assert(check(aggNull).isEmpty)
    val emptyAgg = Agg(Filter(Scan("region"),
      Cmp("<", Col("r_regionkey", LongT), LitL(0L))), Nil,
      Seq("n" -> CountStar, "s" -> SumL(Col("r_regionkey", LongT))))
    assert(check(emptyAgg).isEmpty)
    val row = canonSpark(toDF(emptyAgg, spark, sfDir))
    assert(row == Seq(Seq("0", "NULL")),
      s"empty global agg must be count=0, sum=NULL; got $row")
    // NULL join keys match nothing — inner drops them, left null-extends
    val njCustomer = Project(Scan("customer"), Seq(
      "ck" -> NullWhen(Cmp("=", Arith("%", Col("c_custkey", LongT), LitL(3L)),
        LitL(0L)), Col("c_nationkey", LongT))))
    for (jt <- Seq("inner", "left", "semi", "anti")) {
      val j = Join(njCustomer, Scan("nation"), jt,
        Col("ck", LongT), Col("n_nationkey", LongT))
      assert(check(j).isEmpty, s"join type $jt")
    }
  }

  test("InSub self-checks: NOT IN null-awareness in all three renderings") {
    import Fuzz._
    // NULL-injected outer key over customer (every 3rd key NULL)
    val cust = Project(Scan("customer"), Seq(
      "ck" -> NullWhen(Cmp("=", Arith("%", Col("c_custkey", LongT), LitL(3L)),
        LitL(0L)), Col("c_nationkey", LongT))))
    val custRows = toDF(cust, spark, sfDir).count()
    // (1) sub bearing a NULL: NOT IN must drop EVERY row (UNKNOWN or
    // FALSE for all); IN keeps exactly the matches
    val subNull = Project(Scan("nation"), Seq("ik9_0" -> NullWhen(
      Cmp("=", Arith("%", Col("n_nationkey", LongT), LitL(5L)), LitL(0L)),
      Col("n_nationkey", LongT))))
    val notInNull = InSub(cust, Col("ck", LongT), subNull,
      Col("ik9_0", LongT), negated = true)
    assert(check(notInNull).isEmpty)
    assert(canonSpark(toDF(notInNull, spark, sfDir)).isEmpty,
      "NOT IN over a NULL-bearing subquery must drop every row")
    assert(check(notInNull.copy(negated = false)).isEmpty)
    // (2) EMPTY sub: NOT IN keeps every row — NULL keys included
    // (x IN (empty) = FALSE, not UNKNOWN); IN keeps none
    val subEmpty = Project(
      Filter(Scan("region"), Cmp("<", Col("r_regionkey", LongT), LitL(0L))),
      Seq("ik9_0" -> (Col("r_regionkey", LongT): Expr)))
    val notInEmpty = InSub(cust, Col("ck", LongT), subEmpty,
      Col("ik9_0", LongT), negated = true)
    assert(check(notInEmpty).isEmpty)
    assert(canonSpark(toDF(notInEmpty, spark, sfDir)).size == custRows,
      "NOT IN (empty) must keep every row, NULL keys included")
    assert(check(notInEmpty.copy(negated = false)).isEmpty)
    assert(canonSpark(toDF(notInEmpty.copy(negated = false), spark, sfDir)).isEmpty)
    // (3) the same NULL-bearing NOT IN through Spark's SQL frontend
    // (null-aware anti join) agrees: zero rows
    catalog.keys.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    assert(canonSpark(spark.sql(toSql(notInNull))).isEmpty,
      "spark.sql NOT IN over a NULL-bearing subquery must drop every row")
  }

  test("adjudicated Spark 4.1.2 frontend bug: correlated scalar subquery over a bare UNION ALL crashes decorrelation") {
    // Surfaced by the revision-7 three-way differential (seeds 12@r7
    // and 377@r7, hand-minimized with tools/RawSql): `spark.sql` dies
    // with an INTERNAL java.util.NoSuchElementException ("key not
    // found: <attr>") — not an AnalysisException — while
    // decorrelating a correlated scalar subquery in (at least) TWO
    // shapes: (a) the subquery's outer FROM is a bare UNION ALL
    // derived table; (b) the subquery sits inside a branch of
    // INTERSECT ALL / EXCEPT ALL (whose rewrites build Union-based
    // plans). Boundary (all probed): for (a), ANY barrier between
    // the subquery block and the Union (WHERE / projection /
    // DISTINCT / LIMIT / window) avoids it and arity doesn't matter;
    // for (b), plain UNION ALL of correlated branches and DISTINCT
    // INTERSECT/EXCEPT are all FINE — only the ALL rewrites crash.
    // DuckDB runs the identical texts, and the hand-decorrelated
    // DataFrame rendering of the same ASTs agrees with the reference
    // interpreter — an engine crash, not a semantics divergence.
    // Pinned so a Spark upgrade that fixes it surfaces here (these
    // intercepts will fail → drop the pin and the three-way
    // adjudication guard).
    import Fuzz._
    spark.read.parquet(s"$sfDir/nation.parquet")
      .createOrReplaceTempView("nation_bugpin")
    spark.read.parquet(s"$sfDir/supplier.parquet")
      .createOrReplaceTempView("supplier_bugpin")
    val repro = "SELECT u.*, (SELECT COUNT(*) FROM supplier_bugpin " +
      "WHERE s_suppkey = u.n_regionkey) AS c FROM " +
      "(SELECT * FROM nation_bugpin UNION ALL SELECT * FROM nation_bugpin) u"
    val e = intercept[java.util.NoSuchElementException](
      spark.sql(repro).collect())
    assert(String.valueOf(e.getMessage).startsWith("key not found"),
      e.getMessage)
    // shape (b): the same subquery as an INTERSECT ALL branch; the
    // UNION ALL spelling of the identical branches executes fine
    val branch = "SELECT n.*, (SELECT COUNT(*) FROM supplier_bugpin " +
      "WHERE s_suppkey = n.n_regionkey) AS c FROM nation_bugpin n"
    val e2 = intercept[java.util.NoSuchElementException](
      spark.sql(s"($branch) INTERSECT ALL ($branch)").collect())
    assert(String.valueOf(e2.getMessage).startsWith("key not found"),
      e2.getMessage)
    assert(spark.sql(s"($branch) UNION ALL ($branch)").collect().length == 50,
      "plain UNION ALL of correlated branches must execute")
    // the same shape as the grammar's own AST: the crash detector
    // recognizes it, the DataFrame rendering agrees with the
    // interpreter (semantic adjudication), and one Filter barrier
    // over the identical Union executes through spark.sql
    val sub = Project(Scan("supplier"), Seq(
      "bp_k" -> (Col("s_suppkey", LongT): Expr),
      "bp_v" -> (Col("s_name", StringT): Expr)))
    val crashShape = CorrScalar(UnionAll(Scan("nation"), Scan("nation")),
      Col("n_regionkey", LongT), sub, Col("bp_k", LongT),
      Col("bp_v", StringT), CountStar, "c")
    assert(corrScalarOverUnion(crashShape))
    assert(check(crashShape).isEmpty,
      "DataFrame rendering of the crash shape differs from the interpreter")
    val barriered = crashShape.copy(child = Filter(
      UnionAll(Scan("nation"), Scan("nation")),
      Cmp(">=", Col("n_nationkey", LongT), LitL(0L))))
    assert(!corrScalarOverUnion(barriered))
    Fuzz.catalog.keys.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    assert(canonSpark(spark.sql(toSql(barriered))) ==
      canonRef(eval(barriered, tables), barriered.schema),
      "one Filter barrier must make the same query run and agree")
  }

  test("adjudicated Spark 4.1.2 optimizer bug: RemoveRedundantAliases invalidates ROLLUP-over-UNION plans") {
    // The 1500-seed sweep surfaced 2 seeds (648, 1153) whose plans
    // crash Spark's OWN optimizer — PLAN_VALIDATION_FAILED_RULE_IN_
    // BATCH from RemoveRedundantAliases ("previously resolved and now
    // became unresolved") — on BOTH the DataFrame and spark.sql paths,
    // so it is an engine bug, not a renderer bug. Minimal repro
    // (shrunk by hand from seed 648): parquet scan → identity-aliased
    // projection → UNION ALL of it with a filtered copy → GROUP BY
    // ROLLUP with an aggregate over a rollup KEY. A LocalRelation
    // source does NOT trip it — the file relation is part of the
    // trigger. Pinned so a Spark upgrade that fixes it surfaces here
    // (this test will fail → remove the pin and the exclusion).
    spark.read.parquet(s"$sfDir/supplier.parquet")
      .createOrReplaceTempView("supplier_bugpin")
    val proj = "SELECT s_suppkey AS s_suppkey, s_name AS s_name" +
      " FROM supplier_bugpin"
    val repro = s"SELECT s_suppkey, s_name, MAX(s_suppkey) m FROM " +
      s"(($proj) UNION ALL (SELECT * FROM ($proj) f_ WHERE s_suppkey > 10)) u " +
      "GROUP BY ROLLUP (s_suppkey, s_name)"
    val e = intercept[Exception](spark.sql(repro).collect())
    assert(e.getMessage.contains("PLAN_VALIDATION_FAILED"), e.getMessage)
    // Semantics adjudication: with the offending rule excluded, the
    // crash shape executes and AGREES with the reference interpreter —
    // the mirror of round 12's DuckDB disable_optimizer adjudication.
    // The shape is pinned as an EXPLICIT Plan AST (the grammar's own
    // rendering of the minimal repro), not by seed: grammar revisions
    // remap every seed, but the adjudicated bug is about the SHAPE
    // (originally surfaced by sweep seeds 648/1153 of the second
    // round-13 revision).
    import Fuzz._
    val idProj = Project(Scan("supplier"), Seq(
      "s_suppkey" -> (Col("s_suppkey", LongT): Expr),
      "s_name" -> (Col("s_name", StringT): Expr)))
    val crashShape = Rollup(
      UnionAll(idProj, Filter(idProj, Cmp(">", Col("s_suppkey", LongT), LitL(10L)))),
      Seq(Col("s_suppkey", LongT), Col("s_name", StringT)),
      Seq("m" -> MaxA(Col("s_suppkey", LongT))), "9", cube = false)
    val e2 = intercept[Exception](toDF(crashShape, spark, sfDir).collect())
    assert(e2.getMessage.contains("PLAN_VALIDATION_FAILED"), e2.getMessage)
    val key = "spark.sql.optimizer.excludedRules"
    spark.conf.set(key,
      "org.apache.spark.sql.catalyst.optimizer.RemoveRedundantAliases")
    try assert(check(crashShape).isEmpty,
      "crash shape differs under rule exclusion")
    finally spark.conf.unset(key)
  }

  test("adjudicated Spark 4.1.2 optimizer bug: EliminateSorts breaks LIMIT under a decorrelated SELECT-list scalar") {
    // Rev 9's first three-way sweep caught the collection's first
    // WRONG-RESULTS engine bug (the two prior Spark pins are crashes):
    // seed 260@r9's literal SQL returns five rows that are NOT the
    // ordered prefix of its `ORDER BY … LIMIT 5 OFFSET 3` subquery.
    // Hand-minimized trigger: a correlated scalar subquery in the
    // SELECT list over a sort-limited derived table.
    // `RewriteCorrelatedScalarSubquery` decorrelates the scalar into
    // an aggregate + left outer join, after which `EliminateSorts`
    // removes the subquery's Sort even though the Limit still depends
    // on it — the limit then keeps arbitrary rows. Boundary (probed
    // by hand): predicate-position subqueries (IN / NOT IN / EXISTS /
    // scalar-compared in WHERE) do NOT trigger it; a Filter barrier
    // between the scalar and the sort-limit blocks it; interleaving
    // projections do not. Adjudication: the DataFrame rendering,
    // DuckDB, and the reference interpreter all agree on the ANSI
    // answer, and excluding EliminateSorts restores that answer on
    // the SQL frontend — pinned fixed-on-upgrade here (when this
    // test's divergence half FAILS, Spark fixed it: remove this pin
    // and the three-way's corrScalarOverSortLimit adjudication).
    Fuzz.catalog.keys.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    val buggy = """SELECT co.l_orderkey, (SELECT COUNT(*) FROM nation cs
      WHERE cs.n_regionkey = co.l_suppkey) AS s
      FROM (SELECT l_orderkey, l_suppkey FROM lineitem
            ORDER BY l_orderkey, l_suppkey, l_partkey, l_linenumber
            LIMIT 5) co"""
    def keys(sql: String): Seq[Long] =
      spark.sql(sql).collect().map(_.getLong(0)).sorted.toSeq
    // the correct ordered prefix, via the subquery alone (a plain
    // TopK — EliminateSorts leaves it intact)
    val correct = keys("""SELECT l_orderkey FROM lineitem
      ORDER BY l_orderkey, l_suppkey, l_partkey, l_linenumber LIMIT 5""")
    assert(keys(buggy) != correct,
      "FIXED ON UPGRADE: spark.sql now returns the ordered prefix — " +
        "remove this pin and the three-way corrScalarOverSortLimit guard")
    val key = "spark.sql.optimizer.excludedRules"
    spark.conf.set(key,
      "org.apache.spark.sql.catalyst.optimizer.EliminateSorts")
    try assert(keys(buggy) == correct,
      "rule exclusion must restore the ANSI answer")
    finally spark.conf.unset(key)
  }
}
