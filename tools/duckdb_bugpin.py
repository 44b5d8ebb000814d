#!/usr/bin/env python3
"""Dev tool: pin of an adjudicated DuckDB 1.0.0 wrong-result optimizer
bug the round-13 fuzz grammar revision caught (the third engine-bug
adjudication after round 12's DuckDB HUGEINT widening and Spark 4.1.2's
RemoveRedundantAliases crash).

Shape: a Filter over a UNION ALL of grouped aggregates, where the
predicate pairs an equality with a NEGATED inequality over the same
column pair —

    WITH g AS (SELECT k, MIN(k) m FROM t GROUP BY k)
    SELECT * FROM ((SELECT * FROM g) UNION ALL (SELECT * FROM g WHERE ...)) u
    WHERE m = k AND NOT (m >= k)

The predicate is unsatisfiable (= TRUE implies >= TRUE), yet DuckDB
1.0.0's optimizer returns every m = k row: the NOT(...) conjunct is
dropped (equality propagation + negation pushdown interact badly across
the union boundary). `PRAGMA disable_optimizer` returns the correct
empty set, and both Spark and the in-repo reference interpreter agree
with the empty set — adjudication: oracle-engine bug, not a renderer or
engine-under-test defect. Surfaced by fuzz seed 27 of the third
round-13 grammar revision (shape U(U(A,F(A)),F(U(A,F(A)))) on region).

Run: python3 tools/duckdb_bugpin.py
Prints BUG-PRESENT while the installed DuckDB is affected. When a
DuckDB upgrade fixes it, this prints BUG-FIXED — then remove this pin
and re-admit such seeds to the declared set.
"""
import duckdb

con = duckdb.connect()
con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (0),(1),(2),(3),(4)) v(k)")
sql = """
WITH g AS (SELECT k, MIN(k) m FROM t GROUP BY k)
SELECT * FROM ((SELECT * FROM g) UNION ALL (SELECT * FROM g WHERE k > 0)) u
WHERE m = k AND NOT (m >= k)
"""
rows = con.execute(sql).fetchall()
con.execute("PRAGMA disable_optimizer")
rows_noopt = con.execute(sql).fetchall()
print(f"duckdb {duckdb.__version__}: optimized={len(rows)} rows, "
      f"unoptimized={len(rows_noopt)} rows (correct answer: 0)")
assert rows_noopt == [], "disable_optimizer no longer returns the correct empty set?!"
print("BUG-PRESENT" if rows else "BUG-FIXED — remove this pin")

# ---------------------------------------------------------------------------
# Bug 2 (round-13 fourth grammar revision, sweep seed 734): the optimizer
# THROWS "Invalid Input Error: Type mismatch for SET OPERATION" on a
# `col NOT IN (literals…, NULL)` filter over a FROM-subquery wrapping a
# UNION ALL whose first operand carries ORDER BY … LIMIT 1 OFFSET 100000
# (over a 17-column lineitem⋈orders projection with CASE-NULL-injected
# DECIMAL/TIMESTAMP columns — a narrower repro does not trip it).
# `PRAGMA disable_optimizer` runs the identical text and returns the
# correct empty result, agreeing with Spark and the reference
# interpreter — an optimizer-phase binder crash, not a renderer defect.
# The full rendered SQL is pinned in duckdb_bugpin_setop.sql; it needs
# the sf0.001 testdata tables — pass the sf dir as argv[1] or
# GRAFT_SF_DIR (default matches this box's layout, like the Scala
# specs' sfDir default).
import os
import sys
sf_dir = (sys.argv[1] if len(sys.argv) > 1
          else os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001"))
sql2 = open(os.path.join(os.path.dirname(__file__),
                         "duckdb_bugpin_setop.sql")).read()
con2 = duckdb.connect()
for t in ["lineitem", "orders"]:
    con2.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                 f"'{os.path.join(sf_dir, t)}.parquet'")
try:
    n = len(con2.execute(sql2).fetchall())
    print(f"setop pin: optimizer ran, {n} rows — BUG-FIXED, remove this pin")
except Exception as e:
    assert "Type mismatch for SET OPERATION" in str(e), e
    con2.execute("PRAGMA disable_optimizer")
    assert con2.execute(sql2).fetchall() == [], \
        "disable_optimizer no longer returns the Spark-agreeing empty set?!"
    print("setop pin: BUG-PRESENT (optimizer throws; no-opt agrees with Spark)")

# ---------------------------------------------------------------------------
# Bug 3 (round-15 NINTH grammar revision — correlated [NOT] IN — sweep
# seed 831): correlated NOT IN drops EVERY row when the correlation key
# inside the derived table is a CASE/CAST EXPRESSION and the subquery's
# value column is NULL-bearing. ANSI: a row whose correlated slice is
# EMPTY must be KEPT (NOT IN over the empty set is TRUE); DuckDB 1.0.0
# instead applies the "subquery contains a NULL => UNKNOWN" rule
# GLOBALLY, as if every row's slice were the whole subquery. A bare
# column key (or k+0) answers correctly — only CASE/CAST keys trip it,
# which is exactly the fuzz grammar's null-injected subKey shape.
# Unlike bugs 1-2 this is NOT an optimizer defect: PRAGMA
# disable_optimizer returns the same wrong empty set (binder-level).
# Adjudication is four-route: Spark's DataFrame rendering and the
# reference interpreter agree on the ANSI answer; DuckDB ITSELF agrees
# on the semantically identical bare-column-key control AND on the
# hand-decorrelated EXISTS 3VL spelling of the same query; only the
# literal expression-keyed NOT IN diverges.
con3 = duckdb.connect()
con3.execute("CREATE TABLE t3 AS SELECT range::BIGINT AS x FROM range(10)")
con3.execute("CREATE TABLE s3 AS SELECT range::BIGINT AS k FROM range(2)")
# x=0,1: slice={NULL} -> UNKNOWN -> drop; x=2..9: slice EMPTY -> keep = 8
buggy = ("SELECT COUNT(*) FROM t3 co WHERE co.x NOT IN "
         "(SELECT v FROM (SELECT CASE WHEN k >= 0 THEN k END AS k, "
         "CAST(NULL AS BIGINT) AS v FROM s3) s WHERE s.k = co.x)")
control = ("SELECT COUNT(*) FROM t3 co WHERE co.x NOT IN "
           "(SELECT v FROM (SELECT k, CAST(NULL AS BIGINT) AS v FROM s3) s "
           "WHERE s.k = co.x)")
exists3vl = ("SELECT COUNT(*) FROM t3 co WHERE "
             "NOT EXISTS (SELECT 1 FROM (SELECT CASE WHEN k >= 0 THEN k END AS k "
             "FROM s3) s WHERE s.k = co.x) "
             "OR (co.x IS NOT NULL AND NOT EXISTS (SELECT 1 FROM "
             "(SELECT CASE WHEN k >= 0 THEN k END AS k, CAST(NULL AS BIGINT) AS v "
             "FROM s3) s WHERE s.k = co.x AND (s.v = co.x OR s.v IS NULL)))")
n_buggy = con3.execute(buggy).fetchall()[0][0]
n_control = con3.execute(control).fetchall()[0][0]
n_exists = con3.execute(exists3vl).fetchall()[0][0]
print(f"corr-NOT-IN pin: expr-key={n_buggy} bare-key-control={n_control} "
      f"exists-3vl={n_exists} (ANSI answer: 8)")
assert n_control == 8, "bare-column control no longer ANSI?!"
assert n_exists == 8, "EXISTS 3VL spelling no longer ANSI?!"
print("corr-NOT-IN pin: " +
      ("BUG-PRESENT" if n_buggy != 8 else "BUG-FIXED — remove this pin"))

# ---------------------------------------------------------------------------
# Bug 4 (round-15 TENTH grammar revision sweep, seed 479 — which drew
# STACKED rev-9 correlated NOT INs): the ROOT CAUSE generalizing bug 3.
# DuckDB 1.0.0's NAIVE correlated NOT IN path applies "some slice
# contains NULL => UNKNOWN" GLOBALLY: one outer row with a NULL-bearing
# slice drops EVERY row, including rows whose own correlated slice is
# EMPTY (ANSI: empty slice => NOT IN is TRUE => keep). The optimizer's
# rewrite REPAIRS some shapes (bug 3's "bare-key control answers
# correctly" was such a repaired shape — and probe (b) below shows the
# same query right with the optimizer and wrong under PRAGMA
# disable_optimizer), but with a multi-column outer relation the
# optimizer leaves the naive plan and the wrong answer surfaces with
# the optimizer ON — probe (a). Adjudication: Spark's DataFrame
# rendering and the reference interpreter agree on the ANSI answer
# (FuzzCheckOne seed 479@r10 AGREE rows=14), and DuckDB ITSELF agrees
# through the hand-expanded NOT EXISTS 3VL spelling of the identical
# query; only the literal correlated NOT IN diverges.
con4 = duckdb.connect()
con4.execute("CREATE TABLE ti AS SELECT * FROM (VALUES "
             "(0::BIGINT,0::BIGINT),(2,0),(4,0),(NULL,1)) v(x,y)")
con4.execute("CREATE TABLE t4 AS SELECT * FROM (VALUES "
             "(0::BIGINT,0::BIGINT),(1,1)) v(x,y)")
# slices: x=0 -> {NULL} (UNKNOWN, drop); x=2,4,NULL -> EMPTY (keep) => 3
probe_a = ("SELECT COUNT(*) FROM ti co WHERE co.x NOT IN "
           "(SELECT s.v FROM (SELECT (CASE WHEN y % 5 = 2 THEN NULL ELSE y END) AS k, "
           "(CASE WHEN y % 2 = 0 THEN NULL ELSE y END) AS v "
           "FROM t4 WHERE y = x) s WHERE s.k = co.x)")
ctrl_a = ("SELECT COUNT(*) FROM ti co WHERE NOT EXISTS "
          "(SELECT 1 FROM (SELECT (CASE WHEN y % 5 = 2 THEN NULL ELSE y END) AS k, "
          "(CASE WHEN y % 2 = 0 THEN NULL ELSE y END) AS v "
          "FROM t4 WHERE y = x) s WHERE s.k = co.x "
          "AND (s.v = co.x OR s.v IS NULL OR co.x IS NULL))")
n_a = con4.execute(probe_a).fetchall()[0][0]
n_ctrl = con4.execute(ctrl_a).fetchall()[0][0]
# probe (b): single-column outer — optimizer repairs it; the naive path
# underneath is still wrong (the root cause, visible via disable_optimizer)
con4.execute("CREATE TABLE ti1 AS SELECT * FROM (VALUES "
             "(0::BIGINT),(2),(4),(NULL)) v(x)")
con4.execute("CREATE TABLE t1 AS SELECT * FROM (VALUES "
             "(0::BIGINT),(1)) v(y)")
probe_b = ("SELECT COUNT(*) FROM ti1 co WHERE co.x NOT IN "
           "(SELECT s.v FROM (SELECT y AS k, "
           "(CASE WHEN y % 2 = 0 THEN NULL ELSE y END) AS v FROM t1) s "
           "WHERE s.k = co.x)")
n_b_opt = con4.execute(probe_b).fetchall()[0][0]
con4.execute("PRAGMA disable_optimizer")
n_b_noopt = con4.execute(probe_b).fetchall()[0][0]
print(f"stacked/naive corr-NOT-IN pin: multi-col-outer={n_a} "
      f"exists-3vl-control={n_ctrl} single-col opt={n_b_opt} "
      f"no-opt={n_b_noopt} (ANSI answer: 3 everywhere)")
assert n_ctrl == 3, "EXISTS 3VL control no longer ANSI?!"
present = n_a != 3 or n_b_noopt != 3
print("stacked/naive corr-NOT-IN pin: " +
      ("BUG-PRESENT" if present else "BUG-FIXED — remove this pin"))
