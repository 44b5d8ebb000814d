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
