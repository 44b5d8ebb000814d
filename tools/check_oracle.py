#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — not part
of the shipped library).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check_oracle.py <sfDir> <outDir> [name-substring ...]

Optional trailing args restrict the check to queries whose name contains
any of the given substrings (e.g. `pl_ dd_winnow`) — the full sweep at
sf0.1 spends many DuckDB-minutes on the O(n²) pair replays.

For each query parquet in <outDir>, runs the matching oracle SQL from
oracle_sql.json in DuckDB over the same sf tables, then compares:
  - schema (column names, sorted)
  - row count
  - value hash: columns sorted by name, rows sorted by all columns,
    everything stringified (floats via repr of float64).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    def cell(v):
        if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, bytes):
            return v.hex()
        return str(v)
    out = df.apply(lambda c: c.map(cell))
    # force object dtype: an EMPTY frame keeps its source dtypes through
    # the map, and pandas units differ between readers (Spark parquet →
    # datetime64[ns], DuckDB fetchdf → datetime64[us]) — a dtype-only
    # artifact, not a value difference
    out = out.astype(object)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    if only:
        names = [n for n in names if any(s in n for s in only)]
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            n_rowsonly += 1
            print(f"{status:18} {name:28} rows={len(got)}")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{'ORACLE-ERR':18} {name:28} {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"{'SCHEMA-MISMATCH':18} {name:28} got={list(g.columns)} exp={list(e.columns)}")
            n_fail += 1
        elif len(g) != len(e):
            print(f"{'ROWCOUNT':18} {name:28} got={len(g)} exp={len(e)}")
            n_fail += 1
        elif not g.equals(e):
            diff = (g != e).any(axis=1)
            if len(diff) == 0 or not diff.any():
                # zero rows (or zero differing cells) but equals() False:
                # a dtype-only divergence — report it instead of crashing
                print(f"{'DTYPE-MISMATCH':18} {name:28} "
                      f"got={dict(g.dtypes.astype(str))} "
                      f"exp={dict(e.dtypes.astype(str))}")
            else:
                i = diff.idxmax()
                print(f"{'VALUE-MISMATCH':18} {name:28} first diff row {i}:")
                print("  got:", g.iloc[i].to_dict())
                print("  exp:", e.iloc[i].to_dict())
            n_fail += 1
        else:
            print(f"{'PASS':18} {name:28} rows={len(g)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
