#!/usr/bin/env python3
"""Local mimic of the driver's t2 DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the paired oracle SQL (from oracle_sql.json) in DuckDB with views
named after the test tables, sort columns by name, and compare row
count, schema-ish (loose dtype), and exact values. Reports per-query
PASS/FAIL with the first differing cell.
"""
import sys, os, json, math, shutil
import duckdb

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # bound the oracle's memory so one expensive oracle SQL degrades to
    # a per-query error instead of the kernel OOM-killing the whole
    # sweep (lost half a run at sf0.1 with a concurrent Spark JVM)
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_CHECK_MEM', '32GB')}'")
    con.execute("SET threads TO 8")
    # per-process spill dir: two concurrent checks sharing one temp dir
    # delete each other's spill files (lost a full sf1 sweep to that)
    con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # optional name-substring filters (argv[3:]) for re-running a few
    # queries out of a full dump without re-dumping
    flt = sys.argv[3:]
    if flt:
        qdirs = [d for d in qdirs if any(f in d for f in flt)]
    n_pass = n_fail = n_rows_only = 0
    for name in qdirs:
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in got_cols) +
                f" FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ROWS-ONLY" if len(got_rows) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status} {name}: {len(got_rows)} rows")
            n_rows_only += 1
            continue
        try:
            res = con.sql(oracle[name])
            exp_cols = sorted(res.columns)
            exp_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in exp_cols) +
                f" FROM ({oracle[name]})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns differ spark={got_cols} oracle={exp_cols}")
            n_fail += 1
            continue
        # dtype parity gate (round-5 lesson): the driver's hash compare is
        # type-sensitive, so DuckDB widening (e.g. sum(BIGINT) -> HUGEINT
        # vs Spark's BIGINT) fails it even when every value is identical.
        got_types = dict(zip(got.columns, (str(t) for t in got.types)))
        exp_types = dict(zip(res.columns, (str(t) for t in res.types)))
        dt = [(c, got_types[c], exp_types[c]) for c in got_cols
              if got_types[c] != exp_types[c]]
        if dt:
            print(f"FAIL {name}: dtype drift (spark vs oracle): {dt}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: row count spark={len(got_rows)} oracle={len(exp_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            if tuple(canon(x) for x in g) != tuple(canon(x) for x in e):
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            # find differing column
            diffs = [(got_cols[j], g[j], e[j]) for j in range(len(g))
                     if canon(g[j]) != canon(e[j])]
            print(f"FAIL {name}: row {i} differs: {diffs[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got_rows)} rows")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    try:
        sys.exit(main(sys.argv[1], sys.argv[2]))
    finally:
        # the per-pid spill dir outlives a killed run otherwise, and
        # they add up across sweeps on a ~78 GB-free disk
        shutil.rmtree(f"/tmp/duckdb_spill_{os.getpid()}", ignore_errors=True)
