#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name>.parquet under verifyOutDir (written by graft.Verify), run
the matching SQL from oracle_sql.json in DuckDB against the same sf tables,
sort columns by name, sort rows, and compare values. Reports per-query
match/mismatch with a diff sample. Dev tooling only — the engine itself
never depends on DuckDB.
"""
import json, math, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 vs 0.0 and format stably
        if v == 0.0:
            v = 0.0
        return f"{v:.10g}"
    if v is None:
        return "NULL"
    return str(v)


def main(sf_dir, out_dir):
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # Type gate: the verification driver hashes DuckDB int128-backed
    # numerics (HUGEINT/UHUGEINT, and DECIMAL with precision > 18)
    # differently from BIGINT even at equal values (Python's fetch coerces
    # both to int, so the value compare below can't see it). Any oracle
    # producing one (e.g. an uncast SUM over integers, or a DECIMAL(38,0)
    # checksum) would be a standing driver red — fail it here, before the
    # value check masks it.
    def _int128_backed(t):
        t = t.upper()
        if "HUGEINT" in t:
            return True
        m = __import__("re").match(r"DECIMAL\((\d+)", t)
        return bool(m) and int(m.group(1)) > 18

    n_typed_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"[ERROR] {name}: DESCRIBE failed: {e}")
            n_typed_bad += 1
            continue
        bad = [(c, t) for c, t, *_ in desc if _int128_backed(t)]
        if bad:
            print(f"[TYPE ] {name}: driver-unhashable oracle columns {bad} — "
                  f"keep the fold in BIGINT (e.g. % 1000000007, then "
                  f"CAST(SUM(...) AS BIGINT))")
            n_typed_bad += 1
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_ok = 0
    for name in names:
        if name not in oracle:
            print(f"[skip ] {name}: no oracle (rows-only check)")
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[ERROR] {name}: {e}")
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL ] {name}: columns {list(got.columns)} != {list(exp.columns)}")
            continue
        g = sorted(tuple(norm(v) for v in row) for row in got.itertuples(index=False))
        e = sorted(tuple(norm(v) for v in row) for row in exp.itertuples(index=False))
        if g == e:
            n_ok += 1
            print(f"[ok   ] {name}: {len(g)} rows")
        else:
            print(f"[FAIL ] {name}: {len(g)} spark rows vs {len(e)} oracle rows")
            only_g = [r for r in g if r not in set(e)][:3]
            only_e = [r for r in e if r not in set(g)][:3]
            if only_g:
                print(f"         spark-only: {only_g}")
            if only_e:
                print(f"         oracle-only: {only_e}")
    n_checked = len([n for n in names if n in oracle])
    print(f"== {n_ok}/{n_checked} oracle-checked queries match ==")
    if n_typed_bad:
        print(f"== {n_typed_bad} oracle(s) with int128-backed columns — driver would hash-fail ==")
        sys.exit(1)
    # gate semantics for tools/triscale.sh: any mismatch is a non-zero exit
    if n_ok < n_checked:
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
