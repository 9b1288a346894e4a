#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tooling only,
not part of the library): run graft.Verify first, then this script
compares each <out>/<name> parquet against the DuckDB oracle SQL from
<out>/oracle_sql.json executed over the same testdata parquet tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        got = pq.read_table(files[0]).to_pandas()
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failures += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}")
            failures += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); failures += 1; continue
        mismatch = None
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            if gv != wv:
                for i, (a, b) in enumerate(zip(gv, wv)):
                    if a != b and not (a is None and b is None) \
                       and str(a) != str(b):
                        mismatch = (c, i, a, b); break
                if mismatch: break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duckdb={b!r}")
            failures += 1; continue
        # dtype-kind strictness: the driver's hash fails on
        # int-vs-float drift (e.g. DuckDB SUM(BIGINT) -> HUGEINT read
        # back as float64 — the r5 q73/q77 bug) even when values
        # compare equal here; integer WIDTH differences (int32 vs
        # int64) are fine (r5-green q14/q15/q26/q39 have them).
        def kind(d):
            return d.kind  # i/u -> int-ish, f, b, O
        dt = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
              if kind(g[c].dtype) != kind(w[c].dtype)
              and not {kind(g[c].dtype), kind(w[c].dtype)} <= {"i", "u"}]
        if dt:
            c, a, b = dt[0]
            print(f"FAIL {name}: dtype drift on {c}: spark={a} duckdb={b} "
                  f"(values equal, driver hash would still fail)")
            failures += 1
        else:
            print(f"OK   {name}: {len(g)} rows")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
