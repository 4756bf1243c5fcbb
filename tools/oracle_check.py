#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB against the sfDir tables,
then compares: columns sorted by name, rows sorted by all columns, values
compared exactly (with a reported max-abs-diff for floats on mismatch).
Dev-only tool — not part of the library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {str(e)[:200]}")
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            continue
        bad = None
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                # pandas NaN for SQL NULL
                a = None if (isinstance(a, float) and math.isnan(a)) else a
                b = None if (isinstance(b, float) and math.isnan(b)) else b
                if not cmp_cell(a, b):
                    diff = ""
                    try:
                        diff = f" absdiff={abs(float(a) - float(b)):.3e}"
                    except (TypeError, ValueError):
                        pass
                    bad = f"col {c} row {i}: {a!r} vs {b!r}{diff}"
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: {bad}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(g)} rows)")
    print(f"== {n_ok}/{len(oracle)} oracle-matched")


if __name__ == "__main__":
    main()
