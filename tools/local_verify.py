#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs the DuckDB oracle.

Mimics the driver's gate: run graft.Verify (done separately via sbt), then
for each query output parquet, run the matching oracle SQL in DuckDB over
views named after the testdata tables, sort columns by name, sort rows, and
compare cell values exactly.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got = normalize(got_rel.fetchall(), got_rel.columns)
            exp_rel = con.sql(sql)
            exp = normalize(exp_rel.fetchall(), exp_rel.columns)
            gcols = sorted(c.lower() for c in got_rel.columns)
            ecols = sorted(c.lower() for c in exp_rel.columns)
            if gcols != ecols:
                print(f"FAIL {name}: columns {gcols} != {ecols}")
                failures += 1
            elif got != exp:
                diff_a = [r for r in exp if r not in set(got)][:3]
                diff_b = [r for r in got if r not in set(exp)][:3]
                print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}"
                      f"\n  oracle-only: {diff_a}\n  spark-only:  {diff_b}")
                failures += 1
            else:
                print(f"ok   {name} ({len(got)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}")
            failures += 1
    # queries without oracle: rows-only check
    import os
    import glob
    for name in sorted(os.listdir(out_dir)):
        p = f"{out_dir}/{name}"
        if os.path.isdir(p) and name not in oracle:
            try:
                n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                print(f"rows {name}: {n}{'' if n > 0 else '  (EMPTY!)'}")
                if n == 0:
                    failures += 1
            except Exception as e:  # noqa: BLE001
                print(f"ERR  {name}: {e}")
                failures += 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
