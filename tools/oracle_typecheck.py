#!/usr/bin/env python3
"""Sweep every oracle SQL for output types the driver's hash gate can't
match against Spark.

DuckDB widens sum(BIGINT) (aggregate AND window forms) to HUGEINT, and
arithmetic over a HUGEINT stays HUGEINT — Spark has no 128-bit integer, so
a gate whose oracle leaves such a column un-cast hash-mismatches even when
every value is identical (round-7 q11_stock_share, round-8
stream_rate_replay). This script DESCRIBEs each oracle query over the real
testdata views and fails on any column typed HUGEINT / UHUGEINT, plus any
UINTEGER/UBIGINT (also un-representable in Spark's signed schema).

Usage: python3 tools/oracle_typecheck.py <sfDir> <oracle_sql.json>
Exit 1 if any offending column is found.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD = {"HUGEINT", "UHUGEINT", "UINTEGER", "UBIGINT", "USMALLINT", "UTINYINT"}


def main(sf_dir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"ERROR {name}: {e}")
            bad += 1
            continue
        for col, typ, *_ in desc:
            base = typ.split("(")[0].upper()
            if base in BAD:
                print(f"BADTYPE {name}.{col}: {typ} "
                      f"(cast to BIGINT/DOUBLE in the oracle SQL)")
                bad += 1
    print(f"checked {len(oracle)} oracles, {bad} offending columns")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
