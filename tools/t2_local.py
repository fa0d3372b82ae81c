#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query
dumped by graft.Verify, run the corresponding oracle SQL in DuckDB over
the same parquet tables and compare values exactly.

Usage: python3 tools/t2_local.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    # ScaleUp outputs carry events.ts as raw epoch-nanos BIGINT (Spark
    # cannot write TIMESTAMP(NANOS) back); mirror Tables.events's
    # nanos->micros floor so the oracles see the same TIMESTAMP the
    # driver fixtures expose natively.
    ts_type = [
        r for r in con.execute("DESCRIBE events").fetchall() if r[0] == "ts"
    ][0][1]
    if ts_type == "BIGINT":
        con.execute("DROP VIEW events")
        con.execute(
            "CREATE VIEW events AS SELECT * REPLACE"
            f" (make_timestamp(ts // 1000) AS ts) FROM '{sf_dir}/events.parquet'"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            expect = norm(con.execute(sql).fetchdf())
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        try:
            got = norm(
                con.execute(
                    f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
                ).fetchdf()
            )
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        if list(got.columns) != list(expect.columns):
            failures.append(
                (name, f"columns differ: spark={list(got.columns)} oracle={list(expect.columns)}")
            )
            continue
        if len(got) != len(expect):
            failures.append((name, f"row count differ: spark={len(got)} oracle={len(expect)}"))
            continue
        dtype_diff = [
            (c, str(got[c].dtype), str(expect[c].dtype))
            for c in got.columns
            if str(got[c].dtype) != str(expect[c].dtype)
        ]
        bad_cols = []
        for c in got.columns:
            a, b = got[c], expect[c]
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                bad_cols.append(f"{c} (first diff row {i}: {a[i]!r} vs {b[i]!r})")
        if bad_cols:
            failures.append((name, "value mismatch: " + "; ".join(bad_cols)))
        else:
            note = f" [dtype diff: {dtype_diff}]" if dtype_diff else ""
            print(f"PASS {name} ({len(got)} rows){note}")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} oracle queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
