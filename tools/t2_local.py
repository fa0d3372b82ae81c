#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query
dumped by graft.Verify, run the corresponding oracle SQL in DuckDB over
the same parquet tables and compare values exactly.

Usage: python3 tools/t2_local.py <sfDir> <verifyOutDir> [timeoutSec]

With a timeoutSec, each oracle comparison runs in a child process under
a per-query budget; exceeding it records SKIP (oracle infeasible at
this scale — the sampled checker covers those), not FAIL. This is the
sf1 mode: the all-pairs / recursive-CTE oracles are quadratic-plus in
DuckDB while the engine's own shapes stay tractable.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Oracles INFEASIBLE ON ORACLE INFRASTRUCTURE above a known scale,
# keyed by (table, row count) at which they die (r12, VERDICT r11 #4):
# q_rouge_multi's best-match oracle spills DuckDB past the container
# disk at sf10's 500k docs (measured r11), and q_pagerank's 5-iteration
# CTE chain over the sf10 trade graph (60M lineitem) fills >70 GB of
# DuckDB spill before dying (measured r12) — infra capacity limits, not
# engine defects, so the board must show SKIP-by-rule, never FAIL (a
# FAIL row must always mean engine wrongness). Engine-independent
# coverage at that scale is tools/sampled_check.py's plain-Python
# re-derivation (rouge) and the GraphSpec exact-fixed-point laws +
# lower-sf hash matches (pagerank).
ORACLE_INFEASIBLE_ABOVE = {
    "q_rouge_multi": ("documents", 100_000),  # sf10 is 500k
    "q_pagerank": ("lineitem", 10_000_000),  # sf10 is 60M
}


def table_rows(sf_dir, table) -> int:
    """Parquet-metadata row count (no scan); 0 when the table is absent
    (partial scale dirs)."""
    try:
        con = duckdb.connect()
        return con.execute(
            f"SELECT count(*) FROM '{sf_dir}/{table}.parquet'"
        ).fetchone()[0]
    except Exception:
        return 0


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def compare_one(sf_dir, out_dir, name, sql, q):
    """Child-process body: run one oracle + compare; put result on q."""
    try:
        q.put(run_compare(sf_dir, out_dir, name, sql))
    except Exception as e:  # pragma: no cover - defensive
        q.put((name, False, f"checker crashed: {e}"))


def run_compare(sf_dir, out_dir, name, sql):
    # probe the Spark output BEFORE paying for the oracle: on a subset
    # Verify dump (the sf10 scale ledger) most oracle entries have no
    # output, and a heavy all-pairs oracle would burn its whole budget
    # producing an answer nothing compares against
    import glob
    if not glob.glob(f"{out_dir}/{name}/*.parquet"):
        # subset Verify dumps (SPARK_GRAFT_ONLY / scale-ledger runs)
        # simply didn't dump this query — SKIP, not FAIL (mirrors
        # sampled_check's have() handling)
        return (name, None, "not in this Verify dump (subset run)")
    con = connect(sf_dir)
    try:
        expect = norm(con.execute(sql).fetchdf())
    except Exception as e:
        return (name, False, f"oracle SQL failed: {e}")
    try:
        got = norm(
            con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        )
    except Exception as e:
        return (name, False, f"spark output unreadable: {e}")
    if list(got.columns) != list(expect.columns):
        return (name, False,
                f"columns differ: spark={list(got.columns)} oracle={list(expect.columns)}")
    if len(got) != len(expect):
        return (name, False, f"row count differ: spark={len(got)} oracle={len(expect)}")
    bad_cols = []
    for c in got.columns:
        a, b = got[c], expect[c]
        eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            bad_cols.append(f"{c} (first diff row {i}: {a[i]!r} vs {b[i]!r})")
    if bad_cols:
        return (name, False, "value mismatch: " + "; ".join(bad_cols))
    return (name, True, f"({len(got)} rows)")


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except Exception:
            # partial scale dirs (the sf10 probe-path subset) omit the
            # tables their queries never read; an oracle that does
            # reference one fails loudly at query time instead
            pass
    # ScaleUp outputs carry events.ts as raw epoch-nanos BIGINT (Spark
    # cannot write TIMESTAMP(NANOS) back); mirror Tables.events's
    # nanos->micros floor so the oracles see the same TIMESTAMP the
    # driver fixtures expose natively.
    try:
        ts_type = [
            r for r in con.execute("DESCRIBE events").fetchall() if r[0] == "ts"
        ][0][1]
    except Exception:
        ts_type = None
    if ts_type == "BIGINT":
        con.execute("DROP VIEW events")
        con.execute(
            "CREATE VIEW events AS SELECT * REPLACE"
            f" (make_timestamp(ts // 1000) AS ts) FROM '{sf_dir}/events.parquet'"
        )
    return con


def main(sf_dir: str, out_dir: str, timeout_sec: float | None = None) -> int:
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    skipped = []
    row_counts = {}
    for name, sql in sorted(oracle.items()):
        rule = ORACLE_INFEASIBLE_ABOVE.get(name)
        if rule is not None:
            table, limit = rule
            if table not in row_counts:
                row_counts[table] = table_rows(sf_dir, table)
            if row_counts[table] > limit:
                skipped.append(name)
                print(f"SKIP {name}: oracle infeasible on DuckDB above {limit} "
                      f"{table} rows (corpus has {row_counts[table]}); "
                      f"covered by engine-independent checks")
                continue
        if timeout_sec is None:
            name_, ok, msg = run_compare(sf_dir, out_dir, name, sql)
        else:
            import multiprocessing as mp
            q = mp.Queue()
            proc = mp.Process(target=compare_one, args=(sf_dir, out_dir, name, sql, q))
            proc.start()
            proc.join(timeout_sec)
            if proc.is_alive():
                # SIGTERM first, but a DuckDB native loop never services
                # Python signal handlers — escalate to SIGKILL or the
                # un-budgeted join below hangs the whole run on the
                # first over-budget oracle
                proc.terminate()
                proc.join(5)
                if proc.is_alive():
                    proc.kill()
                    proc.join()
                skipped.append(name)
                print(f"SKIP {name}: oracle exceeded {timeout_sec:.0f}s budget")
                continue
            name_, ok, msg = q.get()
        if ok is None:
            skipped.append(name)
            print(f"SKIP {name}: {msg}")
        elif ok:
            print(f"PASS {name} {msg}")
        else:
            failures.append((name, msg))
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    done = len(oracle) - len(failures) - len(skipped)
    extra = f" ({len(skipped)} skipped: over budget or not dumped)" if skipped else ""
    print(f"\n{done}/{len(oracle) - len(skipped)} oracle queries pass{extra}")
    return 1 if failures else 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], t))
