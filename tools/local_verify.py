#!/usr/bin/env python3
"""Local oracle spot-check, mirroring the driver's correctness gate.

Runs graft.Verify for a subset of queries (or all with no names), then
compares each result parquet against its DuckDB oracle on the same
tables: row count, column names (sorted, as the driver sorts before
hashing), and cell-exact values after ordering by every column.

Usage: python3 tools/local_verify.py <sfdir> [query ...]
"""
import sys, json, os, subprocess
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Oracle-less queries whose result can be legitimately empty on a given
# dataset (e.g. a near-dup drop list when the data has no near-dups) —
# zero rows is not a failure for these, only for queries expected to
# emit per-doc / per-group rows unconditionally.
ALLOW_EMPTY = {"q_minhash_pairs", "q_simhash_near_dups", "q_neardup_clusters",
               "q_winnow_matches"}


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    queries = sys.argv[2:]
    out = "/tmp/local_verify"
    cmd = ["sbt", "-batch", f"runMain graft.Verify {sf} {out} " + " ".join(queries)]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):  # Spark directory-style table
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    names = queries if queries else sorted(oracle.keys())
    for name in names:
        if not os.path.isdir(f"{out}/{name}"):
            print(f"{name}: NO RESULT DIR")
            failures += 1
            continue
        if name not in oracle:
            n = con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{out}/{name}/*.parquet')"
            ).fetchone()[0]
            ok = n > 0 or name in ALLOW_EMPTY
            status = "rows-only OK" if ok else "rows-only EMPTY"
            print(f"{name}: {status} ({n} rows)")
            failures += 0 if ok else 1
            continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        try:
            ora_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR {e}")
            failures += 1
            continue
        s_cols, o_cols = sorted(spark_rel.columns), sorted(ora_rel.columns)
        if s_cols != o_cols:
            print(f"{name}: SCHEMA MISMATCH spark={s_cols} oracle={o_cols}")
            failures += 1
            continue
        collist = ", ".join(f'"{c}"' for c in s_cols)
        s_rows = con.execute(
            f"SELECT {collist} FROM spark_rel ORDER BY {collist}").fetchall()
        o_rows = con.execute(
            f"SELECT {collist} FROM ora_rel ORDER BY {collist}").fetchall()
        if len(s_rows) != len(o_rows):
            print(f"{name}: ROW COUNT {len(s_rows)} vs {len(o_rows)}")
            failures += 1
        elif s_rows != o_rows:
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
            print(f"{name}: VALUE MISMATCH {len(diffs)}/{len(s_rows)} rows, "
                  f"first: spark={diffs[0][0]} oracle={diffs[0][1]}")
            failures += 1
        else:
            print(f"{name}: OK ({len(s_rows)} rows)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
