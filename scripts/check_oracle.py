#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB with the testdata tables registered as
views, and compares row count, column names, and values.
"""
import json, math, os, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return repr(v)


def frame_rows(df):
    cols = sorted(df.columns)
    return [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)], cols


def main(sf_dir, out_dir):
    con = duckdb.connect()
    # oracle-side thread variation for the invariance sweep: DuckDB's
    # parallel aggregation must not change any hash-compared value
    threads = os.environ.get("DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = Path(out_dir, name)
        if not pdir.exists():
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            spark_df = pds.dataset(str(pdir), format="parquet").to_table().to_pandas()
            duck_df = con.execute(sql).df()
            # DuckDB promotes SUM(BIGINT/INT) to HUGEINT; the driver's hash
            # normalizes HUGEINT differently from Spark's int64, so an
            # uncast SUM in an oracle fails the real gate even when values
            # match here. Treat it as a failure locally too.
            wide = [r[0] for r in con.execute(f"DESCRIBE ({sql})").fetchall()
                    if r[1] in ("HUGEINT", "UHUGEINT")]
            if wide:
                print(f"FAIL {name}: oracle columns {wide} are HUGEINT — "
                      f"wrap in CAST(... AS BIGINT)")
                n_fail += 1;  continue
        except Exception as e:
            print(f"FAIL {name}: {e}");  n_fail += 1;  continue
        srows, scols = frame_rows(spark_df)
        drows, dcols = frame_rows(duck_df)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}");  n_fail += 1;  continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}");  n_fail += 1;  continue
        if srows != drows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
            print(f"FAIL {name}: value mismatch at row {bad}\n  cols : {dcols}\n  spark: {srows[bad]}\n  duck : {drows[bad]}")
            n_fail += 1;  continue
        print(f"PASS {name} ({len(srows)} rows)");  n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
