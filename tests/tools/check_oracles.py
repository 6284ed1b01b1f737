"""Local mimic of the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values.

    python tests/tools/check_oracles.py [query_name ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_value(v):
    if v is None:
        return "\x00NULL"  # sortable sentinel
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # full precision: catches ulp-level engine drift
    return str(v)


def df_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_value(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main(only=None):
    import __spark_entry__ as entrymod
    from pdf_ocr_batch_ndrocr_lite_spark.plans.pipeline import build_session

    spark = build_session(app_name="oracle-check", master="local[8]",
                          shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"[rows] {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error {e}")
            continue
        sc, sm = df_to_multiset(scols, [tuple(r) for r in srows])
        oc, om = df_to_multiset(ocols, orows)
        if sc != oc:
            failures.append((name, f"columns {sc} != {oc}"))
            print(f"[FAIL] {name}: columns {sc} vs {oc}")
            continue
        if len(sm) != len(om):
            failures.append((name, f"rowcount {len(sm)} != {len(om)}"))
            print(f"[FAIL] {name}: rowcount {len(sm)} vs {len(om)}")
            continue
        if sm != om:
            diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"[FAIL] {name}: values differ e.g. {diff}")
            continue
        print(f"[ OK ] {name}: {len(sm)} rows")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
