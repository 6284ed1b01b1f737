"""Self-contained slice of the driver's correctness gate: a fast subset of
__spark_entry__ queries compared against their DuckDB oracles at sf0.001.
(The full 30-query run lives in tests/tools/check_oracles.py at sf0.01.)"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SUBSET = ["q01_pricing_rollup", "q04_first_wins_dedup", "q09_split_stats",
          "q11_dedup_exact", "q15_ann_topk", "q17_lang_id",
          "q19_token_counts", "q25_priority_merge", "q28_cube_metrics"]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.10g}"
    return str(v)


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ([cols[i] for i in order],
            sorted(tuple(_norm(r[i]) for i in order) for r in rows))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    scols, svals = _multiset(sdf.columns,
                             [tuple(r) for r in sdf.collect()])
    res = duck.execute(entrymod.oracle_sql()[name])
    ocols, ovals = _multiset([d[0] for d in res.description], res.fetchall())
    assert scols == ocols
    assert len(svals) == len(ovals)
    assert svals == ovals
