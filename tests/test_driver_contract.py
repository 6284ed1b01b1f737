"""Driver-contract guardrails: entry() must keep producing rows with a
stable schema, and every query must keep its DuckDB oracle (the driver
records rows-only checks for unoracled queries — we don't ship any)."""

from __future__ import annotations

import __spark_entry__ as em

ENTRY_SCHEMA = ["url", "lang", "doc_kind", "action", "extracted_text",
                "page_count", "token_count", "block_count",
                "parse_warnings", "low_coverage", "bytes_in", "seconds"]


def test_every_query_has_an_oracle():
    qs = em.queries()
    oracles = em.oracle_sql()
    assert set(qs) == set(oracles)
    assert len(qs) >= 47


def test_entry_rows_and_schema(spark):
    df = em.entry(spark)
    assert [f.name for f in df.schema.fields] == ENTRY_SCHEMA
    assert df.count() > 0
    actions = {r["action"] for r in df.select("action").distinct().collect()}
    assert "extracted" in actions
