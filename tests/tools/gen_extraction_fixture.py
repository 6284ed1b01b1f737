"""Freeze the flagship extraction pipeline's expected output at sf0.01 as a
committed parquet fixture, so q24 gets a real oracle row in the driver's
correctness gate (round 1 left it `no_oracle`, making the byte-identity
invariant invisible to the gate).

The per-kernel byte-identity vs the READ-ONLY reference is already locked by
the reference-derived goldens in tests/fixtures/*.json (generated once by
gen_goldens.py and asserted by 613 parity tests); this fixture locks the
end-to-end COMPOSITION of those kernels over the sf0.01 documents table.
Any regression anywhere in the chain — HTML scorer, normalization, line
grouping, serialization, action routing — flips q24's hash_match to red.

Regenerate ONLY when the sf0.01 corpus or the frozen extraction spec
changes, and only after the full parity suite is green:

    python -m pytest tests/ -q && python tests/tools/gen_extraction_fixture.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
OUT = REPO / "tests" / "fixtures" / "extraction_expected_sf001.parquet"


def main():
    import __spark_entry__ as entrymod
    from pdf_ocr_batch_ndrocr_lite_spark.plans.pipeline import build_session

    spark = build_session(app_name="gen-extraction-fixture",
                          master="local[8]", shuffle_partitions=16)
    df = entrymod.queries()["q24_extraction_pipeline"](spark, SF_DIR)
    tbl = df.toArrow()
    pq.write_table(tbl, OUT, compression="zstd")
    print(f"wrote {tbl.num_rows} rows x {tbl.num_columns} cols -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
