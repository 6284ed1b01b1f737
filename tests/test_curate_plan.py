"""End-to-end corpus-curation plan: the composed cascade must drop
exactly what the standalone operators say, carry honest stage counts,
and run through the CLI."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pdf_ocr_batch_ndrocr_lite_spark.plans.curate import run_curation


def _corpus(spark):
    good = ("the quick brown fox jumps over the lazy dog and runs for "
            "the hills where the other animals live in the open") * 2
    rows = [
        (0, "en", good),                      # kept
        (1, "en", good),                      # exact dup of 0 → verdict
        (2, "en", good + " tail variation"),  # near-dup of 0 → LSH drop
        (3, "en", "zz qq ww"),                # lang unknown → verdict
        (4, "en", good.replace("quick", "clever")),  # near-dup of 0
        (5, "en", ("completely different prose about the sea and the "
                   "ships that sail upon it for days and days on end "
                   "with the wind in the sails and the stars to steer")),
    ]
    return spark.createDataFrame(rows, "doc_id int, lang string, text string")


def test_run_curation_cascade_counts(spark):
    docs = _corpus(spark)
    kept, counts = run_curation(docs, jaccard_threshold=0.5, max_df=None)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 1 exact-dup and 3 lang-unknown die in the verdict; 2 and 4 are
    # near-dups of 0 (higher ids lose); 0 and 5 survive
    assert ids == [0, 5]
    assert counts["input"] == 6
    assert counts["after_verdict"] == 4       # 0, 2, 4, 5
    assert counts["after_near_dup"] == 2      # 0, 5
    assert counts["kept"] == 2


def test_run_curation_decontam_and_mixing(spark):
    docs = _corpus(spark)
    bench = docs.filter(F.col("doc_id") == 5)  # "eval set" = doc 5's text
    kept, counts = run_curation(docs, jaccard_threshold=0.5, max_df=None,
                                bench=bench, min_overlap=2,
                                mix_rates={"en": 1.0}, default_rate=0.0)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0]  # 5 is contaminated (it IS the benchmark)
    assert counts["after_decontam"] == 1
    assert counts["after_mixing"] == 1  # en rate 1.0 keeps everything left


def test_curate_cli_smoke(tmp_path):
    import subprocess
    import sys
    out = tmp_path / "kept"
    proc = subprocess.run(
        [sys.executable, "-m", "pdf_ocr_batch_ndrocr_lite_spark.jobs",
         "--curate", "--synthetic-docs", "300",
         # the synthetic word pool (frozen by the golden fixtures) has no
         # stopwords, so the default lang/quality gates would kill every
         # doc — the smoke verifies the cascade PLUMBING, so relax both
         # and let exact-dup/repetition/mixing do the work
         "--keep-unknown-lang", "--min-quality", "0.0",
         "--mix-rates", '{"en": 1.0, "de": 1.0, "ja": 1.0}',
         "--default-rate", "1.0",
         "--output", str(out)],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    counts = json.loads(line)
    assert counts["input"] == 300
    assert 0 < counts["kept"] <= counts["after_verdict"] <= 300


def test_run_curation_stage_barrier_executes_stages_once(spark, tmp_path):
    """With scratch_dir, every stage boundary is a parquet barrier: the
    returned frame's plan is a bare scan of the LAST stage's parquet —
    no verdict projection, no LSH joins, no window — so the final write
    and any later action re-execute NOTHING upstream; stage counts and
    the kept set are identical to the barrier-less run."""
    docs = _corpus(spark)
    kept_b, counts_b = run_curation(docs, jaccard_threshold=0.5,
                                    max_df=None,
                                    scratch_dir=str(tmp_path / "scr"))
    plan = kept_b._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan         # reads the materialized stage
    for node in ("Join", "Window", "Aggregate", "Exchange"):
        assert node not in plan, f"barriered plan re-executes a {node}"
    # stage outputs are materialized once per stage under the scratch dir
    names = {p.name for p in (tmp_path / "scr").iterdir()}
    assert names == {"stage1_verdict", "stage2_near_dup"}
    kept_p, counts_p = run_curation(docs, jaccard_threshold=0.5,
                                    max_df=None)
    assert sorted(r["doc_id"] for r in kept_b.collect()) == \
        sorted(r["doc_id"] for r in kept_p.collect()) == [0, 5]
    assert counts_b == counts_p


def test_run_curation_boilerplate_null_text_survives_to_verdict(spark):
    """A NULL-text doc yields no line rows in the pre-pass rebuild; the
    left-join+coalesce must carry it through to the verdict stage (where
    it gets an explicit drop) instead of silently vanishing from the
    corpus before any stage sees it."""
    nav = "shared navigation chrome line"
    good = ("the quick brown fox jumps over the lazy dog and runs for "
            "the hills where the other animals live in the open")
    rows = [(i, "en", nav + "\n" + good + f" variant {i}") for i in range(4)]
    rows.append((8, "en", None))              # NULL text
    docs = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    kept, counts = run_curation(docs, boilerplate_max_df=2, near_dup=False)
    assert counts["input"] == 5
    # the NULL doc reached the verdict (and was dropped THERE, by the
    # quality gate) — after_verdict counts only the 4 real docs
    assert counts["after_verdict"] == 4
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2, 3]


def test_run_curation_boilerplate_prepass(spark):
    """The line-level pre-pass strips corpus-wide chrome BEFORE doc-level
    signals: the shared navigation line appears in 4 docs (> max_df 2) and
    must be gone from every survivor's text; stage counts record the
    volume removed."""
    nav = "shared navigation chrome line"
    good = ("the quick brown fox jumps over the lazy dog and runs for "
            "the hills where the other animals live in the open")
    rows = [(i, "en", nav + "\n" + good + f" variant {i}") for i in range(4)]
    rows.append((9, "en", good + " standalone"))
    docs = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    kept, counts = run_curation(docs, boilerplate_max_df=2,
                                near_dup=False)
    assert counts["boiler_lines_dropped"] == 4
    for r in kept.collect():
        assert nav not in r["text"]
