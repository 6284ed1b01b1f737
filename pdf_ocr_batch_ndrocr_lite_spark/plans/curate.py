"""End-to-end corpus curation plan: the training-data pass that runs
AFTER extraction (`plans.pipeline`) and BEFORE the dataloader.

Stage order follows cost (cheapest kill first) — the CCNet/Gopher/
FineWeb-style cascade assembled from the standalone operators, so every
stage's semantics stay individually oracle-checked (q50, q34, q54, q56):

1. verdict   — per-row signals fused in ONE projection + one dedup
               window exchange (`curation.curation_verdict`)
2. near-dup  — MinHash-LSH candidates → Jaccard verify → drop losers
               (`dedup.minhash_dedup`, salt-split hot buckets)
3. decontam  — drop docs sharing shingles with an eval/benchmark table
               (`mixing.benchmark_decontaminate`, broadcast bench side)
4. mixing    — deterministic per-stratum sampling to target ratios
               (`mixing.stratified_sample`, zero shuffle)

Each stage is optional; the plan returns (kept_docs, stage_counts) where
stage_counts is the lineage row a metrics sink records per run.  At
corpus scale the pass is: one scan → fused projection → dedup window
exchange → LSH exchanges over digests → broadcast semi-join → map-side
sample — document text is never shuffled after the verdict stage
restricts to survivors.

EXECUTE-ONCE CONTRACT (`scratch_dir`): each enabled stage's per-stage
count is an action, and the final write is another — without a barrier,
stage N's count re-executes stages 1..N and the write re-executes the
whole cascade again, so the verdict projection and the LSH candidate
stages run up to 4× per job.  Passing `scratch_dir` materializes every
stage boundary through the same parquet round-trip barrier
`connected_components` uses for its iteration loop: each stage's lineage
executes exactly once, the stage counts read the materialized output, and
the final frame is a plain parquet scan.  Pass shared storage (HDFS/S3)
on a real cluster — the default None keeps the zero-copy lazy plan for
callers that run one action and never look at counts-heavy lineage.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import curation as cu
from ..operators import dedup as dd
from ..operators import mixing as mx


def run_curation(docs: DataFrame,
                 id_col: str = "doc_id",
                 text_col: str = "text",
                 stratum_col: str = "lang",
                 boilerplate_max_df: Optional[int] = None,
                 boilerplate_min_chars: int = 10,
                 min_quality: float = 0.45,
                 max_top_gram_frac: float = 0.10,
                 require_lang: bool = True,
                 near_dup: bool = True,
                 jaccard_threshold: float = 0.8,
                 max_df: Optional[int] = 10_000,
                 transitive_dedup: bool = False,
                 bench: Optional[DataFrame] = None,
                 min_overlap: int = 2,
                 mix_rates: Optional[dict] = None,
                 default_rate: float = 1.0,
                 scratch_dir: Optional[str] = None):
    """Returns (kept DataFrame, counts dict).

    With ``scratch_dir`` set (see module comment) every stage executes
    exactly once and the per-stage counts are metadata-cheap parquet
    counts; without it each stage-boundary count() re-executes the
    upstream lineage — acceptable only for small corpora or
    counts-don't-matter runs.

    ``boilerplate_max_df`` enables the CCNet-style LINE-level pre-pass:
    lines present in more than that many documents are stripped from
    EVERY document before any doc-level signal is computed — chrome that
    would otherwise pollute the quality/repetition scores and the
    near-dup shingles (two boilerplate-heavy pages look like near-dups
    of each other even when their prose differs).  NULL-text documents
    pass through the pre-pass untouched (rebuilt text left-joins back
    onto the corpus), so they still receive an explicit verdict instead
    of silently vanishing before the first stage."""
    spark = docs.sparkSession

    def _barrier(df: DataFrame, name: str) -> DataFrame:
        if scratch_dir is None:
            return df
        path = f"{scratch_dir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    counts = {"input": docs.count()}

    if boilerplate_max_df is not None:
        rewritten = _barrier(
            dd.remove_boilerplate_lines(
                docs, id_col=id_col, text_col=text_col,
                max_doc_freq=boilerplate_max_df,
                min_chars=boilerplate_min_chars),
            "stage0_boilerplate")
        # left join + coalesce: docs with NULL text produce no line rows
        # in the rebuild — they must survive the pre-pass (text unchanged)
        # rather than being inner-joined out of the corpus
        repl = rewritten.select(id_col, F.col("text").alias("_rw_text"))
        docs = (docs.join(repl, id_col, "left")
                .withColumn(text_col, F.coalesce(F.col("_rw_text"),
                                                 F.col(text_col)))
                .drop("_rw_text"))
        counts["boiler_lines_dropped"] = int(
            rewritten.agg(F.sum("dropped_lines")).collect()[0][0] or 0)

    verdict = cu.curation_verdict(
        docs, id_col=id_col, text_col=text_col,
        min_quality=min_quality, max_top_gram_frac=max_top_gram_frac,
        require_lang=require_lang)
    kept = _barrier(
        docs.join(verdict.filter(F.col("keep")).select(id_col),
                  id_col, "left_semi"),
        "stage1_verdict")
    counts["after_verdict"] = kept.count()

    if near_dup:
        cc_scratch = (f"{scratch_dir}/stage2_cc"
                      if scratch_dir is not None else None)
        kept = _barrier(
            dd.minhash_dedup(
                kept, id_col=id_col, text_col=text_col,
                jaccard_threshold=jaccard_threshold, max_df=max_df,
                transitive=transitive_dedup, scratch_dir=cc_scratch),
            "stage2_near_dup")
        counts["after_near_dup"] = kept.count()

    if bench is not None:
        kept = _barrier(
            mx.benchmark_decontaminate(
                kept, bench, id_col=id_col, text_col=text_col,
                min_overlap=min_overlap),
            "stage3_decontam")
        counts["after_decontam"] = kept.count()

    if mix_rates is not None:
        kept = _barrier(
            mx.stratified_sample(
                kept, mix_rates, stratum_col=stratum_col, id_col=id_col,
                default_rate=default_rate),
            "stage4_mixing")
        counts["after_mixing"] = kept.count()

    counts["kept"] = list(counts.values())[-1]
    return kept, counts
