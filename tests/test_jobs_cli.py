"""spark-submit entry point: CLI contract."""

from __future__ import annotations

import json
import subprocess
import sys


def test_jobs_cli_synthetic(tmp_path):
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    proc = subprocess.run(
        [sys.executable, "-m", "pdf_ocr_batch_ndrocr_lite_spark.jobs",
         "--synthetic-docs", "120", "--output", str(out),
         "--checkpoint", str(ckpt), "--master", "local[4]",
         "--num-buckets", "8"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    totals = json.loads(proc.stdout.strip().splitlines()[-1])
    assert totals["docs"] == 120
    assert totals["extracted"] > 0
    assert (out / "_SUCCESS").exists() or any(out.iterdir())


def test_jobs_cli_bad_args():
    proc = subprocess.run(
        [sys.executable, "-m", "pdf_ocr_batch_ndrocr_lite_spark.jobs",
         "--output", "/tmp/x"],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert proc.returncode != 0
    assert "required" in proc.stderr.lower() or "error" in proc.stderr.lower()
