from __future__ import annotations

import pytest

from pdf_ocr_batch_ndrocr_lite_spark.plans.pipeline import build_session


@pytest.fixture(scope="session")
def spark():
    session = build_session(app_name="tests", master="local[4]",
                            shuffle_partitions=8)
    yield session
    session.stop()
