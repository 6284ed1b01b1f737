"""Relational page→document assembly (SURVEY §2.4 A9, exploded-row form).

The dispatcher serializes whole documents in one pass (pages never split
across batches, so byte identity is trivially preserved).  When pages ARE
separate rows — e.g. page-parallel OCR where each page lands independently
— the assembly becomes relational:

    (url, page_index, page_text)
      → groupBy(url)
      → array_sort(collect_list(struct(page_index, page_text)))
      → filter empties, concat_ws(page joiner)

array_sort on (page_index, …) structs gives deterministic page order
without a window; the concat mirrors textops.serialize_document exactly
(verified by the equivalence test).  One shuffle on url; partial
aggregation applies to collect_list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textops import PAGE_JOINER


def assemble_documents(page_rows: DataFrame, url_col: str = "url",
                       index_col: str = "page_index",
                       text_col: str = "page_text") -> DataFrame:
    """(url, extracted_text) from per-page text rows, reference page order
    and joiner semantics."""
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(index_col).alias("i"),
                                F.col(text_col).alias("t"))))
    non_empty = F.filter(ordered, lambda s: s["t"] != "")
    return page_rows.groupBy(url_col).agg(
        F.array_join(F.transform(non_empty, lambda s: s["t"]),
                     PAGE_JOINER).alias("extracted_text"),
    )
