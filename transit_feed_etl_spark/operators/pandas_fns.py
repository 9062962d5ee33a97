"""Arrow-vectorized Python UDF surface (SURVEY.md §2 Part B "UDF / UDAF /
UDTF" row).

The engine's rule (repo north star): built-in Catalyst expressions first;
when Python is unavoidable, Arrow-batched pandas UDFs — never
row-at-a-time ``F.udf``. This module holds the pandas-UDF building
blocks; ``queries/udf_surface.py`` registers oracle-paired queries over
them so the whole Arrow boundary (schema mapping, batch shapes, null
handling) is differentially tested:

- scalar pandas_udf        : array<double> -> array<double> (numpy body)
- grouped-agg pandas_udf   : exact, order-independent UDAF ((min+max)/2)
- Python UDTF (arrow)      : 1 -> N table function (sentence splitter)

mapInPandas and applyInPandasWithState live in operators/multimodal.py
and streaming/windows.py respectively — together these cover every
Python-execution surface Spark offers.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf, udtf

# NOTE: pandas_udf()/udtf() wrappers are created lazily (factory
# functions) — the decorators resolve their return types against the
# active SparkSession, so decorating at import time would require a
# session before the registry can even be imported.


def _l2_normalize_impl(vecs: pd.Series) -> pd.Series:
    def norm_one(v):
        if v is None:
            return None
        a = np.asarray(v, dtype=np.float64)
        n = float(np.sqrt(np.dot(a, a)))
        return (a / n).tolist() if n > 0.0 else a.tolist()

    return vecs.map(norm_one)


def l2_normalize():
    """Scalar pandas_udf: vectorized L2 normalization of embedding
    arrays (numpy body). numpy's pairwise summation differs from a
    sequential fold in the last ulp, so consumers should round before
    cross-engine comparison (the paired oracle rounds to 6dp)."""
    return pandas_udf(_l2_normalize_impl, "array<double>")


def _midrange_impl(values: pd.Series) -> float:
    if values.empty:
        return None
    return (float(values.min()) + float(values.max())) / 2.0


def midrange():
    """Grouped-aggregate pandas UDAF: (min + max) / 2. Chosen because it
    is EXACT and order-independent over doubles — safe to hash-compare
    against any engine regardless of partitioning or group order."""
    return pandas_udf(_midrange_impl, "double")


def _group_count_impl(values: pd.Series) -> int:
    return int(len(values))


def group_count():
    """Counting pandas UDAF — exists because Spark disallows mixing
    group-aggregate pandas UDFs with built-in aggregates in one agg()."""
    return pandas_udf(_group_count_impl, "long")


class SplitSentences:
    """Python UDTF (table function): one text in, N sentence rows out.
    Splits on '.', keeps the ORIGINAL part index (not a post-filter
    running index) and emits raw parts, so the DuckDB mirror —
    zip-unnest(range, string_split) + regexp filter — matches exactly."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, part in enumerate(text.split(".")):
            if re.search(r"\S", part):
                yield i, part


def split_sentences_udtf():
    return udtf(SplitSentences, returnType="sent_idx int, sentence string")
