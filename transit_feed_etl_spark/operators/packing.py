"""Sequence packing (EXT: context-window document packing).

Pretraining pipelines concatenate documents into fixed-size context
windows; packing efficiency (tokens kept / window capacity) is a direct
cost multiplier at 100 TB. The distributed shape: documents are
hash-bucketed (narrow, no data movement beyond one shuffle on the
bucket key), each bucket packs INDEPENDENTLY with a sequential next-fit
pass inside one applyInPandas task. Global bin packing is inherently
sequential; per-bucket packing is the standard relaxation — packs never
span buckets, so buckets scale out while each task's loop stays
cache-local and tiny.

Next-fit (close the current pack when the next document doesn't fit)
rather than first-fit-decreasing: next-fit is ORDER-DETERMINISTIC over
the (hash, doc_id) sequence, which makes the whole operator
value-checkable against a DuckDB recursive CTE that replays the same
fold row by row (queries/curation.py::pack_sequences). Oversized
documents (> budget tokens) occupy a pack alone — truncation is a
separate policy decision, not the packer's.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


PACK_SCHEMA = "doc_id long, bucket int, pack_id long, n_tokens int"


def pack_documents(
    docs_with_tokens: DataFrame,
    budget: int = 512,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    tok_col: str = "n_tokens",
    order_col: str = "h",
) -> DataFrame:
    """(doc_id, bucket, pack_id, n_tokens): assign every document to a
    pack of <= budget total tokens (single oversized docs excepted).

    `docs_with_tokens` must carry a deterministic order column
    (`order_col`) — the hash that also buckets the rows — so the
    sequential fold visits rows in a reproducible order."""
    b = (F.pmod(F.col(order_col), F.lit(n_buckets))).cast("int")
    # NULL token counts (null source text) fold as zero-token docs —
    # without the coalesce they surface as NaN in the Arrow batch and
    # crash int() inside the fold (found by the null-text sweep)
    prepped = docs_with_tokens.select(
        F.col(id_col).alias("doc_id"),
        b.alias("bucket"),
        F.coalesce(F.col(tok_col).cast("int"), F.lit(0)).alias("n_tokens"),
        F.col(order_col).alias("h"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["h", "doc_id"], ignore_index=True)
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        # close on document COUNT, not acc > 0: zero-token docs keep acc
        # at 0, and an oversized doc must not join their pack (found by
        # the hypothesis invariant test — sizes=[0, 513] packed together)
        packs, acc, in_pack, pack = [], 0, 0, 0
        for tok in pdf["n_tokens"]:
            t = int(tok)
            if in_pack > 0 and acc + t > budget:
                pack += 1
                acc, in_pack = t, 1
            else:
                acc += t
                in_pack += 1
            packs.append(pack)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "bucket": pdf["bucket"],
                "pack_id": [bucket * 100_000 + p for p in packs],
                "n_tokens": pdf["n_tokens"],
            }
        )

    # one shuffle on the bucket key; each bucket's fold is one task
    return prepped.groupBy("bucket").applyInPandas(pack, PACK_SCHEMA)
