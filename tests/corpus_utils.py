"""Shared builders for the domain-edge differential-sweep corpora.

Each sweep writes ONE adversarial table as a single parquet file
(pyarrow, not Spark — DuckDB's read_parquet targets the file path
directly) and borrows every other table from the sf0.001 driver
testdata, so the full registry remains runnable against the corpus.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def make_sf_dir(out: str, override: dict[str, pa.Table]) -> str:
    """Build a test sf dir: tables in `override` are written from the
    given arrow tables; every other table is copied from the driver
    testdata."""
    os.makedirs(out, exist_ok=True)
    for name, tbl in override.items():
        pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
    for t in ALL_TABLES:
        if t not in override:
            shutil.copyfile(f"{SRC}/{t}.parquet", os.path.join(out, f"{t}.parquet"))
    return out


def documents_table(texts: list[str | None]) -> pa.Table:
    """A documents table with the driver schema around the given texts."""
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["web"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64()),
        }
    )


def sweep_queries(spark, sf_dir: str, names) -> dict[str, list[str]]:
    """Run each named oracle-paired query vs DuckDB on `sf_dir`; return
    {name: problems} for the ones that disagree (exceptions included)."""
    from transit_feed_etl_spark.queries import QUERIES
    from tests.oracle_utils import compare, run_oracle

    failures: dict[str, list[str]] = {}
    for name in names:
        q = QUERIES[name]
        if q.oracle is None:
            continue
        try:
            problems = compare(
                q.builder(spark, sf_dir), run_oracle(q.oracle, sf_dir)
            )
        except Exception as e:  # noqa: BLE001 — collect, report all at once
            problems = [f"exception: {e!r}"[:200]]
        if problems:
            failures[name] = problems[:2]
        spark.catalog.clearCache()
    return failures
