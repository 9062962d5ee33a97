"""Empty-relation differential sweep: every oracle-paired query must
agree with DuckDB on ZERO-ROW tables too — the input domain edge where
null-handling bugs live (ADVICE r2 found exactly this class in
exact_substring_spans: F.size(null) = -1 vs len(NULL) = NULL).

Found and fixed by this sweep when first run:
- rollup/cube/grouping-sets: Spark emits no rows over an empty relation
  where the SQL standard's () grouping set emits a grand-total row —
  oracles now carry a no-op-on-data HAVING COUNT(*) > 0;
- exact_median_via_rank: oracle MAX(n) was NULL on empty input where the
  engine's driver-side count literal is 0 — oracle now COALESCEs.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from transit_feed_etl_spark.queries import QUERIES
from tests.corpus_utils import ALL_TABLES, SRC, sweep_queries


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("sf_empty"))
    for t in ALL_TABLES:
        schema = pq.ParquetFile(f"{SRC}/{t}.parquet").schema_arrow
        pq.write_table(
            pa.table({f.name: pa.array([], f.type) for f in schema}, schema=schema),
            os.path.join(out, f"{t}.parquet"),
        )
    return out


def test_every_oracle_query_agrees_on_empty_tables(spark, empty_sf_dir):
    failures = sweep_queries(spark, empty_sf_dir, list(QUERIES))
    assert not failures, failures


# --- singleton corpus (exactly one row per table) ---------------------------


@pytest.fixture(scope="module")
def singleton_sf_dir(tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("sf_single"))
    for t in ALL_TABLES:
        tbl = pq.ParquetFile(f"{SRC}/{t}.parquet").read().slice(0, 1)
        pq.write_table(tbl, os.path.join(out, f"{t}.parquet"))
    return out


# Degenerate-input preconditions (documented on the queries): PCA of a
# single sample has no principal axis — the centered scatter is the
# zero matrix and the normalization fails fast under ANSI.
PCA_QUERIES = ("pca_top_component", "pca_top2_projections")


def test_every_oracle_query_agrees_on_singleton_tables(spark, singleton_sf_dir):
    """Exactly one row per table: stresses zero-width histograms,
    absent pivot cells, n=1 variance guards, single-value percentiles,
    lag/lead NULL frames. Found when first run: the equi-width
    histogram divided by a zero bucket width on a constant column, and
    absent pivot cells bypassed the in-aggregate coalesce (NULL vs the
    oracle's FILTER-counted 0)."""
    names = [n for n in QUERIES if n not in PCA_QUERIES]
    failures = sweep_queries(spark, singleton_sf_dir, names)
    assert not failures, failures


def test_pca_fails_fast_on_single_sample(spark, singleton_sf_dir):
    """The documented precondition: one sample centers to the zero
    scatter matrix; the power iteration must fail fast (0/0 under
    ANSI), not emit an arbitrary axis."""
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO|ArithmeticException"):
        QUERIES["pca_top_component"].builder(spark, singleton_sf_dir).collect()
