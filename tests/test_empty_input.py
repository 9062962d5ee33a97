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
