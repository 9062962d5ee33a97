"""Registry-wide output-schema contract: the driver's pandas
canonicalizer sorts the result frame and HASHES cell values, so a
driver-eligible query that returns an array/map/struct-typed column
crashes the round's correctness row with `TypeError: unhashable type:
'list'` (CORRECTNESS_r05 `array_setops_tokens`, the only red row of the
closed registry).  The repo's local harness tuple-izes list cells
(tests/oracle_utils.py), so ONLY this registry-level scan can catch the
divergence before the driver does: every driver-eligible query must emit
scalar-hashable columns only (join arrays to strings, to_json structs).

Raw binary payloads (media blobs) are bytes — hashable — and stay legal.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from transit_feed_etl_spark.queries import QUERIES

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _driver_eligible():
    return [(n, q) for n, q in QUERIES.items() if not q.driver_exempt]


@pytest.mark.parametrize(
    "name", [n for n, _ in _driver_eligible()], ids=lambda n: n
)
def test_no_complex_output_columns(name, spark, sf_dir):
    """Plan-only (no execution): build the query at sf0.001 and inspect
    its output schema.  Any array/map/struct column would crash the
    driver's canonicalizer, so it is a contract violation even when the
    local tuple-izing harness passes."""
    schema = QUERIES[name].builder(spark, sf_dir).schema
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, COMPLEX)
    ]
    assert not bad, (
        f"driver-eligible query {name!r} returns non-scalar column(s) "
        f"{bad}; the driver's pandas canonicalizer cannot hash them — "
        "emit array_join(...)/to_json(...) instead"
    )
