"""JSON-edge differential sweep (17th adversarial corpus, added round 6).

The props payload flows through THREE different Spark JSON APIs with
three different semantics — get_json_object (path extraction),
from_json into a typed map (document-level leniency), and Spark 4
parse_json/variant_get (coercing VARIANT) — while every DuckDB oracle
goes through json_extract[_string] + CAST. This sweep pins where they
provably agree and classifies where they diverge BY DESIGN, so a user
migrating between the APIs (or a future oracle edit) hits a test
instead of a silent behavior change.

Probed when first written (all asserted below):
- duplicate keys: get_json_object takes the FIRST occurrence (matching
  DuckDB), from_json's map takes the LAST, parse_json REFUSES
  (VARIANT_DUPLICATE_KEY) — three answers inside one engine;
- from_json is DOCUMENT-lenient: one value that fails the declared
  map<string,int> coercion nulls the WHOLE map (the row vanishes from
  an explode), not just that entry;
- variant_get(int) COERCES ("12", 100.0, true, 1e2 -> int) where the
  ANSI string cast refuses, and fails FAST on array/object values.
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from tests.corpus_utils import make_sf_dir, sweep_queries
from transit_feed_etl_spark.queries import QUERIES

# strictly inside every API's common domain: unique keys, values that
# are int-typed JSON numbers or JSON null, missing keys, whitespace,
# empty object, top-level array, int32 extremes
SAFE_PROPS = (
    '{"k": 7}',
    '{ "k" : 42 }',
    '{"k": null}',
    '{"j": 9}',
    '{"k": 13, "m": 4}',
    '{"K": 3}',  # case-sensitive miss on both engines
    "[1,2,3]",  # top-level array: $.k is a miss, json_keys yields none
    '{"k": -5}',
    "{}",
    '{"k": 0, "j": 1, "m": 2}',
    '{"k": 2147483647}',  # INT32 max passes the strict cast on both
)

PROPS_QUERIES = (
    "json_extraction",
    "map_entry_stats",
    "variant_typed_extraction",
    "json_struct_roundtrip",
    "existence_filter",
    "null_guarded_projection",
)


def _events(props: list[str]) -> pa.Table:
    n = len(props)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [datetime(2024, 3, 1, 12, 0, i % 60) for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([i % 4 for i in range(n)], pa.int64()),
            "event_type": pa.array(
                ("view", "click", "purchase")[i % 3] for i in range(n)
            ),
            "value": pa.array([float(i) for i in range(n)], pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )


@pytest.fixture(scope="module")
def jsonedge_sf_dir(tmp_path_factory) -> str:
    return make_sf_dir(
        str(tmp_path_factory.mktemp("sf_jsonedge")),
        {"events": _events([SAFE_PROPS[i % len(SAFE_PROPS)] for i in range(55)])},
    )


def test_props_queries_agree_on_safe_json_edges(spark, jsonedge_sf_dir):
    """All three JSON APIs and their oracles agree across the common
    domain: unique keys, int/null/missing values, whitespace, empty
    objects, top-level arrays, int32 extremes."""
    failures = sweep_queries(spark, jsonedge_sf_dir, PROPS_QUERIES)
    assert not failures, failures


def test_duplicate_keys_three_apis_three_answers(spark):
    """Duplicate JSON keys are the classified divergence INSIDE the
    engine: path extraction takes the first occurrence (as DuckDB
    does), the typed map takes the last, and VARIANT refuses outright.
    map_entry_stats/variant_typed_extraction therefore declare
    unique-keys input domains; this pin makes the three-way split a
    tested fact instead of a surprise."""
    dup = '{"k": 1, "k": 2}'
    df = spark.createDataFrame([(dup,)], "props string")
    got = df.select(
        F.get_json_object("props", "$.k").alias("g"),
        F.from_json("props", "map<string,int>").alias("m"),
    ).collect()[0]
    assert got["g"] == "1"  # first occurrence, matches DuckDB
    assert got["m"] == {"k": 2}  # last occurrence wins in the typed map
    with pytest.raises(Exception, match="DUPLICATE|duplicate"):
        df.select(F.parse_json("props")).collect()
    # DuckDB sides with path extraction (first occurrence)
    import duckdb

    assert (
        duckdb.sql("SELECT json_extract_string('" + dup + "'::JSON, '$.k')").fetchone()[0]
        == "1"
    )


def test_from_json_document_level_leniency(spark):
    """from_json(map<string,int>) nulls the ENTIRE map when any single
    value fails the declared coercion — the document disappears from an
    explode rather than contributing its castable entries. This is the
    documented input-domain contract of map_entry_stats (strictly
    int-valued payloads); a per-entry-lenient rewrite would silently
    change corpus statistics, so the behavior is pinned."""
    cases = {
        '{"k": "12"}': None,  # string-typed numeral: whole map nulled
        '{"k": 100.0}': None,  # float literal for an int field
        '{"k": true}': None,
        '{"k": [1,2]}': None,
        '{"k": {"d": 1}}': None,
        '{"k": 1e2}': None,  # exponent parses as double, not int
        '{"k": null}': {"k": None},  # JSON null is an in-domain value
        '{"k": 3, "m": 4}': {"k": 3, "m": 4},
    }
    df = spark.createDataFrame([(p,) for p in cases], "props string")
    out = {
        r["props"]: r["m"]
        for r in df.select(
            "props", F.from_json("props", "map<string,int>").alias("m")
        ).collect()
    }
    assert out == cases


def test_variant_coerces_where_strict_casts_refuse(spark):
    """Spark 4 VARIANT typed extraction COERCES scalars into the target
    type ("12", 100.0, 1e2 -> 100, true -> 1) where the ANSI string
    cast and DuckDB's CAST raise — and fails FAST (INVALID_VARIANT_CAST,
    pointing at try_variant_get) on array/object values. variant_
    typed_extraction's oracle therefore only sees int-typed payloads;
    this pin documents the coercion table that makes wider domains
    non-oracle-comparable."""
    ok = {
        '{"k": "12"}': 12,
        '{"k": 100.0}': 100,
        '{"k": 1e2}': 100,
        '{"k": true}': 1,
        '{"k": null}': None,
        "[1,2,3]": None,  # top-level array: $.k is a miss, not an error
    }
    for props, want in ok.items():
        got = (
            spark.createDataFrame([(props,)], "props string")
            .select(F.variant_get(F.parse_json("props"), "$.k", "int").alias("k"))
            .collect()[0]["k"]
        )
        assert got == want, (props, got, want)
    for props in ('{"k": [1,2]}', '{"k": {"d": 1}}'):
        with pytest.raises(Exception, match="INVALID_VARIANT_CAST"):
            spark.createDataFrame([(props,)], "props string").select(
                F.variant_get(F.parse_json("props"), "$.k", "int")
            ).collect()
