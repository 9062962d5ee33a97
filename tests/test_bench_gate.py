"""The bench regression gate must only compare same-sf anchors: a
smaller dev-loop sf would trivially pass (and a larger one trivially
fail) against the committed sf0.1 round anchor."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_prev_bench_matches_only_same_sf():
    anchored = bench._prev_bench(0.1)
    assert anchored, "committed BENCH_r*.json anchor at sf0.1 must load"
    assert all(isinstance(v, (int, float)) for v in anchored.values())
    assert bench._prev_bench(0.001) == {}
    assert bench._prev_bench(1.0) == {}


def test_headline_queries_all_registered():
    from transit_feed_etl_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing
