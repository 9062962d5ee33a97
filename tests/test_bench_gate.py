"""The bench regression gate must only compare same-sf anchors: a
smaller dev-loop sf would trivially pass (and a larger one trivially
fail) against the committed sf0.1 round anchor."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_prev_bench_matches_only_same_sf():
    anchored, is_median = bench._prev_bench(0.1)
    assert anchored, "committed BENCH_r*.json anchor at sf0.1 must load"
    assert all(isinstance(v, (int, float)) for v in anchored.values())
    assert isinstance(is_median, bool)
    assert bench._prev_bench(0.001) == ({}, False)
    assert bench._prev_bench(1.0) == ({}, False)


def test_prev_bench_prefers_median_anchor(tmp_path, monkeypatch):
    """Once an anchor carries queries_median (round >= 5), the gate must
    compare median-to-median — never median-vs-min, which double-counts
    noise."""
    import json

    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps(
            {
                "parsed": {
                    "sf": 0.1,
                    "queries": {"q": 1.0},
                    "queries_median": {"q": 1.2},
                }
            }
        )
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._prev_bench(0.1) == ({"q": 1.2}, True)
    # min-only anchor (rounds 1-4) falls back to min-to-min
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"q": 1.0}}})
    )
    assert bench._prev_bench(0.1) == ({"q": 1.0}, False)


def test_prev_bench_anchor_by_parsed_round(tmp_path, monkeypatch):
    """The anchor is the highest PARSED round, not the lexicographically
    last filename (unpadded BENCH_r9.json would otherwise shadow
    BENCH_r10.json from round 10 on); a malformed newest anchor falls
    back to the previous round instead of silently disabling the gate."""
    import json

    (tmp_path / "BENCH_r9.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"q": 9.0}}})
    )
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"q": 10.0}}})
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._prev_bench(0.1) == ({"q": 10.0}, False)
    (tmp_path / "BENCH_r11.json").write_text("{not json")
    assert bench._prev_bench(0.1) == ({"q": 10.0}, False)


def test_headline_queries_all_registered():
    from transit_feed_etl_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing
