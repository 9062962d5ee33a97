"""The bench regression gate must only compare same-sf anchors: a
smaller dev-loop sf would trivially pass (and a larger one trivially
fail) against the committed sf0.1 round anchor."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_prev_bench_matches_only_same_sf():
    mins, meds = bench._prev_bench(0.1)
    assert mins, "committed BENCH_r*.json anchor at sf0.1 must load"
    assert all(isinstance(v, (int, float)) for v in mins.values())
    assert isinstance(meds, dict)
    assert all(isinstance(v, (int, float)) for v in meds.values())
    assert bench._prev_bench(0.001) == ({}, {})
    assert bench._prev_bench(1.0) == ({}, {})


def test_prev_bench_returns_both_signal_maps(tmp_path, monkeypatch):
    """An anchor carrying queries_median feeds BOTH gate signals
    (min-to-min and median-to-median — never median-vs-min, which
    double-counts noise); a min-only anchor leaves the median map
    empty so the gate fails on the min signal alone."""
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
    assert bench._prev_bench(0.1) == ({"q": 1.0}, {"q": 1.2})
    # min-only anchor (rounds 1-4) falls back to min-to-min
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"q": 1.0}}})
    )
    assert bench._prev_bench(0.1) == ({"q": 1.0}, {})


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
    assert bench._prev_bench(0.1) == ({"q": 10.0}, {})
    (tmp_path / "BENCH_r11.json").write_text("{not json")
    assert bench._prev_bench(0.1) == ({"q": 10.0}, {})


def test_prev_bench_skips_null_parsed_anchor(tmp_path, monkeypatch):
    """A newest anchor whose driver capture truncated (`parsed: null`,
    the shipped state of BENCH_r05.json) must fall back to the
    next-newest parsed anchor instead of disabling the gate (VERDICT r5
    item 3)."""
    import json

    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"q": 4.0}}})
    )
    (tmp_path / "BENCH_r05.json").write_text(json.dumps({"parsed": None}))
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._prev_bench(0.1) == ({"q": 4.0}, {})
    # empty-dict parsed is equally non-evidence
    (tmp_path / "BENCH_r05.json").write_text(json.dumps({"parsed": {}}))
    assert bench._prev_bench(0.1) == ({"q": 4.0}, {})


def test_prev_bench_scans_past_sf_mismatched_anchor(tmp_path, monkeypatch):
    """One committed dev-loop anchor at another sf must not disable the
    gate — older same-sf anchors are still evidence (ADVICE r5,
    bench.py:95)."""
    import json

    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"q": 4.0}}})
    )
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"parsed": {"sf": 0.01, "queries": {"q": 0.4}}})
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._prev_bench(0.1) == ({"q": 4.0}, {})
    # and a request at the dev sf finds the dev anchor
    assert bench._prev_bench(0.01) == ({"q": 0.4}, {})


def test_prev_bench_promotes_sidecar_medians_only_on_exact_match(
    tmp_path, monkeypatch
):
    """bench_detail.json upgrades a min-only anchor to the median gate
    ONLY when its sf and per-query min map equal the anchor's — a stale
    dev-loop sidecar must never masquerade as round evidence."""
    import json

    anchor = {"sf": 0.1, "queries": {"q": 1.0}}
    (tmp_path / "BENCH_r06.json").write_text(json.dumps({"parsed": anchor}))
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    # no sidecar -> min gate
    assert bench._prev_bench(0.1) == ({"q": 1.0}, {})
    # matching sidecar -> median gate
    (tmp_path / "bench_detail.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 1.0}, "queries_median": {"q": 1.3}})
    )
    assert bench._prev_bench(0.1) == ({"q": 1.0}, {"q": 1.3})
    # sidecar from a DIFFERENT run (min map differs) -> back to min gate
    (tmp_path / "bench_detail.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 9.9}, "queries_median": {"q": 1.3}})
    )
    assert bench._prev_bench(0.1) == ({"q": 1.0}, {})
    # corrupt sidecar is ignored, not fatal
    (tmp_path / "bench_detail.json").write_text("{nope")
    assert bench._prev_bench(0.1) == ({"q": 1.0}, {})


def test_degraded_median_gate_is_announced(tmp_path, monkeypatch, capsys):
    """When a same-sf anchor lacks medians and the sidecar fails the
    exact-match tie, the gate silently ran min-to-min with no diagnostic
    (ADVICE r6 — the sf-mismatch path got a stderr note, this downgrade
    didn't); the downgrade must print a REGRESSION-GATE NOTE."""
    import json

    anchor = {"sf": 0.1, "queries": {"q": 1.0}}
    (tmp_path / "BENCH_r06.json").write_text(json.dumps({"parsed": anchor}))
    (tmp_path / "bench_detail.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 9.9}, "queries_median": {"q": 1.3}})
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._prev_bench(0.1) == ({"q": 1.0}, {})
    err = capsys.readouterr().err
    assert "REGRESSION-GATE NOTE" in err and "min-to-min" in err
    # the median path stays quiet
    (tmp_path / "bench_detail.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 1.0}, "queries_median": {"q": 1.3}})
    )
    assert bench._prev_bench(0.1) == ({"q": 1.0}, {"q": 1.3})
    assert "NOTE" not in capsys.readouterr().err


def test_prev_bench_scans_past_payloadless_anchor(tmp_path, monkeypatch):
    """A right-sf anchor whose parsed payload lost its queries map must
    fall through to the next usable anchor, not silently disable the
    gate (round-6 review finding)."""
    import json

    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"q": 4.0}}})
    )
    (tmp_path / "BENCH_r06.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "value": 123}})
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._prev_bench(0.1) == ({"q": 4.0}, {})
    # ...and a payloadless anchor + a sidecar missing its own queries
    # map must not promote unrelated medians via None == None
    (tmp_path / "bench_detail.json").write_text(
        json.dumps({"sf": 0.1, "queries_median": {"q": 9.9}})
    )
    assert bench._prev_bench(0.1) == ({"q": 4.0}, {})


def test_stdout_line_fits_driver_capture():
    """The driver keeps only the tail of stdout; the final JSON line
    must stay inside that window with headroom (round 5 shipped a
    4.5k-char line and the round's BENCH artifact was unusable). The
    budget derives from the PINNED capture constant, not an observed
    approximation (ADVICE r9)."""
    import json

    t = {n: 123.456 for n in bench.HEADLINE}
    out, detail = bench._artifacts(t, t, {n: 99.9 for n in t}, 0.1, passes=3)
    line = bench._stdout_line(out)
    # 100 chars of headroom under the measured hard truncation forces a
    # layout decision (shorter names / trimmed payload) before growth
    # ever reaches the capture limit. Round 11 made that decision when
    # the 55-entry 3dp map outgrew the budget (stdout query values are
    # 2dp and value_median/passes are sidecar-only); round 12 switched
    # to compact JSON separators when the 57-entry map outgrew it.
    assert len(line) < bench.DRIVER_TAIL_CAPTURE - 100, len(line)
    assert json.loads(line) == out  # compact separators stay valid JSON
    assert out["queries"] == {n: 123.46 for n in t}
    assert "queries_median" not in out and "value_median" not in out
    assert detail["queries_median"] == t and detail["queries_spread_pct"]
    assert detail["value_median"] == round(123.456 * len(t), 3)
    assert detail["passes"] == 3
    # the sidecar's min map must stay BYTE-equal to the stdout map —
    # that equality is _sidecar_detail's anchor tie
    assert detail["queries"] == out["queries"]


def test_driver_tail_capture_constant_matches_committed_anchors():
    """Provenance for DRIVER_TAIL_CAPTURE: every committed BENCH anchor's
    `tail` field is at most the constant, and at least one anchor hits it
    EXACTLY (the capture is a hard truncation, so full-length tails pin
    the real window size). If the driver ever changes its capture, this
    test points at the constant to re-measure."""
    import glob
    import json
    from pathlib import Path

    root = Path(bench.__file__).resolve().parent
    lens = []
    for p in sorted(glob.glob(str(root / "BENCH_r*.json"))):
        tail = json.load(open(p)).get("tail")
        if isinstance(tail, str):
            lens.append(len(tail))
    assert lens, "no committed BENCH anchors with a tail field"
    assert max(lens) <= bench.DRIVER_TAIL_CAPTURE, lens
    assert bench.DRIVER_TAIL_CAPTURE in lens, lens


def test_headline_queries_all_registered():
    from transit_feed_etl_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing


def test_gate_verdicts_two_signal_contract():
    """FAIL requires BOTH signals (min and median) beyond threshold;
    either alone is a WARN; with no anchor medians the min signal alone
    fails (round-9 triage of the four r8 median-mode FAILs — one noisy
    pass moves the median, a real plan regression moves the min too)."""
    prev_min = {"q": 1.0}
    prev_med = {"q": 1.0}
    # both red -> FAIL
    fails, warns = bench._gate_verdicts({"q": 2.0}, {"q": 2.0}, prev_min, prev_med)
    assert "q" in fails and not warns
    # median-only red -> WARN (the r8 failure mode)
    fails, warns = bench._gate_verdicts({"q": 1.2}, {"q": 2.0}, prev_min, prev_med)
    assert not fails and "median-only" in warns["q"]
    # min-only red -> WARN (medians disagree)
    fails, warns = bench._gate_verdicts({"q": 2.0}, {"q": 1.2}, prev_min, prev_med)
    assert not fails and "min-only" in warns["q"]
    # both inside threshold -> clean
    fails, warns = bench._gate_verdicts({"q": 1.4}, {"q": 1.4}, prev_min, prev_med)
    assert not fails and not warns
    # no anchor medians: the min signal alone must still FAIL — a
    # min-only anchor (rounds 1-4) has no second signal to clear it
    fails, warns = bench._gate_verdicts({"q": 2.0}, {"q": 2.0}, prev_min, {})
    assert "q" in fails
    # unseen query (new registration) is neither FAIL nor WARN
    fails, warns = bench._gate_verdicts({"new": 9.9}, {"new": 9.9}, prev_min, prev_med)
    assert not fails and not warns


def test_prev_bench_reads_round_pinned_sidecar(tmp_path, monkeypatch):
    """The round-stamped sidecar (bench_detail_r{N}.json, pinned by
    tools/round_start.py when the anchor lands) must restore the median
    signal even after a local bench run overwrites the floating
    bench_detail.json — the failure mode that lost the r8-driver
    medians in round 9."""
    import json

    anchor = {"sf": 0.1, "queries": {"q": 1.0}}
    (tmp_path / "BENCH_r08.json").write_text(json.dumps({"parsed": anchor}))
    # floating sidecar from a DIFFERENT (local dev) run
    (tmp_path / "bench_detail.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 9.9}, "queries_median": {"q": 9.9}})
    )
    # pinned sidecar from the anchor's run
    (tmp_path / "bench_detail_r08.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 1.0}, "queries_median": {"q": 1.4}})
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._prev_bench(0.1) == ({"q": 1.0}, {"q": 1.4})


def test_gate_fail_messages_name_the_signals_that_fired():
    """VERDICT r9 item 1: the r9 driver artifact printed '(>1.5x on both
    min and median signals)' on min-only-mode failures. The FAIL detail
    is now built where the mode is known and must name exactly the
    signals that fired."""
    prev_min = {"q": 1.0}
    prev_med = {"q": 1.0}
    # both-signal FAIL says so
    fails, _ = bench._gate_verdicts({"q": 2.0}, {"q": 2.0}, prev_min, prev_med)
    assert "both min and median" in fails["q"]
    # min-only mode (anchor has no medians) must NOT claim both signals
    fails, _ = bench._gate_verdicts({"q": 2.0}, {"q": 2.0}, prev_min, {})
    assert "min-only mode" in fails["q"]
    assert "both" not in fails["q"]
    assert "no medians" in fails["q"]


def test_gate_hard_median_bar_fails_despite_lucky_min():
    """ADVICE r9: with only 3 passes one lucky fast pass can rescue a
    genuine regression via the min signal. A median alone beyond the 2x
    hard bar must FAIL (and say why); at or below the hard bar a
    median-only exceedance stays a WARN."""
    prev_min = {"q": 1.0}
    prev_med = {"q": 1.0}
    # median 2.5x, min clean -> hard-bar FAIL naming the rescue attempt
    fails, warns = bench._gate_verdicts({"q": 1.0}, {"q": 2.5}, prev_min, prev_med)
    assert "q" in fails and not warns
    assert "hard bar" in fails["q"]
    # median 1.8x, min clean -> still the r9 WARN behavior
    fails, warns = bench._gate_verdicts({"q": 1.0}, {"q": 1.8}, prev_min, prev_med)
    assert not fails and "median-only" in warns["q"]


def test_host_canary_runs_and_is_positive():
    """The calibration workload must be cheap (sub-~10s even on a
    heavily loaded box) and return a positive wall time."""
    sec = bench._host_canary()
    assert 0.0 < sec < 10.0, sec


def test_prev_bench_full_returns_anchor_canary(tmp_path, monkeypatch):
    """_prev_bench_full must surface the anchor run's canary median from
    the pinned sidecar (0.0 when the anchor predates the canary), while
    _prev_bench keeps its 2-tuple shape."""
    import json

    anchor = {"sf": 0.1, "queries": {"q": 1.0}}
    (tmp_path / "BENCH_r09.json").write_text(json.dumps({"parsed": anchor}))
    (tmp_path / "bench_detail_r09.json").write_text(
        json.dumps(
            {
                "sf": 0.1,
                "queries": {"q": 1.0},
                "queries_median": {"q": 1.2},
                "canary_sec": [0.5, 0.6, 0.5],
                "canary_median": 0.5,
            }
        )
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    assert bench._prev_bench_full(0.1) == ({"q": 1.0}, {"q": 1.2}, 0.5, 0.0)
    assert bench._prev_bench(0.1) == ({"q": 1.0}, {"q": 1.2})
    # two-canary sidecar (r12+ anchors) surfaces both medians
    (tmp_path / "bench_detail_r09.json").write_text(
        json.dumps(
            {
                "sf": 0.1,
                "queries": {"q": 1.0},
                "queries_median": {"q": 1.2},
                "canary_median": 0.5,
                "shuffle_canary_median": 0.8,
            }
        )
    )
    assert bench._prev_bench_full(0.1) == ({"q": 1.0}, {"q": 1.2}, 0.5, 0.8)
    # canary-less sidecar (pre-r10 anchors) -> 0.0, not a crash
    (tmp_path / "bench_detail_r09.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q": 1.0}, "queries_median": {"q": 1.2}})
    )
    assert bench._prev_bench_full(0.1) == ({"q": 1.0}, {"q": 1.2}, 0.0, 0.0)


def test_artifacts_canary_goes_to_sidecar_not_stdout():
    """The canary lives in bench_detail.json only — the stdout line must
    not grow toward the driver's tail-capture limit (the BENCH_r05
    parsed:null failure mode)."""
    t = {n: 1.0 for n in bench.HEADLINE}
    out, detail = bench._artifacts(
        t,
        t,
        {n: 1.0 for n in t},
        0.1,
        passes=3,
        canary_sec=[0.5, 0.6, 0.55],
        loadavgs=[[1.0, 1.0, 1.0]] * 3,
    )
    assert "canary_sec" not in out and "canary_median" not in out
    assert detail["canary_median"] == 0.55
    assert detail["canary_sec"] == [0.5, 0.6, 0.55]


def test_artifacts_shuffle_canary_goes_to_sidecar_not_stdout():
    """The r12 shuffle canary follows the same sidecar-only rule."""
    t = {n: 1.0 for n in bench.HEADLINE}
    out, detail = bench._artifacts(
        t,
        t,
        {n: 1.0 for n in t},
        0.1,
        passes=3,
        canary_sec=[0.5, 0.6, 0.55],
        loadavgs=[[1.0, 1.0, 1.0]] * 3,
        shuffle_canary_sec=[0.9, 0.7, 0.8],
    )
    assert "shuffle_canary_sec" not in out
    assert "shuffle_canary_median" not in out
    assert detail["shuffle_canary_median"] == 0.8
    assert detail["shuffle_canary_sec"] == [0.9, 0.7, 0.8]
    assert detail["loadavg"] == [[1.0, 1.0, 1.0]] * 3


def test_shuffle_canary_runs_and_is_positive(spark):
    """The shuffle calibration job must be cheap and positive, and its
    row-count tripwire must hold."""
    sec = bench._shuffle_canary(spark)
    assert 0.0 < sec < 30.0, sec


def test_best_canary_selects_the_ratio_that_explains_the_drift():
    """Two-canary selection (VERDICT r11 item 3): normalize by the
    canary whose host-speed ratio is closest to the observed drift in
    log space. The r11 window is the motivating case: queries drifted
    1.06x while the CPU canary ran 0.9x (anti-correlated) and a
    shuffle-bound canary would have shown ~1.1x — selection must pick
    shuffle and report a near-1.0 residual, never amplify via the
    anti-correlated CPU ratio."""
    lbl, norm = bench._best_canary(1.06, 0.9, 1.1)
    assert lbl == "shuffle" and abs(norm - 1.06 / 1.1) < 1e-9
    # only CPU available (pre-r12 anchor): fall back to it
    lbl, norm = bench._best_canary(1.06, 0.9, 0.0)
    assert lbl == "cpu" and abs(norm - 1.06 / 0.9) < 1e-9
    # no anchor canaries at all: raw passes through unlabeled
    assert bench._best_canary(1.06, 0.0, 0.0) == ("none", 1.06)
