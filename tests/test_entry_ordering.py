"""Driver-contract ordering: the round driver samples a fixed-size
prefix of queries() (r1/r2/r3 CORRECTNESS evidence), so the entry
module must emit verification-need order — failed/never-checked
queries first, a small reserved slice of oldest-green re-checks inside
the sample window (ADVICE r3), already-green queries at the back — and
rotate automatically as new CORRECTNESS_r*.json files land."""

from __future__ import annotations

import __spark_entry__ as E
from transit_feed_etl_spark.queries import QUERIES


def test_queries_cover_registry_minus_exempt():
    names = list(E.queries())
    expected = [n for n, q in QUERIES.items() if not q.driver_exempt]
    assert sorted(names) == sorted(expected)
    assert len(names) == len(set(names))


def test_exempt_queries_not_exposed_to_driver():
    names = set(E.queries())
    for n, q in QUERIES.items():
        if q.driver_exempt:
            assert n not in names
            assert q.oracle is None  # exemption is only for oracle-less twins


def test_oracle_sql_subset_and_aligned():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    for n in o:
        assert o[n] == QUERIES[n].oracle


def test_ordering_contract():
    """Unchecked queries fill the window up to GREEN_SLOT_OFFSET, the
    reserved slice holds the oldest-green queries, remaining unchecked
    follow, and the rest of the green set sorts oldest-first at the
    back.  Collapses to plain unchecked-then-green when the unchecked
    set no longer overflows the window."""
    verdicts = E._load_verdicts()
    # EFFECTIVE green (the ordering's own notion): FORCE_RECHECK names
    # with stale/rows-only rows are unchecked even when their raw latest
    # row is green — using raw green here diverged from the ordering the
    # moment round 6 queued its five FORCE_RECHECK entries
    green = E._effective_green(verdicts)
    names = list(E.queries())
    n_unchecked = sum(1 for n in names if n not in green)

    if n_unchecked > E.GREEN_SLOT_OFFSET and len(names) > n_unchecked:
        window_head = names[: E.GREEN_SLOT_OFFSET]
        reserved = names[E.GREEN_SLOT_OFFSET : E.GREEN_SLOT_OFFSET + E.RESERVED_GREEN_SLOTS]
        assert all(n not in green for n in window_head)
        assert all(n in green for n in reserved)
        # reserved slice is the globally oldest green queries
        oldest = sorted(
            (n for n in names if n in green),
            key=lambda n: (verdicts[n][0], n),
        )[: len(reserved)]
        assert reserved == oldest
        tail = names[E.GREEN_SLOT_OFFSET + E.RESERVED_GREEN_SLOTS :]
        first_green_in_tail = next(
            (i for i, n in enumerate(tail) if n in green), len(tail)
        )
        assert all(n in green for n in tail[first_green_in_tail:])
    else:
        first_green = next((i for i, n in enumerate(names) if n in green), len(names))
        assert all(n in green for n in names[first_green:])


def test_green_tail_is_oldest_first():
    """Green queries at the back sort by the round of their latest
    driver row, so the re-check slice round-robins automatically."""
    verdicts = E._load_verdicts()
    green = E._effective_green(verdicts)
    names = list(E.queries())
    tail_rounds = [
        verdicts[n][0]
        for n in names[E.GREEN_SLOT_OFFSET + E.RESERVED_GREEN_SLOTS :]
        if n in green
    ]
    assert tail_rounds == sorted(tail_rounds)


def _write_evidence(tmp_path, fname: str, rows) -> None:
    import json

    (tmp_path / fname).write_text(json.dumps(rows))


def test_crash_row_counts_as_regression(tmp_path):
    """A later-round row with err set but rows_match None must un-green
    a previously green query (ADVICE r3 medium) — asserted against the
    REAL loader on synthetic evidence files (ADVICE r4)."""
    _write_evidence(
        tmp_path, "CORRECTNESS_r01.json", {"q": {"rows_match": True, "hash_match": True}}
    )
    _write_evidence(
        tmp_path,
        "CORRECTNESS_r02.json",
        {"q": {"rows_match": None, "hash_match": None, "err": "boom"}},
    )
    assert E._load_verdicts(str(tmp_path)) == {"q": (2, False, False)}


def test_latest_round_wins_not_latest_filename(tmp_path):
    """Lexicographic filename order must not beat the parsed round
    number: r9 sorts after r10 by name but must not overwrite it
    (ADVICE r4)."""
    _write_evidence(
        tmp_path, "CORRECTNESS_r10.json", {"q": {"rows_match": True, "hash_match": True}}
    )
    _write_evidence(
        tmp_path, "CORRECTNESS_r9.json", {"q": {"rows_match": False, "hash_match": False}}
    )
    assert E._load_verdicts(str(tmp_path))["q"] == (10, True, True)


def test_malformed_evidence_files_are_skipped(tmp_path):
    """A top-level JSON array, non-dict row values, or unparseable JSON
    must not break queries() at driver time (ADVICE r4)."""
    _write_evidence(tmp_path, "CORRECTNESS_r01.json", ["not", "a", "dict"])
    _write_evidence(
        tmp_path,
        "CORRECTNESS_r02.json",
        {"good": {"rows_match": True, "hash_match": True}, "bad": "not-a-dict"},
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text("{truncated")
    assert E._load_verdicts(str(tmp_path)) == {"good": (2, True, True)}


def test_force_recheck_map_holds_only_binding_entries():
    """Satisfied FORCE_RECHECK entries are pruned each round (VERDICT
    r6 "What's wrong" #3) so the map is trustworthy rotation state: any
    entry still present must actually bind — i.e. the query's latest
    green full-oracle row predates the entry's min round."""
    verdicts = E._load_verdicts()
    for name, min_round in E.FORCE_RECHECK.items():
        row = verdicts.get(name, (0, False, False))
        attested = row[0] >= min_round and row[1] and (row[2] if len(row) > 2 else row[1])
        assert not attested, (
            f"FORCE_RECHECK[{name!r}]={min_round} is satisfied by a green "
            f"r{row[0]} full-oracle row — prune it. EXPECTED at round start "
            "(ADVICE r7): run python tools/round_start.py for the prune list."
        )


def test_force_recheck_self_clears_on_fresh_green(monkeypatch):
    """A FORCE_RECHECK name is unchecked while its latest green row
    predates the semantics-change round, and clears AUTOMATICALLY once
    a fresh green row lands — no per-round edit, no permanently clogged
    window slot.  The live map is empty (all past entries satisfied and
    pruned), so the mechanism is exercised via an injected entry."""
    name = "embedding_neardup_pairs"
    monkeypatch.setitem(E.FORCE_RECHECK, name, 5)
    stale = {name: (3, True, True)}  # r3 green predates the r5 change
    assert name not in E._effective_green(stale)
    fresh = {name: (5, True, True)}  # the r5 row attests the new semantics
    assert name in E._effective_green(fresh)
    red = {name: (6, False, False)}  # a later RED row must never read as green
    assert name not in E._effective_green(red)
    assert name not in E._effective_green({})  # no row at all -> unchecked
    # a rows-only row (err == 'no_oracle') is green for ordering but
    # CANNOT re-attest changed semantics — it never compared values
    # (ADVICE r5, __spark_entry__.py:92)
    rows_only = {name: (5, True, False)}
    assert name not in E._effective_green(rows_only)
    # legacy 2-tuple callers keep prior behavior (green == attested)
    assert name in E._effective_green({name: (5, True)})


def test_duplicate_round_evidence_warns(tmp_path, capsys):
    """CORRECTNESS_r05.json and CORRECTNESS_r5.json both parse to round
    5; glob order deciding the winner silently is arbitrary evidence —
    the loader must say so on stderr (ADVICE r5) while staying
    deterministic and non-fatal (the driver entry point must survive)."""
    _write_evidence(
        tmp_path, "CORRECTNESS_r05.json", {"q": {"rows_match": True, "hash_match": True}}
    )
    _write_evidence(
        tmp_path, "CORRECTNESS_r5.json", {"q": {"rows_match": False, "hash_match": False}}
    )
    v = E._load_verdicts(str(tmp_path))
    err = capsys.readouterr().err
    assert "duplicate CORRECTNESS round 5" in err
    # deterministic: sorted-filename order means r5.json applies last
    assert v == {"q": (5, False, False)}


def test_rows_only_no_oracle_counts_green(tmp_path):
    _write_evidence(
        tmp_path,
        "CORRECTNESS_r02.json",
        {"q": {"rows_match": None, "hash_match": None, "err": "no_oracle"}},
    )
    assert E._load_verdicts(str(tmp_path)) == {"q": (2, True, False)}


def test_priority_prefix_rotates_out_once_green():
    """A PRIORITY name that _load_green reports green must not occupy
    the prefix (the rotation needs no per-round edit)."""
    green = E._load_green()
    names = list(E.queries())
    pri_live = [n for n in E.PRIORITY if n in QUERIES and n not in green]
    assert names[: len(pri_live)] == pri_live


def test_priority_fills_the_unchecked_window():
    """While more than GREEN_SLOT_OFFSET queries remain unchecked, the
    sample window's unchecked part must be completely filled — by the
    PRIORITY ranking first, then registry order — so the ranking (not
    chance) decides what the driver sees this round (ADVICE r4: the old
    `<=` assertion also passed for an empty PRIORITY tuple)."""
    green = E._load_green()
    pri_live = [n for n in E.PRIORITY if n in QUERIES and n not in green]
    names = list(E.queries())
    n_unchecked = sum(1 for n in names if n not in green)
    window = names[: min(E.GREEN_SLOT_OFFSET, n_unchecked)]
    assert all(n not in green for n in window)
    assert len(window) == min(E.GREEN_SLOT_OFFSET, n_unchecked)
    # PRIORITY names that are still unchecked lead the window verbatim
    assert window[: len(pri_live[: len(window)])] == pri_live[: len(window)]
    if n_unchecked > E.GREEN_SLOT_OFFSET:
        assert len(pri_live) <= E.GREEN_SLOT_OFFSET


def test_round7_window_composition():
    """Pin the fully-green round-7 window (VERDICT r6 item 2): with the
    registry at 198/198 green and FORCE_RECHECK empty, the unchecked
    set is empty, so the driver's ~50-query sample is exactly the 50
    globally-oldest greens — the two r2 rows (`training_shard_manifest`,
    `weighted_sample_by_quality`) first, then the r3 cohort, with the
    first r4 row closing the window.  Self-disables once new evidence
    lands (any unchecked query reappears or the oldest round moves)."""
    verdicts = E._load_verdicts()
    green = E._effective_green(verdicts)
    names = list(E.queries())
    if any(n not in green for n in names):
        return  # evidence moved on; the generic ordering tests still bind
    oldest = sorted(names, key=lambda n: (verdicts[n][0], n))[:50]
    assert names[:50] == oldest
    if verdicts[names[0]][0] == 2:
        assert names[:2] == ["training_shard_manifest", "weighted_sample_by_quality"]
        assert {verdicts[n][0] for n in names[2:49]} == {3}


def test_round6_window_composition():
    """Pin the closed-registry round-6 window (VERDICT r5 item 4): the
    unchecked set is exactly the r5 red row (`array_setops_tokens`, fix
    in-tree) plus the five round-6 FORCE_RECHECK names whose semantics
    changed this round (4 oracle promotions + the vecmag-sweep
    embedding_quantization redesign); the rest of the ~50-slot window is
    the globally oldest greens, oldest-round-first.  Self-disables once
    new evidence lands."""
    verdicts = E._load_verdicts()
    green = E._effective_green(verdicts)
    names = list(E.queries())
    unchecked = [n for n in names if n not in green]
    expected_unchecked = {
        "array_setops_tokens",
        "approx_distinct_users",
        "approx_percentiles",
        "approx_top_bigrams",
        "doc_compression_ratio",
        "embedding_quantization",
    }
    if set(unchecked) != expected_unchecked:
        return  # evidence moved on; the generic ordering tests still bind
    assert set(names[: len(unchecked)]) == expected_unchecked
    tail = names[len(unchecked) :]
    tail_rounds = [verdicts[n][0] for n in tail]
    assert tail_rounds == sorted(tail_rounds)
    # the re-check half of the window is the globally oldest greens
    window_greens = tail[: 50 - len(unchecked)]
    oldest = sorted(tail, key=lambda n: (verdicts[n][0], n))[: len(window_greens)]
    assert window_greens == oldest


def test_round5_window_composition():
    """Pin the exact shape of the round-5 driver window (VERDICT r4
    item 6): with 18 never-checked queries remaining and four committed
    green rounds, the window is those 18 first (media codecs then
    scalar-function variants, registry order) followed by oldest-green
    re-checks — r1 greens before r3 greens before r4 greens — so by
    ~round 7 every green query has a second confirming row.  The test
    self-disables once new evidence lands (n_unchecked changes)."""
    verdicts = E._load_verdicts()
    green = E._effective_green(verdicts)
    names = list(E.queries())
    unchecked = [n for n in names if n not in green]
    if len(unchecked) != 20:  # evidence moved on; ordering tests above still bind
        return
    expected_head = [
        "media_real_decode",
        "audio_energy_features",
        "image_resize_stats",
        "video_frame_sample_stats",
        "image_avg_hash_neardup",
        "image_png_decode_stats",
        "null_semantics",
        "regex_functions",
        "array_functions",
        "bitwise_functions",
        "url_parse_stats",
        "string_edge_functions",
        "calendar_functions",
        "array_setops_tokens",
        "error_safe_arithmetic",
        "json_struct_roundtrip",
        "sort_nulls_placement",
        "variant_typed_extraction",
        # semantics changed post-green (vacuous 0.8 cut -> 0.4):
        # FORCE_RECHECK queues them for a fresh attesting row
        "embedding_neardup_pairs",
        "embedding_dedup_clusters",
    ]
    assert names[:20] == expected_head
    # the rest of the ~50-slot window is green re-checks, oldest round
    # first ACROSS ALL COMMITTED ROUNDS (r1 greens lead)
    recheck = names[20:50]
    rounds = [verdicts[n][0] for n in recheck]
    assert all(n in green for n in recheck)
    assert rounds == sorted(rounds)
    assert rounds[0] == min(verdicts[n][0] for n in names if n in green)
