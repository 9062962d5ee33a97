"""Tracked-cache lifecycle: builders that persist an intermediate must
not accumulate executor cache across queries when the caller never
calls release_caches() (VERDICT r4 "What's wrong" #3 — a driver-style
loop over 200 queries leaked one cache per cache-using query).

The fix lives in registry.register: every registered builder releases
the PREVIOUS query's tracked caches at build entry, bounding
outstanding cache to one query's worth with no caller discipline."""

from __future__ import annotations

from transit_feed_etl_spark.caching import _TRACKED, release_caches
from transit_feed_etl_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_no_cache_growth_across_repeated_queries(spark):
    """Running a cache-using query repeatedly WITHOUT release_caches()
    must not grow the persisted-RDD set: the next build releases the
    previous build's caches (the VERDICT-prescribed done-check)."""
    release_caches()
    q = QUERIES["inverted_index_postings"]

    q.builder(spark, SF).collect()
    after_first = _persistent_rdd_count(spark)
    tracked_first = len(_TRACKED)
    assert tracked_first >= 1  # the query does persist something

    for _ in range(3):
        q.builder(spark, SF).collect()
        assert _persistent_rdd_count(spark) <= after_first
        assert len(_TRACKED) <= tracked_first
    release_caches()


def test_cache_released_across_different_queries(spark):
    """A driver-style loop over DIFFERENT cache-using queries stays
    bounded at one query's caches outstanding: after each build+action,
    _TRACKED holds exactly what that query tracks when run SOLO — never
    the previous queries' leftovers on top."""
    names = ["inverted_index_postings", "minhash_lsh_candidates", "dedup_clusters"]
    # solo baseline: how many caches each query tracks in isolation
    solo: dict[str, int] = {}
    for name in names:
        release_caches()
        QUERIES[name].builder(spark, SF).collect()
        solo[name] = len(_TRACKED)
    release_caches()
    assert any(v > 0 for v in solo.values())  # the bound is non-trivial

    # driver-style loop with NO manual releases between queries
    for name in names:
        QUERIES[name].builder(spark, SF).collect()
        assert len(_TRACKED) == solo[name], (
            f"after {name}: tracked {len(_TRACKED)} != solo {solo[name]} — "
            "previous queries' caches leaked past the build-entry release"
        )
    QUERIES["grand_total"].builder(spark, SF).collect()  # non-caching query
    assert len(_TRACKED) == 0  # its build released the leftovers
    release_caches()


def test_interleaved_threads_keep_each_others_caches(spark):
    """Per-thread cache scoping (VERDICT r6 item 5 done-check): two
    drivers interleaving builds on separate threads keep both queries'
    caches live until their own next build — thread B's build-entry
    release must not unpersist thread A's in-use caches, and A's next
    build releases only A's previous caches."""
    import threading

    from transit_feed_etl_spark import caching

    release_caches()
    caching.release_all_caches()
    q = QUERIES["inverted_index_postings"]

    def my_tracked():
        me = threading.current_thread()
        with caching._LOCK:
            return [df for ref, df in caching._TRACKED if ref() is me]

    # two long-lived worker threads, builds strictly interleaved
    # (events, not races: thread identity is what's under test)
    results: dict[str, object] = {}
    step_a = threading.Event()
    step_b = threading.Event()

    def worker_a():
        q.builder(spark, SF).collect()
        results["a1"] = my_tracked()
        step_a.set()  # let B build while A's caches are live
        step_b.wait(120)
        # B built meanwhile — its build-entry release (on B's thread)
        # must NOT have dropped a1: the exact hazard this scoping removes
        with caching._LOCK:
            live = [df for _, df in caching._TRACKED]
        results["a1_survived_b"] = all(
            any(df is l for l in live) for df in results["a1"]
        )
        q.builder(spark, SF).collect()  # A's next build: releases a1 only
        results["a2"] = my_tracked()

    def worker_b():
        step_a.wait(120)
        q.builder(spark, SF).collect()
        results["b1"] = my_tracked()
        # a1 still live from B's perspective too
        with caching._LOCK:
            live = [df for _, df in caching._TRACKED]
        results["a1_visible_to_b"] = all(
            any(df is l for l in live) for df in results["a1"]
        )
        step_b.set()

    ta = threading.Thread(target=worker_a)
    tb = threading.Thread(target=worker_b)
    ta.start(), tb.start()
    ta.join(240), tb.join(240)

    assert results["a1"] and results["b1"] and results["a2"]
    assert results["a1_visible_to_b"] is True
    assert results["a1_survived_b"] is True
    # A's own next build DID release a1 (fresh caches registered)
    with caching._LOCK:
        live = [df for _, df in caching._TRACKED]
    assert all(not any(df is l for l in live) for df in results["a1"])
    assert all(any(df is l for l in live) for df in results["a2"])
    caching.release_all_caches()


def test_dead_thread_caches_are_scavenged(spark):
    """A driver that spawns a fresh thread per query must not leak: once
    the owner thread exits, any thread's release_caches() reclaims its
    caches."""
    import threading

    from transit_feed_etl_spark import caching

    release_caches()
    caching.release_all_caches()
    q = QUERIES["inverted_index_postings"]

    t = threading.Thread(target=lambda: q.builder(spark, SF).collect())
    t.start()
    t.join(120)
    with caching._LOCK:
        orphaned = len(caching._TRACKED)
    assert orphaned >= 1  # the dead thread left tracked caches behind
    assert release_caches() >= orphaned  # main thread scavenges them
    assert len(_TRACKED) == 0


def test_scavenging_survives_thread_ident_reuse(spark):
    """CPython reuses thread idents after a thread exits (ADVICE r7): an
    ident-keyed registry could re-attribute a dead thread's orphaned
    caches to an unrelated NEW live thread and never scavenge them. The
    weakref-to-Thread tracking must scavenge the orphan even while a
    live thread holds the dead owner's recycled ident."""
    import threading

    from transit_feed_etl_spark import caching

    release_caches()
    caching.release_all_caches()
    q = QUERIES["inverted_index_postings"]

    t = threading.Thread(target=lambda: q.builder(spark, SF).collect())
    t.start()
    t.join(120)
    dead_ident = t.ident
    with caching._LOCK:
        orphaned = len(caching._TRACKED)
    assert orphaned >= 1

    # spin up live threads until one recycles the dead owner's ident
    # (pthread ids are reused aggressively; bail out after 50 tries —
    # the scavenge assertion below holds either way, the reuse just
    # makes it exercise the exact ADVICE r7 hazard)
    stop = threading.Event()
    holders: list[threading.Thread] = []
    reused = False
    for _ in range(50):
        h = threading.Thread(target=stop.wait)
        h.start()
        holders.append(h)
        if h.ident == dead_ident:
            reused = True
            break
    try:
        assert release_caches() >= orphaned, (
            "orphaned caches escaped scavenging"
            + (" via ident reuse" if reused else "")
        )
        assert len(_TRACKED) == 0
    finally:
        stop.set()
        for h in holders:
            h.join(30)
