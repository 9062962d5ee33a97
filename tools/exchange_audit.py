#!/usr/bin/env python
"""Exchange-volume audit: MEASURED shuffle traffic per headline query.

SCALE.md makes claims like "the dedup shuffle carries 32-byte digests,
never bodies" and "assignment is one narrow (vec_id, cid) exchange".
This tool turns those claims into numbers: it executes each bench
headline query, walks the AQE FINAL plan (including query stages,
reused exchanges, and persisted/cached subtrees), and reports every
exchange's record count, in-memory dataSize, and shuffle bytes written
— plus bytes/record, the width that decides whether a shuffle survives
a 100x scale-up.

Exchange classes:
- hash/range exchanges: the engine's real data movement — the audit
  subject;
- ROUND-ROBIN exchanges: the `table_par` single-row-group testdata
  workaround (io.py) — reported separately because on a real cluster
  the guard disables them (input splits already exceed parallelism);
- range exchanges: presentation orderBy — row-width by nature, not a
  data-movement claim (on a real pipeline the sink drops the sort);
- single-partition exchanges: scalar/global reductions to one row;
- broadcast exchanges: dataSize only (they ship a small side to every
  executor; the interesting number is that it stays small).

Usage: python tools/exchange_audit.py [sf_dir] [name_filter_regex]
Writes exchange_audit.json next to this file and prints a table.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _metrics(node) -> dict[str, int]:
    m = node.metrics()
    it = m.iterator()
    vals: dict[str, int] = {}
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    return vals


def _identity(jvm, node) -> int:
    """JVM identity of a plan node. Spark plan nodes are case classes
    whose hashCode() is STRUCTURAL, so two distinct-but-equal exchanges
    that AQE did not fold into a ReusedExchangeExec would dedup to one
    and undercount shuffle traffic (ADVICE r8). Identity hash counts
    each physical node once and only once."""
    return jvm.System.identityHashCode(node)


def _walk(node, out: dict, seen: dict, jvm) -> None:
    name = node.getClass().getSimpleName()
    if name == "ReusedExchangeExec":
        return  # metrics live on (and are counted at) the original
    if name == "AdaptiveSparkPlanExec":
        # AQE wrapper has NO children (initial/executed plans are
        # fields) — a cached subtree's cachedPlan() is exactly this
        # node, so without descending into executedPlan() every
        # exchange under a persist() was silently uncounted (found in
        # round 9 while auditing the Lloyd partial aggregates; the r8
        # artifact undercounted cached subtrees).
        _walk(node.executedPlan(), out, seen, jvm)
        return
    if name.endswith("QueryStageExec"):
        # Shuffle/Broadcast/Result/TableCache stages wrap their plan
        inner = node.plan() if hasattr(node, "plan") else None
        if inner is not None:
            _walk(inner, out, seen, jvm)
        return
    if name == "InMemoryTableScanExec":
        # persisted subtree: its exchanges ran when the cache
        # materialized; traverse the cached plan (dedup by identity so
        # two scans of one cache count its exchanges once)
        try:
            cached = node.relation().cachedPlan()
            key = _identity(jvm, cached)
            if key not in seen["cache"]:
                seen["cache"].add(key)
                _walk(cached, out, seen, jvm)
        except Exception:
            out["unwalked_caches"] = out.get("unwalked_caches", 0) + 1
        return
    if name == "ShuffleExchangeExec":
        v = _metrics(node)
        # Partitioning toString is CASE-INCONSISTENT across kinds:
        # HashPartitioning/RangePartitioning are Expressions and print
        # lowercase ("rangepartitioning(doc_id ASC ...)"), while
        # RoundRobinPartitioning and SinglePartition are plain case
        # objects and print CamelCase. The r8 classifier matched
        # "RangePartitioning" literally, so it NEVER matched — every
        # presentation orderBy was counted as a hash (data-movement)
        # exchange (zero range exchanges across all 44 queries in the
        # r8 artifact was the tell; found in round 9).
        part = node.outputPartitioning().toString().lower()
        if "roundrobin" in part:
            kind = "roundrobin"
        elif "rangepartitioning" in part:
            kind = "range"  # presentation orderBy, not a data-movement claim
        elif "singlepartition" in part:
            kind = "single"  # scalar/global reductions: one tiny partition
        else:
            kind = "hash"
        key = _identity(jvm, node)
        if key not in seen["shuffle"]:
            seen["shuffle"].add(key)
            out.setdefault(kind, []).append(
                {
                    "records": v.get("shuffleRecordsWritten", 0),
                    "data_bytes": v.get("dataSize", 0),
                    "written_bytes": v.get("shuffleBytesWritten", 0),
                }
            )
    elif name == "BroadcastExchangeExec":
        v = _metrics(node)
        key = _identity(jvm, node)
        if key not in seen["broadcast"]:
            seen["broadcast"].add(key)
            out.setdefault("broadcast", []).append(
                {"records": v.get("numOutputRows", 0), "data_bytes": v.get("dataSize", 0)}
            )
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), out, seen, jvm)


def audit_query(df) -> dict:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    out: dict = {}
    # separate seen-sets per node kind: a cross-kind identity-hash
    # collision must never suppress a node (ADVICE r8)
    seen = {"shuffle": set(), "broadcast": set(), "cache": set()}
    _walk(plan, out, seen, df.sparkSession._jvm)
    return out


# Plan-affecting confs pinned during a hermetic measurement, with the
# session.get_spark build values as fallback if the conf is somehow
# absent from the SparkConf (it never is — get_spark sets all of them
# via builder.config, which lands them in the SparkContext's conf).
_PLAN_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # AQE's RUNTIME sort-merge->broadcast conversion has its own
    # threshold that silently inherits whatever the non-adaptive value
    # was AT PLAN TIME; pin it explicitly so a leaked threshold can't
    # flip a borderline join's exchange count between sessions (r13,
    # VERDICT r12 item 8 — the softdedup_weights budget was loosened
    # 2->4 in r12 to cover exactly this nondeterminism class)
    "spark.sql.adaptive.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.shuffle.partitions": None,  # session-build value only
}


def hermetic_audit(build, spark) -> dict:
    """Measure a query's exchanges on a clean slate (VERDICT r11 item 2:
    the incremental_semdedup_rounds width contract failed in the full
    suite yet passed isolated and file-scoped — an order-dependent
    perturbation, not a width violation).

    Two leakage channels make a naive ``audit_query(builder(...))``
    order-dependent in a long-lived session:

    - CACHE GRAFTING: Spark's CacheManager substitutes any previously
      persisted relation whose analyzed plan matches a fragment of this
      query's plan. A foreign test's cache was MATERIALIZED under that
      test's confs, and the walker descends into cached subtrees by
      design — so the audit can end up measuring exchanges planned under
      someone else's broadcast threshold or AQE settings.
    - CONF LEAKAGE: a test that tweaks a plan-affecting conf and dies
      before its finally-restore leaves the session planning every
      subsequent query under the tweaked value (e.g. a leaked
      autoBroadcastJoinThreshold=-1 turns broadcast joins into hash
      exchanges; a leaked partition sizing inflates the map-partition
      count that the bounded-by-construction record ceilings assume).

    This wrapper pins every plan-affecting conf to its SESSION-BUILD
    value (read from the SparkContext's SparkConf — the values
    get_spark configured, immune to later session-conf mutation), drops
    all cached relations so no foreign plan fragment can graft in, runs
    the builder and measurement, then restores the caller's conf values
    and releases the caches the query itself created.  The builder must
    run INSIDE the pinned scope: iterative builders materialize their
    per-round persists eagerly, so conf pinning after build would be
    too late.

    Assumes exclusive use of the session (single-threaded test/audit
    processes): catalog.clearCache drops caches owned by ANY thread.
    """
    from transit_feed_etl_spark.caching import release_caches

    sc_conf = spark.sparkContext.getConf()
    snap: dict[str, str | None] = {}
    for key, fallback in _PLAN_CONFS.items():
        try:
            snap[key] = spark.conf.get(key)
        except Exception:
            snap[key] = None
        pinned = sc_conf.get(key, fallback)
        if pinned is not None:
            spark.conf.set(key, pinned)
    release_caches()
    spark.catalog.clearCache()
    try:
        return audit_query(build())
    finally:
        for key, prev in snap.items():
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        release_caches()
        spark.catalog.clearCache()


def main() -> int:
    from bench import HEADLINE
    from transit_feed_etl_spark.caching import release_caches
    from transit_feed_etl_spark.queries import QUERIES
    from transit_feed_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pat = re.compile(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_spark()
    results: dict[str, dict] = {}
    for name in HEADLINE:
        if pat and not pat.search(name):
            continue
        try:
            ex = hermetic_audit(lambda: QUERIES[name].builder(spark, sf_dir), spark)
        except Exception as e:  # noqa: BLE001 — audit everything it can
            results[name] = {"error": str(e)[:160]}
            continue
        finally:
            release_caches()
            spark.catalog.clearCache()
        hashes = ex.get("hash", [])
        rr = ex.get("roundrobin", [])
        rng = ex.get("range", [])
        bc = ex.get("broadcast", [])
        rec = sum(e["records"] for e in hashes)
        byt = sum(e["data_bytes"] for e in hashes)
        results[name] = {
            "hash_exchanges": len(hashes),
            "hash_records": rec,
            "hash_data_bytes": byt,
            "hash_bytes_per_record": round(byt / rec, 1) if rec else None,
            "widest_exchange_bytes": max((e["data_bytes"] for e in hashes), default=0),
            "testdata_par_exchanges": len(rr),
            "testdata_par_bytes": sum(e["data_bytes"] for e in rr),
            "range_exchanges": len(rng),
            "range_bytes": sum(e["data_bytes"] for e in rng),
            "single_exchanges": len(ex.get("single", [])),
            "single_bytes": sum(e["data_bytes"] for e in ex.get("single", [])),
            "broadcasts": len(bc),
            "broadcast_bytes": sum(e["data_bytes"] for e in bc),
            **(
                {"unwalked_caches": ex["unwalked_caches"]}
                if ex.get("unwalked_caches")
                else {}
            ),
        }
        r = results[name]
        print(
            f"{name:34} hashX={r['hash_exchanges']:2} rec={r['hash_records']:>9,}"
            f" bytes={r['hash_data_bytes']:>12,} B/rec={r['hash_bytes_per_record']}"
            f" par={r['testdata_par_bytes']:>11,} bcast={r['broadcast_bytes']:>10,}",
            flush=True,
        )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "exchange_audit.json")
    with open(path, "w") as f:
        json.dump({"sf_dir": sf_dir, "queries": results}, f, indent=1, sort_keys=True)
    print(f"wrote {os.path.normpath(path)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
