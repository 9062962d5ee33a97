"""Property-based tests (SURVEY.md §5 strategy point 4, hypothesis):
invariants the pipeline promises for ALL inputs, not just fixtures.

- flatten_feed keeps exactly the entities with a vehicle payload and
  null-guards every optional nested field (reference behaviors at
  gtfs_rt_assets.py:33,38-46);
- the batch bbox contains every valid point, and is NULL iff no valid
  point exists (reference gtfs_rt_assets.py:161-170);
- salted exact count-distinct equals the unsalted answer for any data,
  including single-hot-key skew (operators/skew.py's exactness claim);
- asof_join matches the brute-force per-row definition (most recent
  right row with ts <= left ts; ties -> largest right id).

Examples are kept small (Spark job per example); the point is shape
coverage — nulls, duplicates, empty sides, ties — not volume.
"""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from transit_feed_etl_spark.operators.asof import asof_join
from transit_feed_etl_spark.operators.skew import (
    salted_count_distinct,
    salted_grouped_topk,
)
from transit_feed_etl_spark.pipeline.gtfs import RAW_FEED_SCHEMA, flatten_feed

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# -- strategies ------------------------------------------------------------

_opt_str = st.one_of(st.none(), st.text("abc", min_size=1, max_size=3))
_opt_coord = st.one_of(st.none(), st.floats(-200, 200, allow_nan=False))


@st.composite
def _entity(draw):
    has_vehicle = draw(st.booleans())
    if not has_vehicle:
        return {"id": draw(_opt_str), "vehicle": None}
    has_pos = draw(st.booleans())
    return {
        "id": draw(_opt_str),
        "vehicle": {
            "vehicle": draw(st.one_of(st.none(), st.fixed_dictionaries({"id": _opt_str}))),
            "position": None
            if not has_pos
            else {
                "latitude": draw(_opt_coord),
                "longitude": draw(_opt_coord),
                "speed": draw(_opt_coord),
                "bearing": draw(_opt_coord),
            },
            "trip": draw(
                st.one_of(
                    st.none(),
                    st.fixed_dictionaries({"trip_id": _opt_str, "route_id": _opt_str}),
                )
            ),
            "current_stop_sequence": draw(st.one_of(st.none(), st.integers(0, 50))),
            "current_status": draw(st.one_of(st.none(), st.integers(0, 2))),
        },
    }


_TS = datetime(2024, 3, 1, 12, 0, tzinfo=timezone.utc)
_feed = st.fixed_dictionaries(
    {
        "feed_id": st.sampled_from(["mta", "bart"]),
        "fetch_ts": st.just(_TS),
        "entity": st.lists(_entity(), max_size=6),
    }
)


# -- properties ------------------------------------------------------------


@settings(**SETTINGS)
@given(feeds=st.lists(_feed, min_size=1, max_size=4))
def test_flatten_keeps_exactly_vehicle_entities(spark, feeds):
    raw = spark.createDataFrame(
        [(f["feed_id"], f["fetch_ts"], f["entity"]) for f in feeds], RAW_FEED_SCHEMA
    )
    flat = flatten_feed(raw).collect()
    want = sum(1 for f in feeds for e in f["entity"] if e["vehicle"] is not None)
    assert len(flat) == want
    # null guards: a missing position/trip yields NULL leaf columns,
    # never an error or a dropped row
    for r in flat:
        assert r["feed_id"] in ("mta", "bart") and r["ts"] is not None


@settings(**SETTINGS)
@given(
    pts=st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(-180, 180, allow_nan=False, width=32)),
            st.one_of(st.none(), st.floats(-90, 90, allow_nan=False, width=32)),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_bbox_contains_all_valid_points(spark, pts):
    df = spark.createDataFrame(
        [(float(lo) if lo is not None else None, float(la) if la is not None else None)
         for lo, la in pts],
        "longitude double, latitude double",
    )
    row = df.agg(
        F.min("longitude").alias("minx"),
        F.min("latitude").alias("miny"),
        F.max("longitude").alias("maxx"),
        F.max("latitude").alias("maxy"),
    ).collect()[0]
    lons = [lo for lo, _ in pts if lo is not None]
    lats = [la for _, la in pts if la is not None]
    if not lons:
        assert row["minx"] is None and row["maxx"] is None
    else:
        assert all(row["minx"] <= lo <= row["maxx"] for lo in lons)
    if not lats:
        assert row["miny"] is None and row["maxy"] is None
    else:
        assert all(row["miny"] <= la <= row["maxy"] for la in lats)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["hot", "b", "c"]), st.integers(0, 30)),
        min_size=1,
        max_size=60,
    ),
    n_salts=st.sampled_from([1, 3, 16]),
)
def test_salted_count_distinct_is_exact(spark, rows, n_salts):
    df = spark.createDataFrame(
        [(k, v) for k, v in rows], "event_type string, user_id long"
    )
    got = {
        r["event_type"]: r["n_distinct"]
        for r in salted_count_distinct(df, ["event_type"], "user_id", n_salts).collect()
    }
    want: dict[str, set] = {}
    for k, v in rows:
        want.setdefault(k, set()).add(v)
    assert got == {k: len(s) for k, s in want.items()}


@settings(**SETTINGS)
@given(
    rows=st.lists(
        # heavy duplication on purpose: group "hot" and repeated scores
        # exercise the total-order tie-breaking across salt buckets
        st.tuples(
            st.sampled_from(["hot", "b", "c"]),
            st.integers(0, 5),
            st.integers(0, 10_000),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[2],  # pk unique -> order is total
    ),
    k=st.sampled_from([1, 3, 7]),
    n_salts=st.sampled_from([1, 4, 16]),
)
def test_salted_grouped_topk_matches_window_form(spark, rows, k, n_salts):
    from pyspark.sql import Window as W

    df = spark.createDataFrame(rows, "grp string, score long, pk long")
    order = [F.col("score").desc(), F.col("pk").asc()]
    got = sorted(
        (r["grp"], r["pk"], r["rnk"])
        for r in salted_grouped_topk(df, ["grp"], order, k, n_salts).collect()
    )
    w = W.partitionBy("grp").orderBy(*order)
    want = sorted(
        (r["grp"], r["pk"], r["rnk"])
        for r in df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .collect()
    )
    assert got == want


@settings(**SETTINGS)
@given(
    left=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 100)), max_size=15),
)
def test_asof_join_matches_bruteforce(spark, left, right):
    to_ts = lambda s: datetime.fromtimestamp(1_700_000_000 + s * 60, tz=timezone.utc)  # noqa: E731
    lschema = T.StructType(
        [
            T.StructField("key", T.IntegerType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
        ]
    )
    ldf = spark.createDataFrame(
        [(k, to_ts(s), i) for i, (k, s) in enumerate(left)], lschema
    )
    rdf = spark.createDataFrame(
        [(k, to_ts(s), 1000 + i) for i, (k, s) in enumerate(right)], lschema
    )
    out = asof_join(ldf, rdf, on="key", ts_col="ts", left_id="event_id", right_id="event_id")
    got = {r["event_id"]: r["asof_event_id"] for r in out.collect()}
    for i, (k, s) in enumerate(left):
        cands = [
            (rs, 1000 + j)
            for j, (rk, rs) in enumerate(right)
            if rk == k and rs <= s
        ]
        want = max(cands)[1] if cands else None  # latest ts, tie -> largest id
        assert got[i] == want, (i, k, s, cands)


# --- GTFS-RT wire codec: decode(encode(x)) == x for ALL field shapes ---

_opt_text = st.one_of(st.none(), st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=12))
_opt_f32 = st.one_of(st.none(), st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, width=32))
_entity = st.fixed_dictionaries(
    {
        "entity_id": st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=8),
        "vehicle_id": _opt_text,
        "lat": _opt_f32,
        "lon": _opt_f32,
        "speed": _opt_f32,
        "bearing": _opt_f32,
        "trip_id": _opt_text,
        "route_id": _opt_text,
        "stop_sequence": st.one_of(st.none(), st.integers(0, 2**31 - 1)),
        "status": st.one_of(st.none(), st.integers(0, 6)),
    }
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_entity, max_size=5), st.integers(0, 2**40))
def test_wire_roundtrip_preserves_every_field(entities, header_ts):
    """Pure-Python protobuf wire codec: every optional field combination
    round-trips exactly (float32 values compare after f32 quantization,
    which the encoder applies by construction)."""
    import struct as _struct

    from transit_feed_etl_spark.sources import gtfs_wire as W

    payload = W.encode_feed_message(
        b"".join(W.encode_vehicle_entity(**e) for e in entities),
        header_ts=header_ts,
    )
    msg = W.decode_feed_message(payload)
    assert msg["header"]["timestamp"] == header_ts
    assert len(msg["entity"]) == len(entities)
    for e, got in zip(entities, msg["entity"]):
        assert got["id"] == e["entity_id"]
        v = got["vehicle"]
        f32 = lambda x: _struct.unpack("<f", _struct.pack("<f", x))[0]  # noqa: E731
        if e["vehicle_id"] is None:
            assert v["vehicle"] is None
        else:
            assert v["vehicle"]["id"] == e["vehicle_id"]
        pos_fields = {k: e[k] for k in ("lat", "lon", "bearing", "speed")}
        if all(x is None for x in pos_fields.values()):
            assert v["position"] is None
        else:
            pos = v["position"]
            for enc_k, dec_k in (("lat", "latitude"), ("lon", "longitude"),
                                 ("bearing", "bearing"), ("speed", "speed")):
                want = pos_fields[enc_k]
                assert pos[dec_k] == (None if want is None else f32(want))
        if e["trip_id"] is None and e["route_id"] is None:
            assert v["trip"] is None
        assert v["current_stop_sequence"] == e["stop_sequence"]
        assert v["current_status"] == e["status"]


# --- sequence packing: invariants for arbitrary token-size multisets ---

@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(0, 900), min_size=1, max_size=40))
def test_packing_invariants_for_any_sizes(spark, sizes):
    from transit_feed_etl_spark.operators.packing import pack_documents
    from transit_feed_etl_spark.operators.minhash import portable_hash60

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n_tokens int"
    ).withColumn("h", portable_hash60(F.col("doc_id").cast("string")))
    rows = pack_documents(df, budget=512, n_buckets=3).collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(len(sizes)))
    by_pack: dict[int, list[int]] = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r["n_tokens"])
        assert r["pack_id"] // 100_000 == r["bucket"]
    for toks in by_pack.values():
        assert sum(toks) <= 512 or len(toks) == 1


def test_misra_gries_completeness_guarantee(spark):
    """MG sketch contract: after a distributed build with k counters over
    N items, every item whose TRUE count exceeds N/(k+1) appears in the
    summary, and estimates never exceed true counts (one-sided error)."""
    from transit_feed_etl_spark.operators import textfns as TX
    from transit_feed_etl_spark.operators.sketches import misra_gries_topk
    from transit_feed_etl_spark.io import table_par
    from pyspark.sql import functions as F

    k = 32
    d = table_par(spark, "/root/testdata/sf0.001", "documents")
    bgs = d.select(F.explode(TX.word_shingles(TX.tokens("text"), 2)).alias("bigram"))
    exact = {r["bigram"]: r["n"] for r in
             bgs.groupBy("bigram").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_total = sum(exact.values())
    sketch = {r["bigram"]: r["est_count"] for r in
              misra_gries_topk(bgs, "bigram", k=k).collect()}
    threshold = n_total / (k + 1)
    for item, cnt in exact.items():
        if cnt > threshold:
            assert item in sketch, (item, cnt, threshold)
    for item, est in sketch.items():
        assert est <= exact[item], (item, est, exact[item])


def test_global_rank_matches_window_rank_edge_sizes(spark):
    """Distributed exact ranking contract: for n in {1, 7, 32, 1000}
    (fewer rows than partitions, n % buckets != 0, exact multiples) the
    range+offset rank equals the single-partition row_number, and
    ntile_from_rank equals ANSI NTILE for 3 and 10 buckets."""
    from pyspark.sql import Window as W, functions as F
    from transit_feed_etl_spark.operators.ranking import global_rank, ntile_from_rank

    for n in (1, 7, 32, 1000):
        df = spark.range(n).select(
            (F.xxhash64("id") % 97).alias("v"), F.col("id")
        )
        got = {
            r["id"]: r["rnk"]
            for r in global_rank(df, ["v", "id"]).collect()
        }
        w = W.orderBy("v", "id")
        want = {
            r["id"]: r["rnk"]
            for r in df.withColumn("rnk", F.row_number().over(w)).collect()
        }
        assert got == want, n
        for b in (3, 10):
            gr = global_rank(df, ["v", "id"])
            got_t = {
                r["id"]: r["t"]
                for r in gr.withColumn(
                    "t", ntile_from_rank(F.col("rnk"), F.lit(n), b)
                ).collect()
            }
            want_t = {
                r["id"]: r["t"]
                for r in df.withColumn("t", F.ntile(b).over(w)).collect()
            }
            assert got_t == want_t, (n, b)


def test_pigeonhole_blocking_finds_every_distance1_pair(spark):
    """Structural recall contract of the fuzzy join: ANY pair of
    equal-length strings within edit distance 1 agrees exactly on at
    least one half (pigeonhole), so the two half-keyed equi-joins plus
    levenshtein filter find exactly what the quadratic scan finds."""
    from pyspark.sql import functions as F

    base = "abcdefgh"
    variants = [base] + [
        base[:i] + c + base[i + 1 :]
        for i in range(len(base))
        for c in ("x", "z")
    ] + ["zzzzzzzz", "abxdefgx"]  # distance-2 decoys that must NOT match base
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(variants)], ["k", "s"]
    )
    half = len(base) // 2
    a = df.select(F.col("k").alias("ak"), F.col("s").alias("as_"),
                  F.substring("s", 1, half).alias("h1"),
                  F.substring("s", half + 1, half).alias("h2"))
    b = df.select(F.col("k").alias("bk"), F.col("s").alias("bs"),
                  F.substring("s", 1, half).alias("g1"),
                  F.substring("s", half + 1, half).alias("g2"))
    c1 = a.join(b, (F.col("h1") == F.col("g1")) & (F.col("ak") < F.col("bk")))
    c2 = a.join(b, (F.col("h2") == F.col("g2")) & (F.col("ak") < F.col("bk")))
    cand = c1.select("ak", "bk", "as_", "bs").union(
        c2.select("ak", "bk", "as_", "bs")
    ).dropDuplicates(["ak", "bk"])
    blocked = {
        (r["ak"], r["bk"])
        for r in cand.filter(F.levenshtein("as_", "bs") <= 1).collect()
    }
    quad = a.crossJoin(b).filter(
        (F.col("ak") < F.col("bk")) & (F.levenshtein("as_", "bs") <= 1)
    )
    exact = {(r["ak"], r["bk"]) for r in quad.collect()}
    assert blocked == exact
    assert len(exact) > 10  # the corpus genuinely exercises the property


def test_batch_perceptron_converges_on_separable_data(spark):
    """The training loop must actually LEARN when the data permits it:
    on a linearly separable 2-feature blob the misclassification count
    must reach 0 within a few rounds (the driver corpus's labels are
    unlearnable by construction, so convergence is pinned here)."""
    from transit_feed_etl_spark.operators.linear import batch_perceptron

    rows = []
    for i in range(60):
        # class +1 around (2, 2), class -1 around (-2, -2); radius < 1
        s = 1.0 if i % 2 == 0 else -1.0
        jx, jy = ((i * 37) % 19 - 9) / 10.0, ((i * 53) % 17 - 8) / 10.0
        rows.append((s, 1.0, s * 2.0 + jx * 0.4, s * 2.0 + jy * 0.4))
    feats = spark.createDataFrame(rows, "y double, x0 double, x1 double, x2 double")
    traj = batch_perceptron(feats, n_features=3, rounds=6, lr0=1.0).collect()
    assert traj[0]["n_misclassified"] == 60  # round 1: zero weights
    assert traj[-1]["n_misclassified"] == 0, [r["n_misclassified"] for r in traj]


# --- connected components vs pure-Python union-find -----------------------


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=20
    )
)
def test_connected_components_match_union_find(spark, edges):
    """operators/components.py min-label fixpoint must equal the
    textbook union-find result (label = component minimum) for ANY edge
    relation: self-loops, duplicate edges, multiple components, chains
    long enough to need several propagation rounds."""
    from transit_feed_etl_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {(r["node"], r["label"]) for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in parent}
    assert got == want


# --- exact-substring spans vs pure-Python replay ---------------------------


def _replay_spans(docs: list[list[str]], L: int = 5):
    """Reference semantics of queries/datasetops.py::exact_substring_spans:
    a word L-gram is duplicated when it appears in >= 2 distinct docs;
    covered intervals [p, p+L-1] (1-based) merge when overlapping OR
    adjacent; per-doc (n_tokens, n_spans, dup_tokens, max_span, dup_frac)."""
    gram_docs: dict[tuple, set[int]] = {}
    for d, toks in enumerate(docs):
        for p in range(len(toks) - L + 1):
            gram_docs.setdefault(tuple(toks[p : p + L]), set()).add(d)
    out = {}
    for d, toks in enumerate(docs):
        ivs = sorted(
            (p + 1, p + L)
            for p in range(max(0, len(toks) - L + 1))
            if len(gram_docs[tuple(toks[p : p + L])]) >= 2
        )
        spans: list[list[int]] = []
        for s, e in ivs:
            if spans and s <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([s, e])
        n = len(toks)
        dup = sum(e - s + 1 for s, e in spans)
        mx = max((e - s + 1 for s, e in spans), default=0)
        out[d] = (n, len(spans), dup, mx, 0.0 if n == 0 else dup / n)
    return out


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=12),
        min_size=1,
        max_size=4,
    )
)
def test_exact_substring_spans_match_python_replay(spark, docs, tmp_path_factory):
    """End-to-end semantic replay of the span-cutting dedup operator on
    random token corpora (vocab of 2 so cross-doc 5-gram collisions are
    common): tokenization, cross-doc gram hashing, duplicated-gram
    filter, and the gaps-and-islands merge must all agree with the
    pure-Python definition."""
    from transit_feed_etl_spark.queries.datasetops import exact_substring_spans

    sf_dir = str(tmp_path_factory.mktemp("spans_sf"))
    spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    rows = exact_substring_spans(spark, sf_dir).collect()
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_spans"],
            r["dup_tokens"],
            r["max_span"],
            r["dup_frac"],
        )
        for r in rows
    }
    assert got == _replay_spans(docs)


# --- binned range join vs brute force --------------------------------------


@settings(**SETTINGS)
@given(
    points=st.lists(st.integers(0, 5000), min_size=1, max_size=15),
    intervals=st.lists(
        st.tuples(st.integers(0, 5000), st.integers(0, 3000)), max_size=10
    ),
    bin_width=st.sampled_from([60, 600, 3600]),
)
def test_range_join_binned_matches_bruteforce(spark, points, intervals, bin_width):
    """operators/rangejoin.py bin-explode construction must produce
    EXACTLY the pairs of the point-in-interval predicate for any data
    and any bin width (bins change cost, never results): intervals
    spanning many bins, zero-length intervals, boundary-inclusive hits,
    empty interval side."""
    from transit_feed_etl_spark.operators.rangejoin import range_join_binned

    base = 1_700_000_000
    to_ts = lambda s: datetime.fromtimestamp(base + s, tz=timezone.utc)  # noqa: E731
    pdf = spark.createDataFrame(
        [(i, to_ts(s)) for i, s in enumerate(points)], "pid long, pt timestamp"
    )
    idf = spark.createDataFrame(
        [(j, to_ts(s), to_ts(s + d)) for j, (s, d) in enumerate(intervals)],
        "iid long, st timestamp, en timestamp",
    )
    out = range_join_binned(
        pdf, idf, point_ts="pt", start_ts="st", end_ts="en", bin_width_s=bin_width
    )
    got = {(r["pid"], r["iid"]) for r in out.select("pid", "iid").collect()}
    want = {
        (i, j)
        for i, s in enumerate(points)
        for j, (a, d) in enumerate(intervals)
        if a <= s <= a + d
    }
    assert got == want


# --- sessionization vs pure-Python replay ----------------------------------


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 3 * 3600)),
        min_size=1,
        max_size=20,
    )
)
def test_sessionize_matches_python_replay(spark, events, tmp_path_factory):
    """The lag-gap sessionizer must agree with the textbook definition
    (sort per user by (ts, event_id); gap > 1800 s starts a session) for
    any event pattern: duplicate timestamps (tie-broken by event_id),
    single-event sessions, exact-1800s boundary gaps (same session)."""
    from transit_feed_etl_spark.queries.windows import sessionize_events

    base = 1_700_000_000
    sf_dir = str(tmp_path_factory.mktemp("sess_sf"))
    rows = [
        (i, datetime.fromtimestamp(base + s, tz=timezone.utc), u)
        for i, (u, s) in enumerate(events)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    ).write.parquet(f"{sf_dir}/events.parquet")

    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["session_start"].timestamp(),
            r["session_end"].timestamp(),
        )
        for r in sessionize_events(spark, sf_dir).collect()
    }

    want = {}
    for u in sorted({u for u, _ in events}):
        evs = sorted(
            (base + s, i) for i, (eu, s) in enumerate(events) if eu == u
        )
        sid, prev = 0, None
        sessions: dict[int, list[int]] = {}
        for ts, _ in evs:
            if prev is None or ts - prev > 1800:
                sid += 1
                sessions[sid] = []
            sessions[sid].append(ts)
            prev = ts
        for s, tss in sessions.items():
            want[(u, s)] = (len(tss), float(min(tss)), float(max(tss)))
    assert got == want


# --- prefix-filtered exact Jaccard join vs naive ---------------------------


@settings(**SETTINGS)
@given(
    sets=st.lists(
        st.sets(st.integers(0, 12), max_size=8), min_size=2, max_size=8
    ),
    threshold=st.sampled_from([0.2, 0.35, 0.5, 0.8]),
)
def test_prefix_filter_matches_naive_on_random_sets(spark, sets, threshold):
    """operators/prefixfilter.py claims recall 1.0 BY CONSTRUCTION: for
    any collection of shingle sets and any threshold, the prefix-
    filtered join must return exactly the naive all-pairs result —
    same pairs, same (6-decimal) Jaccard values. Covers empty sets,
    identical sets, subset/superset pairs, threshold edge hits."""
    from transit_feed_etl_spark.operators.prefixfilter import jaccard_prefix_pairs

    rows = [(i, [f"s{x}" for x in sorted(s)]) for i, s in enumerate(sets)]
    df = spark.createDataFrame(rows, "_id long, _sh array<string>")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_prefix_pairs(
            df, id_col="_id", set_col="_sh", threshold=threshold
        ).collect()
    }
    want = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= threshold:
                want[(i, j)] = round(jac, 6)
    assert got == want


# --- BPE merge training vs pure-Python replay -------------------------------


def _replay_bpe_merges(texts: list[str], rounds: int):
    """Reference semantics of queries/bpe.py::_learn_merges: lowercase
    \\W+ tokens -> word-frequency table (len>=2 words only) -> per round,
    count adjacent symbol pairs weighted by word freq (overlapping
    positions each count), argmax by (cnt DESC, a ASC, b ASC), replace
    non-overlapping left-to-right. A pairless round emits nothing and
    ends training (the engine's crossJoin with an empty argmax empties
    the table)."""
    import re
    from collections import Counter

    words: Counter = Counter()
    for t in texts:
        for w in re.split(r"\W+", t.lower()):
            if w:
                words[w] += 1
    enc = {w: "".join(f"|{c}|" for c in w) for w in words if len(w) >= 2}
    merges = []
    for k in range(rounds):
        cnt: Counter = Counter()
        for w, e in enc.items():
            syms = e.strip("|").split("||")
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += words[w]
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((k + 1, a, b, a + b, c))
        enc = {
            w: e.replace(f"|{a}||{b}|", f"|{a}{b}|") for w, e in enc.items()
        }
    return merges


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=5),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_bpe_training_matches_python_replay(spark, docs, tmp_path_factory):
    """Distributed BPE training must learn the exact same merge table as
    the sequential textbook algorithm on any corpus — including
    overlapping pair positions (aaa), tie-breaks, words collapsing to a
    single symbol, and corpora that run out of pairs before the round
    budget."""
    from transit_feed_etl_spark.queries import bpe as B

    texts = [" ".join(ws) for ws in docs]
    sf_dir = str(tmp_path_factory.mktemp("bpe_sf"))
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")

    got = [
        (r["round"], r["pair_a"], r["pair_b"], r["merged"], r["cnt"])
        for r in B.bpe_merge_training(spark, sf_dir).collect()
    ]
    assert got == _replay_bpe_merges(texts, B._ROUNDS)


# --- batch sessionizer vs streaming session_window twin ---------------------


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 3 * 3600)),
        min_size=1,
        max_size=16,
    )
)
def test_batch_and_streaming_sessionizers_agree(spark, events, tmp_path_factory):
    """The lag-gap batch sessionizer and its streaming twin
    (F.session_window, streaming/windows.py::session_windows) must
    carve IDENTICAL sessions from any event pattern — same starts, same
    event counts, and streaming end = batch end + gap (session_window
    ends are exclusive last+gap by definition). Empirically pinned:
    both merge an exactly-gap-separated pair (boundary inclusive)."""
    from transit_feed_etl_spark.queries.windows import sessionize_events
    from transit_feed_etl_spark.streaming.windows import session_windows

    base = 1_700_000_000
    to_ts = lambda s: datetime.fromtimestamp(base + s, tz=timezone.utc)  # noqa: E731
    rows = [(i, to_ts(s), u, 1.0) for i, (u, s) in enumerate(events)]
    sf_dir = str(tmp_path_factory.mktemp("sess_twin_sf"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    df.write.parquet(f"{sf_dir}/events.parquet")

    batch = {
        (r["user_id"], r["session_start"].timestamp()): (
            r["n_events"],
            r["session_end"].timestamp(),
        )
        for r in sessionize_events(spark, sf_dir).collect()
    }
    stream_twin = {
        (r["user_id"], r["session_start"].timestamp()): (
            r["n_events"],
            r["session_end"].timestamp() - 1800.0,
        )
        for r in session_windows(df, gap="30 minutes").collect()
    }
    assert batch == stream_twin


# --- blocked cosine kernel vs numpy direct ----------------------------------


@settings(**SETTINGS)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-2, 2, allow_nan=False, width=32), min_size=4, max_size=4
        ),
        min_size=2,
        max_size=10,
    ),
    threshold=st.sampled_from([-1.0, 0.0, 0.5]),
    n_blocks=st.sampled_from([1, 2, 3]),
)
def test_blocked_cosine_pairs_match_numpy(spark, vecs, threshold, n_blocks):
    """operators/vectors.py tiling must be invisible in the results: for
    any vectors and ANY block count, the pair set equals a direct numpy
    all-pairs cosine (tiles change task shape, never scores), with raw
    float64 scores agreeing to 1e-12."""
    import numpy as np

    from transit_feed_etl_spark.operators.vectors import blocked_cosine_pairs

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vid long, embedding array<double>",
    )
    got = {
        (r["id_a"], r["id_b"]): r["cos_raw"]
        for r in blocked_cosine_pairs(
            df, "vid", "embedding", min_raw_score=threshold, n_blocks=n_blocks
        ).collect()
    }
    m = np.array(vecs, dtype=np.float64)
    want = {}
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            na, nb = np.linalg.norm(m[i]), np.linalg.norm(m[j])
            if na == 0 or nb == 0:
                continue  # kernel's zero-norm guard drops these
            c = float(m[i] @ m[j] / (na * nb))
            if c >= threshold:
                want[(i, j)] = c
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12, (k, got[k], v)


# --- gap fill / forward fill vs pure-Python replay ---------------------------


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2), st.integers(0, 30), st.integers(-5, 5)
        ),
        min_size=1,
        max_size=15,
    )
)
def test_gap_fill_matches_python_replay(spark, events, tmp_path_factory):
    """Grid densification + forward fill must agree with the sequential
    definition for any sparse event pattern: multi-event minutes sum,
    leading grid minutes before the first observation keep NULL, gaps
    carry the last observed sum, per-user bounds differ."""
    from transit_feed_etl_spark.queries.time_windows import gap_fill_forward_fill

    base = 1_700_000_040  # minute-aligned epoch
    rows = [
        (i, datetime.fromtimestamp(base + m * 60 + 7, tz=timezone.utc), u, float(v))
        for i, (u, m, v) in enumerate(events)
    ]
    sf_dir = str(tmp_path_factory.mktemp("gapfill_sf"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    ).write.parquet(f"{sf_dir}/events.parquet")

    got = {
        (r["user_id"], int((r["minute_ts"].timestamp() - base) // 60)): (
            r["n_events"],
            r["filled_sum"],
        )
        for r in gap_fill_forward_fill(spark, sf_dir).collect()
    }

    want = {}
    for u in {u for u, _, _ in events}:
        per: dict[int, list[int]] = {}
        for eu, m, v in events:
            if eu == u:
                per.setdefault(m, []).append(v)
        filled = None
        for m in range(min(per), max(per) + 1):
            if m in per:
                filled = float(sum(per[m]))
                n = len(per[m])
            else:
                n = 0
            want[(u, m)] = (n, filled)
    assert got == want


# --- Morton code vs pure-Python bit interleave -------------------------------


@settings(**SETTINGS)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(-200, 200, allow_nan=False),
            st.floats(-100, 100, allow_nan=False),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_morton_code_matches_python_bit_interleave(spark, pts):
    """The unrolled Catalyst Morton expression must be BIT-EXACT with
    the reference interleave for any coordinates, including out-of-range
    values (clamped) and quantization-boundary floats — the z-order
    layout and its file-pruning guarantees ride on these exact codes."""
    import math

    from transit_feed_etl_spark.pipeline.zorder import MORTON_BITS, morton_code

    def py_morton(lon: float, lat: float) -> int:
        def q(v: float, lo: float, hi: float) -> int:
            n = (1 << MORTON_BITS) - 1
            v = min(max(v, lo), hi)
            return math.floor((v - lo) / (hi - lo) * n)

        qx, qy = q(lon, -180.0, 180.0), q(lat, -90.0, 90.0)
        code = 0
        for i in range(MORTON_BITS):
            code |= ((qx >> i) & 1) << (2 * i)
            code |= ((qy >> i) & 1) << (2 * i + 1)
        return code

    df = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in enumerate(pts)],
        "i long, lon double, lat double",
    )
    got = {
        r["i"]: r["code"]
        for r in df.select("i", morton_code("lon", "lat").alias("code")).collect()
    }
    want = {i: py_morton(lon, lat) for i, (lon, lat) in enumerate(pts)}
    assert got == want
