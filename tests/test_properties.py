"""Property-based tests (hypothesis) for load-bearing key expressions."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.functions.keys import (
    WEATHER_OBS_OFFSET_SECONDS,
    hour_bucket_epoch,
    user_agg_id,
)

# Timestamps across DST boundaries, leap day, year ends, fractional seconds.
TS = st.datetimes(
    min_value=datetime.datetime(2019, 1, 1),
    max_value=datetime.datetime(2021, 12, 31),
).map(lambda d: d.replace(microsecond=d.second * 10101 % 1000000))


@settings(max_examples=20, deadline=None)
@given(st.lists(TS, min_size=1, max_size=24, unique=True))
def test_hour_bucket_matches_reference_string_slice(spark, batch):
    """Our idiomatic J2 key (date_trunc+unix_seconds-540) must equal the
    reference's string-slice trick: unix_timestamp of the first 13 chars of
    the timestamp string + ':00:00' minus 540 (spark_elt_emr.py:79), for
    every timestamp — including fractional seconds and boundary hours."""
    df = spark.createDataFrame(
        [(t.strftime("%Y-%m-%d %H:%M:%S.%f"),) for t in batch], "starttime string"
    )
    ts = F.to_timestamp("starttime")
    ours = hour_bucket_epoch(ts)
    reference = (
        F.unix_timestamp(
            F.to_timestamp(F.concat(F.substring("starttime", 0, 13), F.lit(":00:00")))
        )
        - WEATHER_OBS_OFFSET_SECONDS
    )
    mismatch = df.select(ours.alias("a"), reference.alias("b")).where(
        F.col("a") != F.col("b")
    )
    assert mismatch.count() == 0


@settings(max_examples=15, deadline=None)
@given(
    st.one_of(st.none(), st.sampled_from(["Subscriber", "Customer"])),
    st.one_of(st.none(), st.sampled_from(["0", "1", "2"])),
    st.one_of(st.none(), st.sampled_from(["1950", "1990", "2003"])),
)
def test_user_agg_id_null_propagation(spark, usertype, gender, birth_year):
    """concat (not concat_ws): any NULL component nulls the whole key."""
    df = spark.createDataFrame(
        [(usertype, gender, birth_year)], "u string, g string, b string"
    )
    got = df.select(
        user_agg_id(F.col("u"), F.col("g"), F.col("b")).alias("k")
    ).first()["k"]
    if None in (usertype, gender, birth_year):
        assert got is None
    else:
        assert got == usertype + gender + birth_year


INTERVAL = st.tuples(
    st.integers(min_value=0, max_value=50_000_000_000),   # start_us (~14h span)
    st.integers(min_value=0, max_value=12_000_000_000),   # width_us (0..3.3h)
).map(lambda t: (t[0], t[0] + t[1]))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(INTERVAL, min_size=1, max_size=12),
    st.lists(INTERVAL, min_size=1, max_size=12),
)
def test_overlap_join_equals_brute_force(spark, lefts, rights):
    """The grid-bucketed overlap join must emit EXACTLY the brute-force
    pair set — no duplicates from multi-cell co-occurrence, no misses at
    cell boundaries — for arbitrary interval sets (including zero-width
    intervals and spans much longer than one grid cell)."""
    from data_lake_for_citi_bike_trip_spark.operators.intervals import overlap_join

    ldf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(lefts)],
        "l_id bigint, l_start_us bigint, l_end_us bigint",
    )
    rdf = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(rights)],
        "r_id bigint, r_start_us bigint, r_end_us bigint",
    )
    got = sorted(tuple(r) for r in overlap_join(ldf, rdf).collect())
    want = sorted(
        (li, ri)
        for li, (ls, le) in enumerate(lefts)
        for ri, (rs, re) in enumerate(rights)
        if ls <= re and rs <= le
    )
    assert got == want


EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),        # user_id
        st.integers(min_value=0, max_value=50),       # minute offset
        st.sampled_from(["error", "purchase", "click", "view"]),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None)
@given(EVENTS)
def test_cep_sequence_matches_python_reference(spark, rows):
    """cep_sequence_matches must agree with a direct per-user Python
    replay on arbitrary small event streams (ties, adjacent starts,
    forbid==start, empty users all included)."""
    from data_lake_for_citi_bike_trip_spark.operators import behavior

    data = [
        (i, u, m * 60_000_000, t) for i, (u, m, t) in enumerate(rows)
    ]
    events = spark.createDataFrame(
        data, "event_id bigint, user_id bigint, us bigint, event_type string"
    ).select(
        "event_id", F.timestamp_micros("us").alias("ts"), "user_id", "event_type"
    )
    got = {
        r.user_id: (r.n_matched_starts, r.n_end_events)
        for r in behavior.cep_sequence_matches(
            events, "error", "purchase", ("error",), within_minutes=10
        ).collect()
    }
    # python reference: for each error, window ends at min(start+10m,
    # next error in (us, id) order); count purchases in (s, end]
    within = 10 * 60_000_000
    expect = {}
    by_user = {}
    for eid, u, us, t in data:
        by_user.setdefault(u, []).append((us, eid, t))
    for u, evs in by_user.items():
        evs.sort()
        errors = [(us, eid) for us, eid, t in evs if t == "error"]
        purch = [us for us, eid, t in evs if t == "purchase"]
        n_starts = n_ends = 0
        for i, (s_us, s_id) in enumerate(errors):
            end = min(
                s_us + within,
                errors[i + 1][0] if i + 1 < len(errors) else 2**62,
            )
            hits = sum(1 for p in purch if s_us < p <= end)
            if hits:
                n_starts += 1
                n_ends += hits
        if n_starts:
            expect[u] = (n_starts, n_ends)
    assert got == expect, (got, expect, data)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),          # user
            st.integers(min_value=0, max_value=10_000),     # start second
        ),
        min_size=1,
        max_size=40,
    )
)
def test_interval_union_equals_brute_force(spark, raw):
    """Window island algebra == brute-force per-second coverage union,
    for arbitrary per-user interval sets (dup starts included)."""
    from data_lake_for_citi_bike_trip_spark.operators import intervals

    dur = 60  # 1-minute intervals -> dur_minutes=1
    rows = [
        (i, s * 1_000_000, u, "click", 1.0)
        for i, (u, s) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, us bigint, user_id bigint, event_type string, value double",
    ).select(
        "event_id", F.timestamp_micros("us").alias("ts"),
        "user_id", "event_type", "value",
    )
    got = {
        r.user_id: (r.n_islands, r.covered_us)
        for r in intervals.interval_union_length(df, dur_minutes=1).collect()
    }
    from collections import defaultdict

    per_user = defaultdict(set)
    for u, s in raw:
        per_user[u].update(range(s, s + dur))  # covered seconds
    for u, secs in per_user.items():
        islands = 0
        prev = None
        for x in sorted(secs):
            if prev is None or x > prev + 1:
                islands += 1
            prev = x
        assert got[u] == (islands, len(secs) * 1_000_000), (u, raw)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["click", "purchase"]),
            st.integers(min_value=1, max_value=400),  # cents magnitude
        ),
        min_size=1,
        max_size=30,
    )
)
def test_capped_running_sum_matches_python_replay(spark, seq):
    """The Arrow grouped-map walk == a direct Python replay of the
    clamp recurrence for arbitrary credit/debit sequences."""
    from data_lake_for_citi_bike_trip_spark.operators import behavior

    cap = 500
    rows = [
        (i, i * 1_000_000, 1, et, c / 100.0) for i, (et, c) in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, us bigint, user_id bigint, event_type string, value double",
    ).select(
        "event_id", F.timestamp_micros("us").alias("ts"),
        "user_id", "event_type", "value",
    )
    r = behavior.capped_running_sum(df, cap=cap).first()
    bal, hi, lo = 0, 0, 0
    for et, c in seq:
        d = -3 * c if et == "purchase" else c
        b = bal + d
        if b > cap:
            bal, hi = cap, hi + 1
        elif b < 0:
            bal, lo = 0, lo + 1
        else:
            bal = b
    assert (r.final_balance, r.n_sat_hi, r.n_sat_lo) == (bal, hi, lo), seq
