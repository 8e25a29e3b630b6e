"""Time-series regularization semantics: spine density, zero-fill,
interpolation blends and edge fills."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_lake_for_citi_bike_trip_spark.operators import staging, timeseries
from data_lake_for_citi_bike_trip_spark.sources.registry import load_table


def _trips(spark, sf_dir):
    return staging.trips(load_table(spark, sf_dir, "events"))


def test_gap_fill_is_dense_and_preserves_observations(spark, sf_dir):
    trips = _trips(spark, sf_dir)
    filled = timeseries.gap_fill_daily(trips).cache()
    spans = filled.groupBy("station").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("day").alias("mn"),
        F.max("day").alias("mx"),
    )
    for r in spans.collect():
        mn = datetime.date.fromisoformat(r.mn)
        mx = datetime.date.fromisoformat(r.mx)
        assert r.n == (mx - mn).days + 1  # dense: one row per calendar day
    # observed rows reproduce the raw daily counts exactly
    raw = {
        (r.station, str(r.day)): r.rides
        for r in timeseries.daily_counts(trips).collect()
    }
    obs = {(r.station, r.day): r.rides for r in filled.where("observed = 1").collect()}
    assert obs == raw
    assert filled.where("observed = 0").agg(F.max("rides")).first()[0] in (0, None)


def test_interpolation_blend_and_edges(spark):
    # one station, days 1..7, holes on day 5 (mod rule) plus an edge hole:
    # rides on observed days: d1=10, d2=20, d3=30, d4=40, d6=60, d7=70
    rows = []
    for d, n in [(1, 10), (2, 20), (3, 30), (4, 40), (5, 99), (6, 60), (7, 70)]:
        for i in range(n):
            rows.append((f"2024-03-0{d} 08:00:00", i))
    df = spark.createDataFrame(rows, "starttime string, i int").select(
        F.to_timestamp("starttime").alias("starttime"),
        F.lit("S1").alias("start_station_id"),
    )
    out = {
        r.day: (r.observed_rides, r.value_e4)
        for r in timeseries.interpolate_daily(df, hole_mod=5).collect()
    }
    assert out["2024-03-04"] == (40, 400000)
    # day 5 is a hole regardless of its actual count: blend of 40 and 60
    assert out["2024-03-05"] == (-1, 500000)
    assert out["2024-03-06"] == (60, 600000)


def test_interpolation_edge_fill(spark):
    # span starting at a hole day (the 5th): back-fill from the next obs
    rows = []
    for d, n in [(5, 50), (6, 60), (7, 70)]:
        for i in range(n):
            rows.append((f"2024-03-0{d} 08:00:00", i))
    df = spark.createDataFrame(rows, "starttime string, i int").select(
        F.to_timestamp("starttime").alias("starttime"),
        F.lit("S1").alias("start_station_id"),
    )
    out = {
        r.day: r.value_e4
        for r in timeseries.interpolate_daily(df, hole_mod=5).collect()
    }
    assert out["2024-03-05"] == 600000  # back-filled from day 6


def test_trend_slope_exact_rational(spark):
    # station A: days 0..3 rides 1,3,5,7 -> slope exactly 2 (2_000_000 e6)
    # station B: rides 7,5,3,1 -> slope exactly -2 (truncation sign path)
    rows = []
    for d, (na, nb) in enumerate([(1, 7), (3, 5), (5, 3), (7, 1)]):
        day = f"1970-01-0{d+1} 08:00:00"
        rows += [(day, "A")] * na + [(day, "B")] * nb
    df = spark.createDataFrame(rows, "starttime string, start_station_id string").select(
        F.to_timestamp("starttime").alias("starttime"), "start_station_id"
    )
    out = {r.station: r.slope_e6 for r in timeseries.trend_slope(df).collect()}
    assert out == {"A": 2_000_000, "B": -2_000_000}


def test_cusum_closed_form_equals_textbook_recursion(spark, sf_dir):
    """The two-window closed form must reproduce S_t = max(0, S_{t-1} +
    dev_t) exactly, station by station, day by day."""
    from collections import defaultdict

    from data_lake_for_citi_bike_trip_spark.operators import staging, timeseries
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    trips = staging.trips(staging.rebalanced(load_table(spark, sf_dir, "events")))
    daily = timeseries.daily_counts(trips).collect()
    series = defaultdict(list)
    for r in daily:
        series[r.station].append((r.day, r.rides))
    expect = {}
    for st, rows in series.items():
        rows.sort()
        n, total = len(rows), sum(x for _, x in rows)
        s, mx, alarms, first = 0, 0, 0, None
        for day, x in rows:
            s = max(0, s + (n * x - total))
            mx = max(mx, s)
            if s > total:
                alarms += 1
                first = first or str(day)
        expect[st] = (n, mx, alarms, first)
    got = {
        r.station: (r.n_days, r.max_cusum, r.n_alarms, r.first_alarm)
        for r in timeseries.cusum_changepoints(trips).collect()
    }
    assert got == expect


def test_ewma_daily_equals_truncated_weighted_recursion(spark, sf_dir):
    from collections import defaultdict

    from data_lake_for_citi_bike_trip_spark.operators import staging, timeseries
    from data_lake_for_citi_bike_trip_spark.sources.registry import load_table

    trips = staging.trips(staging.rebalanced(load_table(spark, sf_dir, "events")))
    daily = timeseries.daily_counts(trips).collect()
    series = defaultdict(list)
    for r in daily:
        series[r.station].append((r.day, r.rides))
    expect = {}
    for st, rows in series.items():
        rows.sort()
        for t in range(len(rows)):
            frame = [x for _, x in rows[max(0, t - 19) : t + 1]]
            num = sum(x * (1 << i) for i, x in enumerate(frame))
            den = (1 << len(frame)) - 1
            expect[(st, str(rows[t][0]))] = (1000 * num) // den
    got = {
        (r.station, r.day): r.ewma_milli
        for r in timeseries.ewma_daily(trips).collect()
    }
    assert got == expect


def test_theil_sen_is_outlier_robust_where_ols_is_not(spark):
    """One corrupted day shifts the OLS slope but leaves the pairwise
    median untouched — the estimator's defining property."""
    import datetime

    from data_lake_for_citi_bike_trip_spark.operators import timeseries

    def mk(rows):
        return spark.createDataFrame(
            [
                (
                    "S",
                    datetime.datetime(2024, 1, 1 + d, 12, 0, 0),
                    "u",
                    str(i),
                    "Subscriber",
                    1.0,
                    "S",
                    "E",
                    None,
                    None,
                )
                for i, (d, reps) in enumerate(rows)
                for _ in range(reps)
            ],
            "start_station_id string, starttime timestamp, bikeid string,"
            " tripduration string, usertype string, value double,"
            " s2 string, end_station_id string, gender string, birth_year string",
        )

    clean = [(d, 10 + d) for d in range(10)]  # slope exactly +1/day
    spiked = list(clean)
    spiked[5] = (5, 100)  # one wild day
    ts_clean = {
        r.station: r.median_slope_e6
        for r in timeseries.theil_sen_slope(mk(clean)).collect()
    }
    ts_spiked = {
        r.station: r.median_slope_e6
        for r in timeseries.theil_sen_slope(mk(spiked)).collect()
    }
    assert ts_clean["S"] == 1_000_000
    assert ts_spiked["S"] == 1_000_000  # median unmoved by the spike
    ols = {
        r.station: r.slope_e6
        for r in timeseries.trend_slope(mk(spiked)).collect()
    }
    assert abs(ols["S"] - 1_000_000) > 100_000  # OLS dragged by it


def test_rolling_median_gaps_shorten_window(spark):
    """A calendar gap larger than the frame must RESET the window (the
    RANGE frame spans day indices, not adjacent rows), and the lower
    median of an even window picks the smaller middle element."""
    from data_lake_for_citi_bike_trip_spark.operators import timeseries

    rows = []
    # type 'a': days 1..4 with counts 10,2,30,4 then a 30-day gap, then 99
    for day, n in [(1, 10), (2, 2), (3, 30), (4, 4), (40, 99)]:
        for i in range(n):
            rows.append((len(rows), day * 86400_000_000, 1, "a"))
    events = spark.createDataFrame(
        [(eid, us, u, et) for eid, us, u, et in rows],
        "event_id bigint, us bigint, user_id bigint, event_type string",
    ).select("event_id", F.timestamp_micros("us").alias("ts"), "user_id", "event_type")
    got = {
        r.day: (r.rolling_median, r.window_days)
        for r in timeseries.rolling_median_daily(events).collect()
    }
    days = sorted(got)
    # windows: [10]=10; [10,2]->2 (lower); [10,2,30]->10; [10,2,30,4]->4
    assert [got[d][0] for d in days] == [10, 2, 10, 4, 99]
    assert got[days[-1]] == (99, 1), "gap must reset the frame"


def _events_from_daily(spark, counts):
    """counts: list of (day_of_jan_2024, event_type, n) -> events df."""
    rows = []
    for day, et, n in counts:
        for i in range(n):
            rows.append((len(rows), (19723 + day - 1) * 86400_000_000 + i, 1, et))
    return spark.createDataFrame(
        rows, "event_id bigint, us bigint, user_id bigint, event_type string"
    ).select(
        "event_id", F.timestamp_micros("us").alias("ts"), "user_id", "event_type"
    )


def test_ols_two_factor_recovers_exact_plane(spark):
    """Counts generated from y = 5 + 2*x1 + 10*weekend have zero
    residual, so Cramer's rule returns the plane EXACTLY (e6 units).
    2024-01-01 is a Monday, so x1 in 0..13 makes days 5,6,12,13 the
    weekend."""
    counts = []
    for x1 in range(14):
        wknd = 1 if x1 % 7 in (5, 6) else 0
        counts.append((x1 + 1, "a", 5 + 2 * x1 + 10 * wknd))
    got = {r.event_type: r for r in timeseries.ols_two_factor(
        _events_from_daily(spark, counts)).collect()}
    r = got["a"]
    assert (r.b0_e6, r.b1_e6, r.b2_e6) == (5_000_000, 2_000_000, 10_000_000)
    assert r.n_days == 14 and r.det > 0


def test_autocorr_alternating_series(spark):
    """2,1,2,1,... daily counts: lag-1 ACF is exactly -1, lag-2 exactly
    +1 (unfilled days would break this — the spine keeps the calendar
    lag honest). A constant series has zero variance and is filtered."""
    counts = [(d, "alt", 2 if d % 2 == 1 else 1) for d in range(1, 11)]
    counts += [(d, "flat", 3) for d in range(1, 11)]
    out = timeseries.autocorr_daily(_events_from_daily(spark, counts))
    got = {(r.event_type, r.lag): r.corr_bp for r in out.collect()}
    assert got[("alt", 1)] == -10000
    assert got[("alt", 2)] == 10000
    assert not any(k[0] == "flat" for k in got), "zero-variance filtered"


def test_autocorr_spine_zero_fills_missing_days(spark):
    """A day with no events is an observed zero: dropping day 2 from a
    three-day series must still pair day1->day2(0) and day2(0)->day3 at
    lag 1 (n_pairs counts calendar adjacency, not row adjacency)."""
    counts = [(1, "g", 4), (3, "g", 4)]
    out = timeseries.autocorr_daily(_events_from_daily(spark, counts))
    rows = {r.lag: r for r in out.collect() if r.event_type == "g"}
    assert rows[1].n_pairs == 2  # (d1,d2) and (d2,d3) with y(d2)=0
    assert rows[1].cov_num == 2 * (4 * 0 + 0 * 4) - (4 + 0) * (0 + 4)


def test_forecast_backtest_perfect_weekly_cycle(spark):
    """A series with exact period 7 backtests to zero error; breaking
    one day puts exactly its |delta| into abs_err."""
    counts = [(d, "w", 10 + (d % 7)) for d in range(1, 22)]  # 3 weeks
    r = {x.event_type: x for x in timeseries.forecast_backtest(
        _events_from_daily(spark, counts)).collect()}["w"]
    assert (r.n_eval, r.abs_err, r.wape_bp) == (14, 0, 0)
    assert r.n_exact == 14

    counts2 = [(d, "w", (10 + (d % 7)) if d != 15 else 99) for d in range(1, 22)]
    r2 = {x.event_type: x for x in timeseries.forecast_backtest(
        _events_from_daily(spark, counts2)).collect()}["w"]
    # day 15 (pred from day 8) wrong by |99-11|, and day 22 doesn't exist;
    # but day 15 also mispredicts nothing else within the span
    assert r2.abs_err == abs(99 - (10 + 15 % 7))
    assert r2.n_exact == 13


def test_seasonal_residual_flags_the_odd_sunday(spark):
    """Mondays always 10, Sundays always 20 except one Sunday at 90:
    after dow-profile removal only the odd Sunday exceeds 3x MAD."""
    counts = []
    for week in range(4):
        counts.append((1 + 7 * week, "s", 10))       # Mondays (Jan 1 2024)
        sun = 7 + 7 * week
        counts.append((sun, "s", 90 if week == 3 else 20))
    out = timeseries.seasonal_residual_anomalies(
        _events_from_daily(spark, counts))
    flagged = sorted(r.day for r in out.collect() if r.flagged)
    assert flagged == ["2024-01-28"]


def test_crosscorr_detects_shifted_series(spark):
    """purchase = click shifted by exactly 2 days: lag-2 correlation
    must be exactly +1 (10000 bp) and lag 0 must be below it."""
    counts = []
    vals = [5, 9, 2, 7, 4, 8, 3, 6, 5, 9, 2, 7]
    for d, v in enumerate(vals, start=1):
        counts.append((d, "click", v))
        if d > 2:
            counts.append((d, "purchase", vals[d - 3]))
    out = {r.lag: r.corr_bp for r in timeseries.crosscorr_daily(
        _events_from_daily(spark, counts)).collect()}
    # at lag 2 every pair (a_t, b_{t+2}) is an exact value match -> +1
    assert out[2] == 10000
    assert max(out, key=lambda k: out[k]) == 2
    assert out[0] < 10000


def test_mann_kendall_monotonic_and_tied(spark):
    """Strictly increasing 4-day series: S=6, var18=156, z_e6 pinned
    from the closed form; an all-tied series is filtered (var18=0)."""
    import math

    from data_lake_for_citi_bike_trip_spark.operators import timeseries as tsm

    rows = []
    # type 'up': values 1,2,3,4 cents across 4 days
    for d, v in enumerate([0.01, 0.02, 0.03, 0.04]):
        rows.append((d, f"2024-01-0{d+1} 00:00:00", 1, "up", v))
    # type 'flat': identical every day -> tie_term == n term -> filtered
    for d in range(4):
        rows.append((10 + d, f"2024-01-0{d+1} 00:00:00", 1, "flat", 0.05))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).select("event_id", F.to_timestamp("ts").alias("ts"),
             "user_id", "event_type", "value")
    out = {r.event_type: r for r in tsm.mann_kendall_trend(df).collect()}
    assert "flat" not in out
    r = out["up"]
    assert r.s_stat == 6 and r.n_days == 4 and r.var18 == 156
    assert r.z_e6 == math.floor(1_000_000.0 * (5 / math.sqrt(156 / 18.0)))


def test_kaplan_meier_hand_computed(spark):
    """3 users enter day 0-grain: one converts at t=1, one at t=2,
    one censored at t=2 -> risk table n=3,2 and millibit logs of
    2/3 then 1/2."""
    import math

    from data_lake_for_citi_bike_trip_spark.operators import timeseries as tsm

    rows = [
        # user 1: first event Jan 1, purchase Jan 2 (t=1, observed)
        (0, "2024-01-01 08:00:00", 1, "view", 0.0),
        (1, "2024-01-02 08:00:00", 1, "purchase", 1.0),
        # user 2: first Jan 1, purchase Jan 3 (t=2, observed)
        (2, "2024-01-01 09:00:00", 2, "view", 0.0),
        (3, "2024-01-03 09:00:00", 2, "purchase", 1.0),
        # user 3: first Jan 1, never purchases; censored at max day
        # Jan 3 (t=2)
        (4, "2024-01-01 10:00:00", 3, "view", 0.0),
        (5, "2024-01-03 10:00:00", 3, "view", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr("event_id", "to_timestamp(ts) AS ts", "user_id",
                 "event_type", "value")
    out = {r.t: r for r in tsm.kaplan_meier(df).collect()}
    assert out[1].n_at_risk == 3 and out[1].n_events == 1
    assert out[2].n_at_risk == 2 and out[2].n_events == 1
    mb1 = math.floor(1000.0 * math.log2(2 / 3))
    mb2 = math.floor(1000.0 * math.log2(1 / 2))
    assert out[1].step_log2_mb == mb1
    assert out[2].surv_log2_mb == mb1 + mb2


def test_isotonic_fit_monotone_and_pools_violations(spark):
    """Series 3,1,2 (means) pools the first two days to 2.0 and keeps
    day 3; the fit is non-decreasing and equals hand-PAVA."""
    rows = []
    eid = 0
    # day1: one event value 3.00; day2: one 1.00; day3: one 2.00
    for d, v in [(1, 3.00), (2, 1.00), (3, 2.00)]:
        rows.append((eid, f"2024-01-0{d} 10:00:00", 1, "click", v)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr("event_id", "to_timestamp(ts) AS ts", "user_id",
                 "event_type", "value")
    from data_lake_for_citi_bike_trip_spark.operators import timeseries as tsm
    out = sorted(
        (r.day, r.fit_e2) for r in tsm.isotonic_daily_fit(df).collect()
    )
    # PAVA: [300,100,200] -> pool(300,100)=200,200 -> [200,200,200]
    assert [f for _, f in out] == [20000, 20000, 20000]
    fits = [f for _, f in out]
    assert fits == sorted(fits)


def test_isotonic_fit_already_monotone_is_identity(spark):
    rows = []
    eid = 0
    for d, v in [(1, 1.00), (2, 2.00), (3, 5.00)]:
        rows.append((eid, f"2024-01-0{d} 10:00:00", 1, "click", v)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr("event_id", "to_timestamp(ts) AS ts", "user_id",
                 "event_type", "value")
    from data_lake_for_citi_bike_trip_spark.operators import timeseries as tsm
    out = sorted(
        (r.day, r.fit_e2) for r in tsm.isotonic_daily_fit(df).collect()
    )
    assert [f for _, f in out] == [10000, 20000, 50000]


def test_circadian_sharp_peak_vs_uniform(spark):
    """Events all at noon -> R ~ 1 and mean hour 12; events spread
    every 6 hours -> R ~ 0."""
    rows = []
    eid = 0
    for i in range(8):
        rows.append((eid, f"2024-01-0{1 + i % 4} 12:00:00", 1,
                     "peak", 1.0)); eid += 1
    for i, h in enumerate(["00", "06", "12", "18"] * 2):
        rows.append((eid, f"2024-01-0{1 + i % 4} {h}:00:00", 1,
                     "flat", 1.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr("event_id", "to_timestamp(ts) AS ts", "user_id",
                 "event_type", "value")
    from data_lake_for_citi_bike_trip_spark.operators import timeseries as tsm
    out = {r.event_type: r for r in tsm.circadian_profile(df).collect()}
    assert out["peak"].r_e4 >= 9999
    assert out["peak"].mean_hour_e2 == 1200
    assert out["flat"].r_e4 <= 10


def test_runs_test_alternating_vs_trending(spark):
    """Perfect alternation maximizes runs (z > 0); a monotone walk
    has exactly... strictly increasing moves -> all ups -> filtered;
    up/down alternation over 9 days pins R = 8."""
    rows = []
    eid = 0
    # values alternate 1.00, 2.00 daily -> moves alternate +,- (8 moves)
    for d in range(1, 10):
        rows.append((eid, f"2024-01-0{d}" if d < 10 else f"2024-01-{d}",
                     1.0 if d % 2 else 2.0)); eid += 1
    df = spark.createDataFrame(
        [(i, f"{day} 10:00:00", 1, "click", v)
         for i, (day, v) in enumerate(
             (f"2024-01-0{d}", 1.0 if d % 2 else 2.0)
             for d in range(1, 10))],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).selectExpr("event_id", "to_timestamp(ts) AS ts", "user_id",
                 "event_type", "value")
    from data_lake_for_citi_bike_trip_spark.operators import timeseries as tsm
    r = {x.event_type: x for x in tsm.runs_test(df).collect()}["click"]
    assert (r.n_up, r.n_down, r.r_runs) == (4, 4, 8)
    assert r.z_e6 > 0


def test_durbin_watson_alternation_reads_high(spark):
    """Alternating residuals push DW toward 4; a flat series is
    filtered (den = 0)."""
    df = spark.createDataFrame(
        [(i, f"2024-01-0{d} 10:00:00", 1, "click", 1.0)
         for i, d in enumerate([1, 1, 2, 3, 3, 4, 5, 5, 6, 7, 7, 8])],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).selectExpr("event_id", "to_timestamp(ts) AS ts", "user_id",
                 "event_type", "value")
    # daily counts: 2,1,2,1,2,1,2,1 -> residuals alternate -> DW ~ 4ish
    from data_lake_for_citi_bike_trip_spark.operators import timeseries as tsm
    r = tsm.durbin_watson(df).collect()[0]
    assert r.dw_e4 > 20000  # beyond 2.0: negative serial correlation


def test_fano_factor_poisson_vs_bursty(spark):
    """Constant daily counts -> Fano 0; a bursty series reads far
    above 1e4."""
    rows = []
    eid = 0
    # 'flat': 2 events per day for 4 days
    for d in range(1, 5):
        for _ in range(2):
            rows.append((eid, f"2024-01-0{d} 10:00:00", 1, "flat", 1.0))
            eid += 1
    # 'bursty': 8 events day 1, none after (single active day -> n=1
    # filtered? n=1 gives var 0) — use 7,1 across two days
    for d, k in [(1, 7), (2, 1)]:
        for _ in range(k):
            rows.append((eid, f"2024-01-0{d} 10:00:00", 1, "bursty", 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr("event_id", "to_timestamp(ts) AS ts", "user_id",
                 "event_type", "value")
    from data_lake_for_citi_bike_trip_spark.operators import timeseries as tsm
    out = {r.event_type: r.fano_e4 for r in tsm.fano_factor(df).collect()}
    assert out["flat"] == 0
    # bursty: n=2, s1=8, s2=50 -> var*n = 2*50-64 = 36; mean*n = 16
    # fano = 36/16 = 2.25 -> 22500
    assert out["bursty"] == 22500


def test_revenue_var_pinned(spark):
    """Daily revenue 300,100,250,50: losses 200,200 -> p95 = 200."""
    rows = []
    eid = 0
    for d, v in [(1, 3.0), (2, 1.0), (3, 2.5), (4, 0.5)]:
        rows.append((eid, f"2024-01-0{d} 10:00:00", 1, "click", v))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr("event_id", "to_timestamp(ts) AS ts", "user_id",
                 "event_type", "value")
    from data_lake_for_citi_bike_trip_spark.operators import timeseries as tsm
    r = {x.event_type: x for x in tsm.revenue_var(df).collect()}["click"]
    assert r.n_down_days == 2 and r.var95_cents == 200
