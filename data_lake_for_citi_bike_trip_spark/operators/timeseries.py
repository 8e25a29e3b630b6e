"""Time-series regularization: date spines, gap filling, interpolation.

The reference's hourly weather join (spark_elt_emr.py:62-79) assumes a
dense series and silently drops trips in unobserved hours; a real
time-series layer *builds* the dense series. These operators turn a
ragged per-key event stream into a regular grid:

- ``daily_counts``      — per-key daily observation counts.
- ``gap_fill_daily``    — per-key date spine (``sequence`` + ``explode``)
                          left-joined onto the observed days; missing
                          days become explicit zero rows.
- ``interpolate_daily`` — linear interpolation across missing days in
                          integer ten-thousandths (e4), with forward/
                          backward fill at the edges.

Scale design (100 TB): the spine is generated FROM the aggregated
per-key min/max span — never a driver-side date loop — so it is one
grouped aggregate plus one ``explode`` (rows out = sum of span lengths,
the size of the answer itself). The gap-fill join and every window share
one hash partitioning on the key; days-per-key is bounded (years =
thousands of rows), so per-key windows never skew a partition.

Cross-engine exactness: interpolated means are emitted as integer e4
units — ``(10000 * (prev*(gap-i) + next*i)) div gap`` — numerators are
non-negative BIGINTs so truncating (Spark ``div``) and flooring (DuckDB
``//``) division agree; no float rounding for an oracle to disagree with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_counts(trips: DataFrame) -> DataFrame:
    """Per-station daily ride counts with a real DATE column (the ragged
    input to the regularizers)."""
    return trips.groupBy(
        F.col("start_station_id").alias("station"),
        F.to_date("starttime").alias("day"),
    ).agg(F.count(F.lit(1)).alias("rides"))


def _gap_filled(trips: DataFrame) -> DataFrame:
    """Dense per-station daily series (day kept as a real DATE): one
    groupBy builds each key's [min, max] span, one ``sequence`` +
    ``explode`` expands it (no extra shuffle — spans are already per-key
    rows), and the left join back onto ``daily`` reuses the same
    key+day partitioning."""
    daily = daily_counts(trips)
    spans = daily.groupBy("station").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    spine = spans.select(
        "station",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day"),
    )
    return spine.join(daily, ["station", "day"], "left").select(
        "station",
        "day",
        F.coalesce("rides", F.lit(0)).alias("rides"),
        F.when(F.col("rides").isNotNull(), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("observed"),
    )


def gap_fill_daily(trips: DataFrame) -> DataFrame:
    """Contract form of ``_gap_filled``: unobserved days appear with
    ``rides = 0`` and ``observed = 0``; day emitted as a string."""
    return _gap_filled(trips).select(
        "station",
        F.col("day").cast("string").alias("day"),
        "rides",
        "observed",
    )


def interpolate_daily(trips: DataFrame, hole_mod: int = 5) -> DataFrame:
    """Linear interpolation over a daily series with holes, in exact
    integer e4 units.

    Holes are injected deterministically (days where ``day(date) %
    hole_mod == 0`` are treated as unobserved) so the operator is
    testable against an oracle without random masks. For each hole the
    value is the linear blend of the nearest observed neighbors:
    ``(prev*(gap-i) + next*i) / gap`` at offset i, emitted as
    ``value_e4``; holes before the first / after the last observation
    forward/backward fill.

    Two ignore-nulls window passes (prev/next value + day) over the same
    station partitioning — one shuffle total, then pure expressions.
    """
    base = _gap_filled(trips).select(
        "station",
        "day",
        F.when(F.dayofmonth("day") % hole_mod != 0, F.col("rides")).alias("obs"),
    )
    wb = (
        Window.partitionBy("station")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("station")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("obs").isNotNull(), F.col("day"))
    stepped = base.select(
        "station",
        "day",
        "obs",
        F.last("obs", ignorenulls=True).over(wb).alias("prev_v"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("prev_d"),
        F.first("obs", ignorenulls=True).over(wf).alias("next_v"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("next_d"),
    )
    blend = F.expr(
        "(10000 * (prev_v * (datediff(next_d, prev_d) - datediff(day, prev_d))"
        " + next_v * datediff(day, prev_d))) div datediff(next_d, prev_d)"
    )
    value_e4 = (
        F.when(F.col("obs").isNotNull(), 10000 * F.col("obs"))
        .when(F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(), blend)
        .when(F.col("prev_v").isNotNull(), 10000 * F.col("prev_v"))
        .otherwise(10000 * F.col("next_v"))
    )
    return stepped.select(
        "station",
        F.col("day").cast("string").alias("day"),
        F.coalesce("obs", F.lit(-1)).alias("observed_rides"),
        value_e4.cast("bigint").alias("value_e4"),
    )


def moving_average_range_frame(trips: DataFrame, days: int = 7) -> DataFrame:
    """Trailing window by VALUE RANGE, not row count: sum/count of rides
    over the last ``days`` CALENDAR days per station — on sparse series
    (missing days) a ROWS frame silently stretches over gaps while a
    RANGE frame respects them; both semantics are needed and this is the
    RANGE half (``analytics.moving_average`` is the ROWS half).

    The frame is ``RANGE BETWEEN days-1 PRECEDING AND CURRENT ROW`` over
    an integer day index (datediff from epoch), so frame bounds are plain
    integer arithmetic in any engine. Mean emitted in exact e4 units.
    One shuffle on station; the window sort is per-key."""
    daily = daily_counts(trips).withColumn(
        "day_idx", F.datediff("day", F.lit("1970-01-01")).cast("bigint")
    )
    w = (
        Window.partitionBy("station")
        .orderBy("day_idx")
        .rangeBetween(-(days - 1), Window.currentRow)
    )
    return daily.select(
        "station",
        F.col("day").cast("string").alias("day"),
        "rides",
        F.sum("rides").over(w).alias("window_rides"),
        F.count(F.lit(1)).over(w).alias("window_days_observed"),
    ).withColumn(
        "avg_rides_e4",
        F.expr("(10000 * window_rides) div window_days_observed"),
    )


def trend_slope(trips: DataFrame, min_days: int = 2) -> DataFrame:
    """Per-station linear-regression slope of daily rides over time,
    EXACT to the emitted unit: the OLS closed form

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    evaluated entirely in BIGINT sums (x = epoch-day index, y = rides)
    and emitted as integer millionths (slope_e6, truncated toward zero
    — the numerator/denominator also ship for callers wanting the exact
    rational). No floats anywhere, so no engine can disagree.

    One grouped aggregate per station — the cheapest possible trend
    detector at 100 TB (map-side partials, no window, no sort)."""
    daily = daily_counts(trips).select(
        "station",
        F.datediff("day", F.lit("1970-01-01")).cast("bigint").alias("x"),
        F.col("rides").alias("y"),
    )
    agg = daily.groupBy("station").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return (
        agg.where(F.col("n") >= min_days)
        .select(
            "station",
            "n",
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("numer"),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("denom"),
        )
        .where(F.col("denom") > 0)
        .withColumn("slope_e6", F.expr("(1000000 * numer) div denom"))
    )


def cusum_changepoints(trips: DataFrame) -> DataFrame:
    """Per-station CUSUM upward-drift detection over the daily ride
    series, INTEGER-exact end to end.

    The textbook recursion S_t = max(0, S_{t-1} + dev_t) is not
    window-expressible directly, but it has an exact closed form:
    S_t = cumsum(dev)_t - min_{j<=t} cumsum(dev)_j — two ordinary
    cumulative windows (running sum + running min), each partitioned by
    station, so the whole detector is one shuffle on the station key and
    two sorted window passes. No recursion, no UDF, no driver loop.

    Deviations are held scale-free in integers: dev_t = n * x_t - total
    (n = observed days, total = total rides for the station), i.e. the
    deviation from the station mean multiplied by n. The alarm threshold
    ``total`` then corresponds to one mean-day's worth of accumulated
    excess. Emits per station: days observed, max CUSUM statistic,
    alarm-day count, and the first alarm date (NULL when none fires).
    """
    daily = daily_counts(trips)
    stats = daily.groupBy("station").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("rides").alias("total")
    )
    dev = daily.join(stats, "station").select(
        "station",
        "day",
        "n_days",
        "total",
        (F.col("n_days") * F.col("rides") - F.col("total")).alias("dev"),
    )
    w = Window.partitionBy("station").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the prefix-min must include the EMPTY prefix (cum_0 = 0), else a
    # series that rises from day one would lose its first deviation
    cum = dev.withColumn("cum", F.sum("dev").over(w)).withColumn(
        "s",
        F.col("cum")
        - F.least(F.lit(0).cast("long"), F.min("cum").over(w)),
    )
    alarmed = cum.withColumn("alarm", F.col("s") > F.col("total"))
    return alarmed.groupBy("station").agg(
        F.max("n_days").alias("n_days"),
        F.max("s").alias("max_cusum"),
        F.sum(F.col("alarm").cast("long")).cast("long").alias("n_alarms"),
        F.min(F.when(F.col("alarm"), F.col("day")))
        .cast("string")
        .alias("first_alarm"),
    )


def ewma_daily(trips: DataFrame, span: int = 20) -> DataFrame:
    """Truncated exponentially-weighted moving average of the daily ride
    series, INTEGER-exact (half-decay per day).

    True EWMA is a recursion (S_t = (x_t + S_{t-1})/2) whose float form
    drifts by summation order; the 2^-k weights also vanish below
    machine epsilon after ~50 terms. Truncating at ``span`` terms makes
    it windowable AND exact in integers: collect the frame's values in
    order, weight x_{t-j} by 2^(span-1-j) via an indexed HOF transform,
    and emit the RATIONAL result in milli-units through integer
    division — numerator <= 2^span * max(x) * span bounds well inside
    int64 for span 20.

    Plan shape: one shuffle on the station key, one sorted window pass
    (collect_list over a 20-row frame), then per-row HOF arithmetic in
    codegen. No UDF, no recursion, no driver loop.
    """
    daily = daily_counts(trips)
    w = (
        Window.partitionBy("station")
        .orderBy("day")
        .rowsBetween(-(span - 1), Window.currentRow)
    )
    arr = F.collect_list("rides").over(w)
    return (
        daily.withColumn("arr", arr)
        .select(
            "station",
            F.col("day").cast("string").alias("day"),
            "rides",
            F.expr(
                "(1000 * aggregate(transform(arr, (x, i) -> "
                "x * shiftleft(CAST(1 AS BIGINT), i)), CAST(0 AS BIGINT), "
                "(acc, v) -> acc + v)) div "
                "(shiftleft(CAST(1 AS BIGINT), size(arr)) - 1)"
            ).alias("ewma_milli"),
        )
    )


def dow_seasonality(trips: DataFrame) -> DataFrame:
    """Day-of-week seasonality index per station: how each weekday's
    AVERAGE daily rides compares to the station's overall average, in
    basis points — the normalization step before any seasonal
    adjustment.

    index_bp = (1e4 * dow_total * n_days) div (total * dow_days): the
    ratio of means as one cross-multiplied integer division (both
    factors exact BIGINTs, numerator non-negative). Two grouped
    aggregates sharing the station key, one broadcast-joined totals
    row per station.
    """
    daily = daily_counts(trips).withColumn(
        "dow", (F.dayofweek("day")).cast("long")
    )
    per_dow = daily.groupBy("station", "dow").agg(
        F.count(F.lit(1)).alias("dow_days"),
        F.sum("rides").alias("dow_total"),
    )
    per_station = daily.groupBy("station").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("rides").alias("total")
    )
    return per_dow.join(F.broadcast(per_station), "station").select(
        "station",
        "dow",
        "dow_days",
        "dow_total",
        F.expr("(10000 * dow_total * n_days) div (total * dow_days)").alias(
            "index_bp"
        ),
    )


def theil_sen_slope(trips: DataFrame, max_days: int = 64) -> DataFrame:
    """Robust per-station trend: the THEIL-SEN estimator — median of
    all pairwise slopes — which a single outlier day cannot move
    (trend_slope above is OLS, minimal but outlier-sensitive; both
    belong in a stats layer).

    Each station's day count is calendar-bounded (~tens), so the
    pairwise explode is O(days^2) PER KEY with a hard ``max_days``
    guard — per-key quadratic over bounded groups, never corpus-wide.
    Slopes are evaluated as floor(1e6 * dy / dx) in ONE double
    expression over exact ints (floor matches DuckDB's // semantics on
    negatives, unlike Spark's truncating div — the reason floor() is
    used here); the lower median is then picked by rank over the total
    order (slope_e6, d1, d2). All engine-identical.
    """
    daily = daily_counts(trips).withColumn(
        "x", F.datediff("day", F.lit("1970-01-01")).cast("long")
    )
    n = daily.groupBy("station").agg(F.count(F.lit(1)).alias("n_days"))
    keyed = daily.join(
        F.broadcast(n.where(F.col("n_days") <= max_days)), "station"
    )
    a = keyed.select(
        "station",
        "n_days",
        F.col("x").alias("x1"),
        F.col("rides").alias("y1"),
    )
    b = keyed.select(
        "station", F.col("x").alias("x2"), F.col("rides").alias("y2")
    )
    pairs = (
        a.join(b, "station")
        .where(F.col("x1") < F.col("x2"))
        .select(
            "station",
            "n_days",
            "x1",
            "x2",
            F.floor(
                F.lit(1_000_000.0)
                * (F.col("y2") - F.col("y1")).cast("double")
                / (F.col("x2") - F.col("x1")).cast("double")
            )
            .cast("long")
            .alias("slope_e6"),
        )
    )
    # n_pairs needs no second Window pass: daily is (station, day)
    # unique by construction (it IS a groupBy on those keys), so the
    # x1 < x2 self-join emits exactly C(n_days, 2) rows per station —
    # n_pairs = n_days * (n_days - 1) div 2 is a per-row expression
    # over the n_days already carried. The unbounded count-over-
    # partition Window this replaces buffered every station's full
    # pair list a second time (guide S2.4 — r16; plan diff:
    # plans/r16/theil_sen_{before,after}.txt, one Window node dropped).
    # Interleaved A/B at sf0.1: a WASH on the bench (1.29-2.10 vs
    # 1.33-1.59 s, pairs are <= C(64,2) rows x 50 stations) — kept for
    # the plan shape, output verified row-identical both forms.
    w = Window.partitionBy("station").orderBy("slope_e6", "x1", "x2")
    ranked = pairs.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_pairs", F.expr("n_days * (n_days - 1) div 2")
    )
    return ranked.where(
        F.col("rk") == F.expr("(n_pairs + 1) div 2")  # lower median
    ).select(
        "station",
        "n_days",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("slope_e6").alias("median_slope_e6"),
    )


def _daily_events(events: DataFrame) -> DataFrame:
    """Per-type daily event counts — the day-grain series the fitting
    operators below consume (one grouped aggregate; map-side partials)."""
    return events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))


def ols_two_factor(events: DataFrame) -> DataFrame:
    """Multiple linear regression — intercept + two features — fitted in
    ONE distributed aggregate via the normal equations, exactly.

    Model per event type: daily_count ~ b0 + b1*day_idx + b2*is_weekend
    (trend + weekly seasonality — the minimal useful multivariate fit).
    The design matrix never materializes: the 3x3 Gram matrix A = X'X
    and the moment vector c = X'y are NINE BIGINT sums (x1 = day index
    relative to the type's first day, x2 = 0/1 weekend flag), reduced
    map-side into one row per type. Cramer's rule then solves A b = c
    with four 3x3 determinants — pure integer arithmetic — and the
    coefficients ship as floor(1e6 * det_i / det) (one deterministic
    IEEE double expression over exact ints, the corr_pairs discipline).

    This is the textbook "ML via sufficient statistics" shape for a
    1000-executor cluster: no iteration, no driver-side matrix, one
    shuffle of ten numbers per key. Overflow headroom: x1 is bounded by
    the calendar span (~1e4 days), x2 by 1, so the largest determinant
    term n*S11*S22 stays inside int64 while daily counts are < ~1e9.

    Determinant > 0 is guaranteed when the series has >= 2 distinct
    day indices on both weekend and weekday rows (Gram matrix positive
    definite); degenerate types are filtered, not divided by zero.
    """
    daily = _daily_events(events)
    d0 = daily.groupBy("event_type").agg(F.min("day").alias("d0"))
    # one row per event TYPE — an enum-bounded dictionary, safe to pin
    base = daily.join(F.broadcast(d0), "event_type").select(
        "event_type",
        F.datediff("day", "d0").cast("long").alias("x1"),
        F.dayofweek("day").isin(1, 7).cast("long").alias("x2"),
        F.col("y").cast("long").alias("y"),
    )
    g = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    det = (
        "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s12 - s11 * s2))"
    )
    det0 = (
        "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
        " + s2 * (s1y * s12 - s11 * s2y))"
    )
    det1 = (
        "(n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
        " + s2 * (s1 * s2y - s1y * s2))"
    )
    det2 = (
        "(n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
        " + sy * (s1 * s12 - s11 * s2))"
    )

    def coef(num: str) -> str:
        return (
            f"CAST(floor((1000000.0 * CAST({num} AS DOUBLE))"
            f" / CAST({det} AS DOUBLE)) AS BIGINT)"
        )

    return g.where(F.expr(det) > 0).select(
        "event_type",
        F.col("n").alias("n_days"),
        F.expr(det).alias("det"),
        F.expr(coef(det0)).alias("b0_e6"),
        F.expr(coef(det1)).alias("b1_e6"),
        F.expr(coef(det2)).alias("b2_e6"),
    )


def autocorr_daily(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Autocorrelation function of the per-type daily count series at
    lags 1..max_lag, from EXACT integer sufficient statistics.

    The series is densified first (zero-filled spine over each type's
    [min, max] span — a day with no events is an observed 0, so the lag
    is a true CALENDAR shift, not a row shift over holes). All seven
    lags come out of ONE sorted window pass (seven ``lead`` columns over
    the same type partitioning), exploded and re-grouped to per-(type,
    lag) moment sums (n, Sx, Sy, Sxy, Sxx, Syy) — exact BIGINTs, so
    engines can't disagree on accumulation order. corr_bp is the single
    deterministic double expression floor(1e4 * cov / sqrt(vx * vy)).

    Plan: one shuffle on event_type for the window, map-side partial
    aggregation into <= types x max_lag groups. The window partition is
    day-grain per type — calendar-bounded, never the event grain.
    """
    daily = _daily_events(events)
    spans = daily.groupBy("event_type").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    spine = spans.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day"),
    )
    filled = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    # window expressions evaluate in their own projection; the explode
    # over the (lag, lead) structs happens in the NEXT one
    led = filled.select(
        "event_type",
        "y",
        *[
            F.lead("y", k).over(w).alias(f"y_{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    lagged = led.select(
        "event_type",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag"),
                        F.col(f"y_{k}").alias("y2"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("p"),
    ).where(F.col("p.y2").isNotNull())
    g = lagged.groupBy("event_type", F.col("p.lag").alias("lag")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("y").alias("sx"),
        F.sum("p.y2").alias("sy"),
        F.sum(F.col("y") * F.col("p.y2")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("sxx"),
        F.sum(F.col("p.y2") * F.col("p.y2")).alias("syy"),
    )
    cov = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    return g.where((vx > 0) & (vy > 0)).select(
        "event_type",
        "lag",
        "n_pairs",
        cov.alias("cov_num"),
        F.floor(
            F.lit(10000.0)
            * cov.cast("double")
            / F.sqrt(vx.cast("double") * vy.cast("double"))
        )
        .cast("long")
        .alias("corr_bp"),
    )


def rolling_median_daily(events: DataFrame, days: int = 7) -> DataFrame:
    """Trailing ``days``-day rolling LOWER-MEDIAN of daily event counts
    per event type — the robust smoother for spiky operational series
    (one bad day cannot drag a median the way it drags moving_average's
    mean).

    Integer-exact by construction: the window collects the trailing
    counts over a RANGE frame keyed on the integer day index (calendar
    gaps therefore shorten the window rather than silently spanning
    them — the sparse-series semantics moving_average_range documents),
    sorts, and selects element (n+1) div 2 — pure integer selection,
    nothing to round differently. The frame is bounded by ``days``
    rows, and the window partitions by event type over day-grain rows —
    thousands of rows at any corpus size, never the event grain."""
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    idx = F.datediff(F.col("day"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(idx)
        .rangeBetween(-(days - 1), 0)
    )
    arr = F.sort_array(F.collect_list("n_events").over(w))
    return daily.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "n_events",
        F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int")).alias(
            "rolling_median"
        ),
        F.size(arr).cast("bigint").alias("window_days"),
    )


def forecast_backtest(events: DataFrame, season: int = 7) -> DataFrame:
    """Backtest of the SEASONAL-NAIVE forecaster (predict today =
    same weekday last week) over the zero-filled per-type daily series
    — the baseline every fancier forecaster must beat, and the
    evaluation harness is the operator: walk the series, score each
    day that has a lag-``season`` ancestor, aggregate the errors.

    Error metric is WAPE in basis points — sum|err| / sum(actual) —
    chosen because it is a ratio of two exact BIGINTs (per-day MAPE
    divides by zero on quiet days and floats differently per engine).
    One window pass (lag 7 over the spine), one aggregate. Emits per
    type: days evaluated, total absolute error, total actual volume,
    wape_bp (truncating div, non-negative), and the count of days the
    naive forecast was exactly right.
    """
    daily = _daily_events(events)
    spans = daily.groupBy("event_type").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    spine = spans.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day"),
    )
    filled = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    scored = filled.withColumn("pred", F.lag("y", season).over(w)).where(
        F.col("pred").isNotNull()
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(F.abs(F.col("y") - F.col("pred"))).cast("long").alias("abs_err"),
        F.sum("y").cast("long").alias("actual_total"),
        F.sum((F.col("y") == F.col("pred")).cast("long"))
        .cast("long")
        .alias("n_exact"),
    ).withColumn("wape_bp", F.expr("(10000 * abs_err) div actual_total"))


def seasonal_residual_anomalies(events: DataFrame) -> DataFrame:
    """Seasonally-adjusted anomaly detection: remove each event type's
    day-of-week profile from its daily series, then flag days whose
    residual exceeds 3x the type's MAD of residuals — the robust
    two-stage screen (dow_seasonality models the cycle; mad_anomalies
    screens raw values; this composes them, catching a quiet Sunday
    that is anomalous FOR a Sunday).

    The dow profile is the per-(type, dow) lower MEDIAN, not the mean —
    a mean profile is dragged by the very outlier being hunted, which
    then makes every NORMAL day of that weekday look anomalous (the
    classic leave-nothing-in failure). Median profile + MAD threshold
    is robust at both stages and keeps everything pure integer: no
    division anywhere, residuals are exact e4 subtractions, both
    selections are rank lookups. Two bounded windows sharing the
    event_type partitioning; day-grain inputs are calendar-bounded."""
    daily = _daily_events(events).withColumn(
        "dow", F.dayofweek("day").cast("long")
    )
    wd = Window.partitionBy("event_type", "dow").orderBy("y", "day")
    ranked_d = daily.withColumn("rn", F.row_number().over(wd)).withColumn(
        "nd", F.count(F.lit(1)).over(Window.partitionBy("event_type", "dow"))
    )
    prof = ranked_d.where(F.col("rn") == F.expr("(nd + 1) div 2")).select(
        "event_type", "dow", F.col("y").alias("med")
    )
    res = daily.join(prof, ["event_type", "dow"]).select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "y",
        (10000 * F.col("med")).alias("expected_e4"),
        (10000 * (F.col("y") - F.col("med"))).alias("residual_e4"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.abs("residual_e4"), "day"
    )
    ranked = res.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    mad = ranked.where(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "event_type", F.abs("residual_e4").alias("mad_e4")
    )
    return res.join(mad, "event_type").select(
        "event_type",
        "day",
        "y",
        "expected_e4",
        "residual_e4",
        "mad_e4",
        (F.abs("residual_e4") > 3 * F.col("mad_e4")).alias("flagged"),
    )


def crosscorr_daily(
    events: DataFrame,
    type_a: str = "click",
    type_b: str = "purchase",
    max_lag: int = 7,
) -> DataFrame:
    """CROSS-correlation between two event types' daily series at lags
    0..max_lag — "does clicking today predict purchasing in k days":
    corr(a_t, b_{t+k}) over the SHARED zero-filled calendar span
    (autocorr_daily's machinery pointed across series; a lead-lag
    asymmetry between lag k readouts is the direction-of-influence
    signal).

    Same exactness discipline: the two series align on one spine (span
    = union of both types' spans), leads come from one window pass, and
    each lag reduces to exact BIGINT moment sums with the single
    deterministic corr_bp double expression. One shuffle total."""
    daily = _daily_events(events).where(
        F.col("event_type").isin(type_a, type_b)
    )
    span = daily.agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    spine = span.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day")
    )
    wide = spine.join(
        daily.groupBy("day").pivot("event_type", [type_a, type_b]).sum("y"),
        "day",
        "left",
    ).select(
        "day",
        F.coalesce(type_a, F.lit(0)).cast("long").alias("a"),
        F.coalesce(type_b, F.lit(0)).cast("long").alias("b"),
    )
    w = Window.orderBy("day")
    led = wide.select(
        "a",
        *[F.lead("b", k).over(w).alias(f"b_{k}") for k in range(0, max_lag + 1)],
    )
    lagged = led.select(
        "a",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("long").alias("lag"),
                        F.col(f"b_{k}").alias("b"),
                    )
                    for k in range(0, max_lag + 1)
                ]
            )
        ).alias("p"),
    ).where(F.col("p.b").isNotNull())
    g = lagged.groupBy(F.col("p.lag").alias("lag")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("a").alias("sa"),
        F.sum("p.b").alias("sb"),
        F.sum(F.col("a") * F.col("p.b")).alias("sab"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("p.b") * F.col("p.b")).alias("sbb"),
    )
    cov = F.col("n_pairs") * F.col("sab") - F.col("sa") * F.col("sb")
    va = F.col("n_pairs") * F.col("saa") - F.col("sa") * F.col("sa")
    vb = F.col("n_pairs") * F.col("sbb") - F.col("sb") * F.col("sb")
    return g.where((va > 0) & (vb > 0)).select(
        "lag",
        "n_pairs",
        cov.alias("cov_num"),
        F.floor(
            F.lit(10000.0)
            * cov.cast("double")
            / F.sqrt(va.cast("double") * vb.cast("double"))
        )
        .cast("long")
        .alias("corr_bp"),
    )


def mann_kendall_trend(events: DataFrame) -> DataFrame:
    """Mann-Kendall monotonic-trend test per event type over the DAILY
    revenue series — the nonparametric complement to theil_sen_slope
    (same pairwise-over-days structure; theil_sen estimates the slope,
    Mann-Kendall decides whether a monotonic trend exists at all):
    S = sum over day pairs i<j of sign(v_j - v_i), with the
    tie-corrected normal approximation
    var = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18 and the standard
    continuity correction (S-1 or S+1 toward zero).

    Exact-integer discipline: S, n, and the var numerator (var18) are
    BIGINT; only the final z is one IEEE double expression floored to
    e6. Degenerate series (var18 = 0: a single day, or all days tied)
    are filtered, not emitted as NaN.

    Scale: the pairwise join is keyed on event_type and quadratic only
    in the CALENDAR-bounded per-type day count (the theil_sen max_days
    argument made into the same contract: ~90 days -> ~4k pairs per
    type). Daily aggregation is one keyed groupBy; tie groups are one
    more histogram-grain aggregate. No cross join anywhere.
    """
    daily = (
        events.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("v")
        )
        .select(
            "event_type",
            F.datediff("day", F.lit("1970-01-01")).cast("long").alias("x"),
            "v",
        )
    )
    a = daily.select(
        "event_type", F.col("x").alias("x1"), F.col("v").alias("v1")
    )
    b = daily.select(
        "event_type", F.col("x").alias("x2"), F.col("v").alias("v2")
    )
    s_stat = (
        a.join(b, "event_type")
        .where(F.col("x1") < F.col("x2"))
        .groupBy("event_type")
        .agg(
            F.sum(F.signum(F.col("v2") - F.col("v1")).cast("long"))
            .cast("long")
            .alias("s_stat")
        )
    )
    n_days = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    j = s_stat.join(n_days, "event_type").join(ties, "event_type")
    var18 = F.expr(
        "n_days * (n_days - 1) * (2 * n_days + 5) - tie_term"
    )
    # continuity correction toward zero; one double expression at the end
    z = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
        .cast("double")
        / F.sqrt(var18.cast("double") / F.lit(18.0))
    )
    return (
        j.withColumn("var18", var18.cast("long"))
        .where(F.col("var18") > 0)
        .select(
            "event_type",
            "n_days",
            "s_stat",
            "var18",
            F.floor(F.lit(1_000_000.0) * z).cast("long").alias("z_e6"),
        )
    )


def kaplan_meier(events: DataFrame) -> DataFrame:
    """Kaplan-Meier survival of time-to-first-purchase — the censored
    time-to-event estimator (plain conversion rates throw away WHEN,
    and naive means are biased by users the corpus stops observing):
    each user enters at their first event; the event is their first
    purchase; users with no purchase are right-censored at the corpus
    max day. Emits the classic risk table per event day t (days since
    entry): n_at_risk, n_events, plus the survival curve.

    Exactness discipline: the KM product Π(1 - d/n) is replayed as an
    integer SUM of per-step millibit logs — floor(1000 * log2((n-d)/
    n)) per step, cumulated down the day axis (the text-surprisal
    quantize-then-sum pattern applied to a cumulative product); the
    at-risk count n(t) = entrants alive at t comes from exact
    reverse-cumulative arithmetic. No float crosses a row boundary
    unquantized.

    Scale: one user-grain reduction (entry day, event/censor day),
    one day-grain risk table, calendar-bounded windows.
    """
    per_user = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("entry"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.to_date("ts")
            )
        ).alias("conv"),
        F.max(F.to_date("ts")).alias("last_seen"),
    )
    horizon = events.agg(F.max(F.to_date("ts")).alias("max_day"))
    durations = per_user.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("conv").isNotNull(),
            F.datediff("conv", "entry"),
        )
        .otherwise(F.datediff("max_day", "entry"))
        .cast("long")
        .alias("t"),
        F.col("conv").isNotNull().cast("long").alias("observed"),
    )
    table = durations.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_exit"),
        F.sum("observed").cast("long").alias("d"),
    )
    # n_at_risk(t) = total - all exits strictly before t
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    risk = table.select(
        "t",
        "d",
        (
            F.sum("n_exit").over(tot)
            - (F.sum("n_exit").over(w) - F.col("n_exit"))
        ).alias("n_at_risk"),
    )
    step_mb = F.when(
        F.col("d") > 0,
        F.floor(
            F.lit(1000.0)
            * F.log2(
                (F.col("n_at_risk") - F.col("d")).cast("double")
                / F.col("n_at_risk").cast("double")
            )
        ),
    ).otherwise(F.lit(0)).cast("long")
    return (
        risk.where(F.col("n_at_risk") > F.col("d"))
        .select(
            "t",
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.col("d").alias("n_events"),
            step_mb.alias("step_log2_mb"),
        )
        .withColumn(
            "surv_log2_mb",
            F.sum("step_log2_mb")
            .over(
                Window.orderBy("t").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .cast("long"),
        )
    )


def cv_slope_stability(events: DataFrame, folds: int = 5) -> DataFrame:
    """Cross-validated trend stability: the click-count trend slope
    refitted on ``folds`` disjoint USER folds (hash of user_id — the
    GroupKFold stance: all of a user's events stay in one fold, so
    folds are independent populations), plus the cross-fold spread —
    the cheap answer to "is this slope real or one cohort's noise?".
    A slope whose sign flips across folds is not a trend.

    Integer OLS per fold from four exact BIGINT sums (the
    ols_two_factor discipline, univariate); spread attaches from a
    fold-count-bounded window. One events scan, one (fold, day)
    aggregate, |folds| OLS rows.
    """
    daily = (
        events.where(F.col("event_type") == "click")
        .groupBy(
            (F.col("user_id") % folds).cast("long").alias("fold"),
            F.to_date("ts").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    d0 = daily.groupBy("fold").agg(F.min("day").alias("d0"))
    base = daily.join(F.broadcast(d0), "fold").select(
        "fold",
        F.datediff("day", "d0").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    )
    g = base.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slopes = g.where(den > 0).select(
        "fold",
        F.col("n").cast("long").alias("n_days"),
        F.floor(
            F.lit(1_000_000.0) * num.cast("double") / den.cast("double")
        ).cast("long").alias("slope_e6"),
    )
    w = Window.partitionBy()
    return slopes.select(
        "fold",
        "n_days",
        "slope_e6",
        (F.max("slope_e6").over(w) - F.min("slope_e6").over(w))
        .cast("long")
        .alias("spread_e6"),
    )


def isotonic_daily_fit(events: DataFrame) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression of daily mean
    purchase value per event type — the shape-constrained fit used
    for calibration curves and dose-response monotonicity, computed
    by the CLOSED-FORM minimax identity instead of the sequential
    PAVA stack:

        fit(i) = max_{j <= i} min_{k >= i} avg(y[j..k])

    The identity gives the unique PAVA solution without any
    order-dependent pooling walk, which makes it (a) embarrassingly
    parallel — every (j, i) cell is independent — and (b) exactly
    replayable in SQL. That trade (O(n^3) cells for a dependency-free
    plan) is RIGHT at scale because n is the CALENDAR, not the
    corpus: 30 days -> 27k cells per type, reduced by two keyed
    aggregates, while the corpus-sized work remains one daily
    aggregate.

    Exactness: daily means stay (sum_cents, n) rationals until one
    shared IEEE division per (j,k) range (prefix-sum differences);
    min/max over doubles are order-free; the fit ships as floor(100 *
    fit). Joins are equi-keyed on event_type with calendar-bounded
    range residuals.
    """
    daily = (
        events.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.select(
        "event_type",
        F.row_number().over(w).alias("i"),
        F.col("day").cast("string").alias("day"),
        "c",
        "n",
        F.sum("c").over(w).alias("pc"),
        F.sum("n").over(w).alias("pn"),
    )
    # range table: avg(j..k) from prefix differences
    a = idx.select(
        "event_type",
        F.col("i").alias("j"),
        (F.col("pc") - F.col("c")).alias("pc_j"),
        (F.col("pn") - F.col("n")).alias("pn_j"),
    )
    b = idx.select(
        "event_type",
        F.col("i").alias("k"),
        F.col("pc").alias("pc_k"),
        F.col("pn").alias("pn_k"),
    )
    pairs = (
        a.join(b, "event_type")
        .where(F.col("j") <= F.col("k"))
        .select(
            "event_type",
            "j",
            "k",
            (
                (F.col("pc_k") - F.col("pc_j")).cast("double")
                / (F.col("pn_k") - F.col("pn_j")).cast("double")
            ).alias("avg"),
        )
    )
    cells = idx.select("event_type", "i", "day")
    inner = (
        cells.join(pairs, "event_type")
        .where((F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("event_type", "i", "day", "j")
        .agg(F.min("avg").alias("mavg"))
    )
    fit = inner.groupBy("event_type", "i", "day").agg(
        F.max("mavg").alias("fit")
    )
    return (
        fit.join(
            idx.select("event_type", "i", "c", "n"), ["event_type", "i"]
        )
        .select(
            "event_type",
            "day",
            F.expr("c div n").alias("mean_cents"),
            F.floor(F.lit(100.0) * F.col("fit"))
            .cast("long")
            .alias("fit_e2"),
        )
    )


def fano_factor(events: DataFrame) -> DataFrame:
    """Index of dispersion (Fano factor) of the DAILY arrival counts
    per event type — the burstiness scalar: a Poisson-regular arrival
    process reads 1e4 (variance == mean); heavier reads overdispersed
    (bursts), lighter underdispersed (rate-limited / scheduled). The
    one-number companion to burst_max's extreme and ooo_audit's
    ordering.

    Exact integer sufficient statistics over the calendar-bounded
    daily series (n, sum, sum of squares — population variance via
    n*s2 - s1^2, safe in int64 because daily counts are bounded);
    fano_e4 = one floored double ratio. Degenerate series (zero mean)
    filtered.
    """
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    )
    # fano = var/mean = (n*s2 - s1^2) / (n * s1)
    return g.where(F.col("s1") > 0).select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("s1").cast("long").alias("n_events"),
        F.floor(
            F.lit(10000.0)
            * (
                F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
            ).cast("double")
            / (F.col("n") * F.col("s1")).cast("double")
        ).cast("long").alias("fano_e4"),
    )


def circadian_profile(events: DataFrame) -> DataFrame:
    """Circular (directional) statistics of event time-of-day per
    type — the RIGHT average for clock data, where the linear mean of
    23:00 and 01:00 is the absurd 12:00: each event maps to a unit
    vector at angle 2*pi*seconds/86400; the resultant's angle is the
    mean time and its length R in [0,1] the concentration (R near 1 =
    sharp daily peak, near 0 = uniform around the clock).

    Exactness: per-row cos/sin are quantized to e6 integers (one
    shared IEEE expression each) BEFORE the sums — the millibit
    pattern in 2-D — so the aggregate is two exact BIGINT sums; the
    final atan2/sqrt run once per type. Mean hour ships in e2 hours,
    shifted into [0, 24).
    """
    sec = (
        F.col("ts").cast("long") % 86400
    )  # seconds into the UTC day
    ang = sec.cast("double") * (2.0 * 3.141592653589793 / 86400.0)
    base = events.select(
        "event_type",
        F.floor(F.cos(ang) * 1_000_000).cast("long").alias("cx"),
        F.floor(F.sin(ang) * 1_000_000).cast("long").alias("cy"),
    )
    g = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cx").alias("sx"),
        F.sum("cy").alias("sy"),
    )
    r = (
        F.sqrt(
            F.col("sx").cast("double") * F.col("sx")
            + F.col("sy").cast("double") * F.col("sy")
        )
        / (F.lit(1_000_000.0) * F.col("n"))
    )
    mean_sec = (
        F.atan2(F.col("sy").cast("double"), F.col("sx").cast("double"))
        * (86400.0 / (2.0 * 3.141592653589793))
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.floor(F.lit(10_000.0) * r).cast("long").alias("r_e4"),
        (
            (
                F.floor(mean_sec / 36.0).cast("long") + 2400
            ) % 2400
        ).alias("mean_hour_e2"),
    )


def runs_test(events: DataFrame) -> DataFrame:
    """Wald-Wolfowitz runs test on the SIGN of day-over-day revenue
    moves per event type — "is the up/down sequence random, or does
    it trend/oscillate?": too few runs = momentum, too many =
    mean-reversion. R = 1 + sign changes over the calendar-ordered
    walk; expectation and variance from the exact up/down counts
    (ties on zero moves are dropped, the standard treatment).

    One day-grain aggregate, one calendar-bounded lag window for the
    moves, one more for the sign changes; z_e6 is the single shared
    double. Degenerate series (n+ = 0 or n- = 0) are filtered.
    """
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    moves = (
        daily.select(
            "event_type",
            "day",
            F.signum(
                (F.col("v") - F.lag("v").over(w)).cast("double")
            ).cast("long").alias("s"),
        )
        .where(F.col("s").isNotNull() & (F.col("s") != 0))
    )
    w2 = Window.partitionBy("event_type").orderBy("day")
    runs = moves.select(
        "event_type",
        "s",
        (F.col("s") != F.lag("s").over(w2))
        .cast("long")
        .alias("chg"),
    )
    g = runs.groupBy("event_type").agg(
        F.sum((F.col("s") > 0).cast("long")).alias("n_up"),
        F.sum((F.col("s") < 0).cast("long")).alias("n_down"),
        (F.sum(F.coalesce("chg", F.lit(0))) + 1).alias("r_runs"),
    )
    n1 = F.col("n_up").cast("double")
    n2 = F.col("n_down").cast("double")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return g.where(
        (F.col("n_up") > 0) & (F.col("n_down") > 0)
    ).select(
        "event_type",
        F.col("n_up").cast("long").alias("n_up"),
        F.col("n_down").cast("long").alias("n_down"),
        F.col("r_runs").cast("long").alias("r_runs"),
        F.floor(
            F.lit(1_000_000.0)
            * (F.col("r_runs").cast("double") - mu)
            / F.sqrt(var)
        ).cast("long").alias("z_e6"),
    )


def durbin_watson(events: DataFrame) -> DataFrame:
    """Durbin-Watson statistic of mean-detrended daily counts per
    type — the residual-autocorrelation dial (2 = none, toward 0 =
    positive serial correlation, toward 4 = alternation) every
    forecasting-readiness check starts with.

    Residuals stay integral by scaling: e_t = n*y_t - sum(y) (the
    mean times n, never divided), so both the numerator sum of
    squared LAG DIFFERENCES and the denominator sum of squares are
    exact BIGINTs; dw_e4 is one double ratio. Calendar-bounded
    windows only.
    """
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    g = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    )
    e = daily.join(F.broadcast(g), "event_type").select(
        "event_type",
        "day",
        (F.col("n") * F.col("y") - F.col("sy")).alias("e"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    terms = e.select(
        "event_type",
        (F.col("e") * F.col("e")).alias("e2"),
        F.when(
            F.lag("e").over(w).isNotNull(),
            (F.col("e") - F.lag("e").over(w))
            * (F.col("e") - F.lag("e").over(w)),
        ).alias("d2"),
    )
    agg = terms.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("e2").alias("den"),
        F.sum("d2").alias("num"),
    )
    return agg.where(F.col("den") > 0).select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.floor(
            F.lit(10_000.0)
            * F.col("num").cast("double")
            / F.col("den").cast("double")
        ).cast("long").alias("dw_e4"),
    )


def dow_eta_squared(events: DataFrame) -> DataFrame:
    """Eta-squared of day-of-week on daily counts per type — the
    ANOVA share of variance explained by weekly seasonality (near 1:
    schedule-driven; near 0: the weekday means are noise). Scaled-
    residual trick keeps every sum of squares integral: between-SS
    and total-SS are computed over n*y - sum(y) style terms with
    exact group counts, so eta2_e4 is one double ratio of exact
    BIGINTs.

    A daily aggregate, a (type, dow) aggregate, a type-grain rollup —
    all calendar/enum-bounded beyond the first scan.
    """
    daily = events.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
    ).agg(F.count(F.lit(1)).alias("y")).select(
        "event_type", "day", F.dayofweek("day").alias("dow"), "y"
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    grp = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("y").alias("sg"),
    )
    # SS_total * n = n*syy - sy^2 ; SS_between * n = n*sum(sg^2/ng) - sy^2
    # keep integral: between term uses exact rational sg^2/ng via
    # cross-multiplication inside one double at the end
    j = grp.join(F.broadcast(tot), "event_type")
    # per-dow term floored to e6 BEFORE the sum (a float fold over
    # even 7 rows is order-dependent at the last ulp — quantize first)
    agg = j.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("sy").alias("sy"),
        F.max("syy").alias("syy"),
        F.sum(
            F.floor(
                F.lit(1_000_000.0)
                * F.col("sg").cast("double")
                * F.col("sg")
                / F.col("ng")
            ).cast("long")
        ).alias("sb_e6"),
    )
    sst = F.col("n").cast("double") * F.col("syy") - F.col("sy").cast(
        "double"
    ) * F.col("sy")
    ssb = (
        F.col("n").cast("double") * F.col("sb_e6") / F.lit(1_000_000.0)
        - F.col("sy").cast("double") * F.col("sy")
    )
    return agg.where(sst > 0).select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.floor(F.lit(10_000.0) * ssb / sst).cast("long").alias(
            "eta2_e4"
        ),
    )


def revenue_var(events: DataFrame, q: int = 95) -> DataFrame:
    """Historical value-at-risk of the daily revenue stream per type:
    the p95 day-over-day DOWN-move in cents — "on a bad day, how much
    revenue disappears versus yesterday" (the planning number; means
    hide it, the tail pays for it). Moves from one calendar-bounded
    lag window; the quantile of LOSSES (negative moves flipped
    positive) by the value-at-rank convention over the loss
    histogram. Types with no down days are filtered.
    """
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    losses = (
        daily.select(
            "event_type",
            (F.lag("v").over(w) - F.col("v")).alias("loss"),
        )
        .where(F.col("loss").isNotNull() & (F.col("loss") > 0))
    )
    hist = losses.groupBy("event_type", "loss").agg(
        F.count(F.lit(1)).alias("t")
    )
    cw = (
        Window.partitionBy("event_type")
        .orderBy("loss")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("event_type")
    ranked = hist.select(
        "event_type",
        "loss",
        (F.sum("t").over(cw) - F.col("t") + 1).alias("lo"),
        F.sum("t").over(cw).alias("hi"),
        F.sum("t").over(tot).alias("n"),
    )
    target = F.expr(f"(n - 1) * {q} div 100 + 1")
    return (
        ranked.where((target >= F.col("lo")) & (target <= F.col("hi")))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_down_days"),
            F.col("loss").cast("long").alias(f"var{q}_cents"),
        )
    )
