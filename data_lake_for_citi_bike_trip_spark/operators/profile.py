"""Table profiling: per-column statistics in ONE pass over the data.

A data-engineering staple the reference lacks (its DQ layer,
spark_check_emr.py:24-66, asserts fixed counts; profiling *discovers*
the shape): for every column emit row count, null count, exact distinct
count, and canonical min/max.

Scale design: all metrics for all columns are computed in a single
``agg`` — one scan, one (expanded) shuffle. Spark plans the N exact
``count(DISTINCT ...)`` aggregates via a single Expand + partial
aggregation pass (no per-column scans). The wide 1-row result is then
unpivoted driver-side into the long (col_name, metrics...) shape with an
``explode`` over an array of structs — zero extra jobs.

Cross-engine canonical representation: min/max are converted to VARCHAR
*after* the native-typed min/max (never min over the string form — "99" >
"100" lexicographically). Doubles are emitted as integer cents
(``CAST(round(x*100) AS BIGINT)``) because Spark and DuckDB format
DOUBLE->VARCHAR differently (scientific notation thresholds).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import spread


@dataclass(frozen=True)
class ColumnSpec:
    """One profiled column: its native (orderable) value and a callable
    converting a native min/max into a canonical VARCHAR."""

    name: str
    value: Column
    as_string: Callable[[Column], Column]


def str_repr(c: Column) -> Column:
    return c.cast("string")


def cents_repr(c: Column) -> Column:
    """Engine-independent repr for doubles: exact integer cents."""
    return F.round(c * 100).cast("bigint").cast("string")


def profile_table(
    df: DataFrame, specs: list[ColumnSpec], approx: bool = False, rsd: float = 0.05
) -> DataFrame:
    """Profile ``specs`` columns in one aggregate pass.

    Returns one row per column: (col_name, n_rows, n_null, n_distinct,
    min_val, max_val) — min/max as canonical strings.

    ``approx=True`` is the 100 TB path: N exact ``count(DISTINCT)`` in
    one agg plan through a single Expand that multiplies every input row
    by the number of distinct aggregates (6 columns -> 6x the shuffle).
    ``approx_count_distinct`` (HyperLogLog++, ``rsd`` relative error)
    needs no Expand — the plan is a plain two-phase aggregate whose
    shuffle carries one constant-size sketch per column, at the price of
    approximate n_distinct. The exact path stays the default because the
    DuckDB oracle pins its values."""
    # spread() (r15): the Expand x n_distinct_aggs + partial aggregate
    # run inside the scan task; a single-row-group source (the sf
    # testdata shape) hashed every expanded row on one core. No-op on
    # already-parallel inputs.
    df = spread(df)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for s in specs:
        aggs.append(F.count(s.value).alias(f"__nn_{s.name}"))
        if approx:
            aggs.append(
                F.approx_count_distinct(s.value, rsd).alias(f"__nd_{s.name}")
            )
        else:
            aggs.append(F.count_distinct(s.value).alias(f"__nd_{s.name}"))
        aggs.append(s.as_string(F.min(s.value)).alias(f"__min_{s.name}"))
        aggs.append(s.as_string(F.max(s.value)).alias(f"__max_{s.name}"))
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(s.name).alias("col_name"),
                F.col("__n_rows").alias("n_rows"),
                (F.col("__n_rows") - F.col(f"__nn_{s.name}")).alias("n_null"),
                F.col(f"__nd_{s.name}").alias("n_distinct"),
                F.col(f"__min_{s.name}").alias("min_val"),
                F.col(f"__max_{s.name}").alias("max_val"),
            )
            for s in specs
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def orders_profile(orders: DataFrame, approx: bool = False) -> DataFrame:
    """Profile of every ``orders`` column (the contract-query instance).

    NB: specs are built per call — ``F.col`` needs an active
    SparkContext, so they cannot live at module scope."""
    specs = [
        ColumnSpec("o_orderkey", F.col("o_orderkey"), str_repr),
        ColumnSpec("o_custkey", F.col("o_custkey"), str_repr),
        ColumnSpec("o_orderstatus", F.col("o_orderstatus"), str_repr),
        ColumnSpec("o_totalprice", F.col("o_totalprice"), cents_repr),
        ColumnSpec("o_orderdate", F.col("o_orderdate"), str_repr),
        ColumnSpec("o_orderpriority", F.col("o_orderpriority"), str_repr),
    ]
    return profile_table(orders, specs, approx=approx)


def bitmap_distinct(
    df: DataFrame,
    group_col: str = "event_type",
    key_col: str = "user_id",
    word_bits: int = 32,
) -> DataFrame:
    """EXACT distinct count via bitmap-word aggregation — the
    Druid/ClickHouse "groupBitmap" pattern, expressed in pure relational
    ops so Catalyst plans it as two ordinary hash aggregates.

    Shape: key -> (word = key div B, bit = key mod B); ``bit_or`` the
    one-hot masks per (group, word); ``sum(bit_count(mask))`` per group.

    Why this beats ``count_distinct`` at 100 TB: Spark's exact
    count-distinct keeps every distinct key in the aggregation hash map
    and shuffles ALL distinct keys per group. The bitmap form map-side
    combines to at most one B-bit word per (group, word) pair per
    partition — for dense integer key spaces the shuffle payload shrinks
    by ~B x and the final state is bounded by key-space/B words, not by
    key count. The words are also MERGEABLE (bit_or is associative /
    commutative / idempotent), so per-hour word tables roll up to days
    exactly — the exact-count analogue of the HLL rollup below. For
    non-integral keys, hash to a 64-bit space first (collision-free up
    to the hash; then it degrades to xxhash-keyed approximate-exact).

    ``word_bits=32`` keeps the shifted mask unambiguously positive in a
    64-bit signed lane on BOTH engines (bit 63 would flip the sign in
    DuckDB's ``<<`` and Spark's ``shiftleft`` — semantically fine for
    bit_or but a needless cross-engine hazard).

    Emits per group: exact n_distinct plus n_words (the bitmap's
    physical row count — the compression evidence: n_words <=
    n_distinct, and at density it approaches key_range/B).
    """
    masks = df.select(
        F.col(group_col).alias("grp"),
        # integral `div`, not `/`: float division would lose exactness
        # for keys beyond 2^53
        F.expr(f"{key_col} div {word_bits}").alias("word"),
        # expr form: the python F.shiftleft binding only takes a literal
        # shift amount, the SQL function accepts a column
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({key_col} % {word_bits} AS INT))"
        ).alias("mask"),
    )
    words = masks.groupBy("grp", "word").agg(F.bit_or("mask").alias("mask"))
    return words.groupBy("grp").agg(
        F.sum(F.bit_count("mask")).cast("long").alias("n_distinct"),
        F.count(F.lit(1)).alias("n_words"),
    )


def hll_incremental_distinct(
    events: DataFrame, error_bp: int = 500
) -> DataFrame:
    """Mergeable-sketch incremental distinct — the production pattern
    for "distinct users per day/month" at 100 TB: build one HLL sketch
    per HOUR (map-side aggregate over that hour's partition only),
    persist the tiny sketches, and answer the day by UNIONING 24
    sketches — never re-scanning raw data. A late-arriving hour
    re-sketches one hour and the day rolls up again; exact
    count_distinct would re-shuffle the whole day.

    Emits per day the engine-checkable pair: the exact distinct (for
    the oracle) and hll_ok — the sketch-union estimate within
    ``error_bp`` basis points of exact (HLL at Spark's default lgK=12 is
    ~1.6% typical error; 5% bound => regressions go red, noise doesn't).
    The exact side exists FOR the oracle; at scale you ship the estimate
    column only."""
    keyed = events.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "user_id",
    )
    hourly = keyed.groupBy("day", "hour").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    daily_est = hourly.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    )
    daily_exact = keyed.groupBy("day").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return (
        daily_exact.join(daily_est, "day")
        .select(
            "day",
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users")) * 10000
                <= F.lit(error_bp) * F.col("exact_users")
            ).alias("hll_ok"),
        )
    )


def corr_pairs(lineitem: DataFrame) -> DataFrame:
    """Pairwise Pearson correlations in ONE aggregate pass, built from
    EXACT integer sufficient statistics.

    ``F.corr`` / DuckDB ``corr`` accumulate floating moments whose value
    depends on row visit order — un-hashable across engines. Instead the
    moments (n, Sx, Sy, Sxy, Sxx, Syy) are summed as BIGINTs over
    small-integer projections of the metrics (quantity 1..50, discount
    basis points 0..10, ship week 1..53) — one shuffle of ten numbers,
    exactly reproducible anywhere. The final correlation is then ONE
    deterministic per-row float expression over exact ints
    (IEEE multiply/sqrt/divide have no ordering freedom):
    corr_bp = floor(1e4 * (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) *
    (n*Syy - Sy^2))).

    Overflow headroom: |values| <= 1e2, so n*Sxy <= n^2 * 1e4 stays in
    int64 through n ~ 3e7 rows; beyond that switch the six sums to
    DECIMAL(38,0) (same plan shape, Spark and DuckDB both exact).
    """
    base = lineitem.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 100).cast("long").alias("y"),
        F.weekofyear("l_shipdate").cast("long").alias("z"),
    )
    s = base.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(expr).alias(name)
            for name, expr in {
                "sx": F.col("x"),
                "sy": F.col("y"),
                "sz": F.col("z"),
                "sxy": F.col("x") * F.col("y"),
                "sxz": F.col("x") * F.col("z"),
                "syz": F.col("y") * F.col("z"),
                "sxx": F.col("x") * F.col("x"),
                "syy": F.col("y") * F.col("y"),
                "szz": F.col("z") * F.col("z"),
            }.items()
        ],
    )

    def pair(tag, sa, sb, sab, saa, sbb):
        cov = F.col("n") * F.col(sab) - F.col(sa) * F.col(sb)
        va = F.col("n") * F.col(saa) - F.col(sa) * F.col(sa)
        vb = F.col("n") * F.col(sbb) - F.col(sb) * F.col(sb)
        return F.struct(
            F.lit(tag).alias("pair"),
            F.col("n").alias("n"),
            cov.alias("cov_num"),
            F.floor(
                F.lit(10000.0)
                * cov.cast("double")
                / F.sqrt(va.cast("double") * vb.cast("double"))
            )
            .cast("long")
            .alias("corr_bp"),
        )

    rows = F.array(
        pair("qty_discount", "sx", "sy", "sxy", "sxx", "syy"),
        pair("qty_week", "sx", "sz", "sxz", "sxx", "szz"),
        pair("discount_week", "sy", "sz", "syz", "syy", "szz"),
    )
    return s.select(F.explode(rows).alias("p")).select("p.*")


def feature_quartiles(orders: DataFrame) -> DataFrame:
    """EXACT per-group quartiles (p25/p50/p75) by rank arithmetic — the
    deterministic complement to approx_percentile: value at 0-based
    index (n-1)*q/100 (lower-index convention) in the sorted group.

    One shuffle on the group key, one sorted window pass, one final
    aggregate. Values are integer cents; equal values make the
    row_number tie order irrelevant (the value AT a rank is unique even
    when rank assignment isn't). At 100 TB the same rank arithmetic
    runs on a pre-aggregated (value, count) histogram instead of raw
    rows — same selection logic, value-cardinality-bounded input.
    """
    base = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("grp").orderBy("cents")
    ranked = base.select(
        "grp",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("n"),
    )
    qcol = {
        q: F.max(
            F.when(
                F.col("rn") == F.expr(f"(n - 1) * {q} div 100") + 1,
                F.col("cents"),
            )
        ).alias(f"p{q}_cents")
        for q in (25, 50, 75)
    }
    return ranked.groupBy("grp").agg(
        F.max("n").alias("n"), qcol[25], qcol[50], qcol[75]
    )


#: Benford first-digit probabilities, log10(1 + 1/d), in e6 units.
BENFORD_E6 = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_audit(orders: DataFrame) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-numbers screen in financial DQ: naturally occurring
    multi-magnitude amounts follow P(d) = log10(1 + 1/d); synthetic or
    tampered figures usually don't.

    Emits per leading digit: observed count, observed share (e6),
    Benford expectation (e6, precomputed integer constants — no logs at
    query time), and the absolute deviation — all integer arithmetic,
    one scan + a 9-row aggregate. The verdict (pass/flag) is left to
    the caller's threshold because sample size governs significance.
    """
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("long")
    counts = orders.where(F.col("o_totalprice") > 0).groupBy(
        digit.alias("digit")
    ).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").cast("long").alias("total"))
    expect = F.array(
        *[
            F.struct(F.lit(d).alias("digit"), F.lit(e).alias("expected_e6"))
            for d, e in BENFORD_E6.items()
        ]
    )
    bench = (
        orders.sparkSession.range(1)
        .select(F.explode(expect).alias("b"))
        .select("b.digit", F.col("b.expected_e6").cast("long").alias("expected_e6"))
    )
    return (
        counts.join(F.broadcast(bench), "digit", "full_outer")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.expr("(1000000 * coalesce(n, 0)) div total").alias("observed_e6"),
            F.coalesce("expected_e6", F.lit(0)).alias("expected_e6"),
            F.abs(
                F.expr("(1000000 * coalesce(n, 0)) div total")
                - F.coalesce("expected_e6", F.lit(0))
            ).alias("abs_dev_e6"),
        )
    )


def fd_violations(trips: DataFrame) -> DataFrame:
    """Functional-dependency mining over the staged trips: for each
    candidate FD X -> Y, how many X values map to MORE than one Y —
    the Metanome/profiling primitive that discovers which "should-be"
    keys actually hold before they get baked into a dim model.

    One aggregate per FD (distinct Y per X, then count violators),
    unioned into a single report. Exact, map-side-combining shuffles on
    each X.
    """
    fds = [
        ("bikeid -> usertype", "bikeid", "usertype"),
        ("start_station -> end_station", "start_station_id", "end_station_id"),
        ("bikeid -> gender", "bikeid", "gender"),
    ]
    out = None
    for name, x, y in fds:
        per_x = trips.groupBy(F.col(x).alias("x")).agg(
            F.count_distinct(F.col(y)).alias("ny"),
            F.count(F.lit(1)).alias("rows_x"),
        )
        rep = per_x.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum((F.col("ny") > 1).cast("long")).cast("long").alias(
                "violating_keys"
            ),
            F.max("ny").alias("max_distinct_y"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


def countmin_frequencies(
    events: DataFrame,
    depth: int = 3,
    width: int = 64,
    track_top: int = 20,
) -> DataFrame:
    """COUNT-MIN SKETCH frequency estimation — the mergeable,
    fixed-size companion to the HLL (distinct) and bitmap (exact
    distinct) sketches already in this module: per-key frequency
    estimates from a depth x width counter grid, with the one-sided
    guarantee estimate >= true count (collisions only ever ADD).

    Scale shape: the sketch build is ONE grouped aggregate over
    (row, bucket) — depth*width cells TOTAL regardless of input size
    (bounded state; shard sketches merge by cell-wise addition, the
    property that makes this the streaming/pre-agg frequency
    structure). The probe side joins ``track_top`` keys x depth rows
    against the cell table on (row, bucket) — both sides bounded by
    construction, so the hint-free join broadcasts under AQE.

    Hashes are md5-derived (functions/text.py:token_hash32), exactly
    mirrorable in DuckDB, so the oracle REPLAYS the sketch cell-for-
    cell: the emitted estimate, the exact count, and the
    ``overestimate_ok`` guarantee flag (must be TRUE on every row —
    a CMS that ever underestimates is broken) are all hash-checked,
    not trusted."""
    from ..functions.text import token_hash32

    rows = F.array(*[F.lit(i) for i in range(depth)])
    keyed = events.select(F.col("user_id").alias("k")).select(
        "k", F.explode(rows).alias("i")
    )
    bucketed = keyed.select(
        "i",
        (
            token_hash32(
                F.concat(
                    F.col("k").cast("string"),
                    F.lit("cms-"),
                    F.col("i").cast("string"),
                )
            )
            % width
        ).alias("b"),
    )
    cells = bucketed.groupBy("i", "b").agg(F.count(F.lit(1)).alias("cnt"))

    exact = events.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    tracked = exact.orderBy(F.desc("exact_cnt"), F.asc("k")).limit(track_top)
    probes = tracked.select("k", "exact_cnt").select(
        "k", "exact_cnt", F.explode(rows).alias("i")
    ).select(
        "k",
        "exact_cnt",
        "i",
        (
            token_hash32(
                F.concat(
                    F.col("k").cast("string"),
                    F.lit("cms-"),
                    F.col("i").cast("string"),
                )
            )
            % width
        ).alias("b"),
    )
    return (
        probes.join(cells, ["i", "b"])
        .groupBy("k", "exact_cnt")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            F.col("k").alias("user_id"),
            "exact_cnt",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("exact_cnt")).alias(
                "overestimate_ok"
            ),
        )
    )


def trimmed_mean_by_type(events: DataFrame, trim_pct: int = 10) -> DataFrame:
    """10%-trimmed mean of event values per type through a GROUPED_AGG
    pandas UDF — the Arrow-batched user-defined AGGREGATE tier of the
    Python surface (grouped-map applyInPandas and mapInArrow are
    showcased elsewhere; this is the third shape: a custom aggregate
    the built-ins genuinely lack, fed per-group as a numpy array).

    Integer-exact contract: values quantize to cents BEFORE the UDF;
    inside, the trim drops floor(n*pct/100) from each sorted end and
    the result is the INTEGER-DIV mean in e2 units — floor semantics
    every engine reproduces, so the oracle replays it with list_sort
    + slicing.

    Scale: an order-dependent trim needs the whole group's series, so
    the GROUP must be bounded — grouping is per (user_id, event_type),
    whose cardinality is bounded in practice (the same per-key
    justification as user_gap_median's grouped map); a per-type-only
    trim at 100 TB would pull one event type's entire series into a
    single array cell, which is exactly the shape this module avoids.

    r15: formerly a GROUPED_AGG pandas UDAF plus a separate JVM count
    aggregate joined back on the group key — two aggregation exchanges,
    a join, and an Arrow round-trip per group through AggregateInPandas.
    The trim is expressible entirely in JVM expressions over the sorted
    group array (sort_array(collect_list) + slice + aggregate), which
    ships the identical bytes through ONE hash aggregate, computes the
    count in the same pass, and removes the Python boundary (guide
    §4.1: built-ins over UDFs). Output-identical: same sort, the same
    floor(n*pct/100) trim from each end, and the final division uses
    explicit FLOOR semantics ((a - pmod(a, n)) div n) to match the
    Python ``//`` / DuckDB ``//`` the UDAF used — on the non-negative
    cents domain truncation and floor agree, but the operator should
    not change behavior if fed negatives."""
    cents = events.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    grouped = cents.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sort_array(F.collect_list("cents")).alias("vs"),
    )
    k = f"(size(vs) * {int(trim_pct)}) div 100"
    kept = grouped.select(
        "user_id",
        "event_type",
        "n_events",
        F.expr(
            f"CASE WHEN size(vs) > 2 * ({k}) "
            f"THEN slice(vs, ({k}) + 1, size(vs) - 2 * ({k})) "
            "ELSE vs END"
        ).alias("kept"),
    )
    sums = kept.select(
        "user_id",
        "event_type",
        "n_events",
        F.expr(
            "100 * aggregate(kept, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("s"),
        F.expr("CAST(size(kept) AS BIGINT)").alias("m"),
    )
    return sums.select(
        "user_id",
        "event_type",
        "n_events",
        F.expr("CAST((s - pmod(s, m)) div m AS BIGINT)").alias(
            "trimmed_mean_e2"
        ),
    )


def chisq_independence(events: DataFrame) -> DataFrame:
    """Chi-square test of independence for the event_type x day-of-week
    contingency table — the workhorse categorical-drift screen (is the
    event mix different on weekends? did a source shift its type
    distribution?).

    Entirely distributed: one grouped count builds the O(types x 7)
    cell table, two cheap re-aggregates produce the margins, and the
    per-cell chi-square contribution ships as ONE deterministic double
    expression over exact BIGINT counts — contribution = (O*N - R*C)^2
    / (N*R*C), evaluated with the subtraction done in doubles so the
    formula survives corpora where O*N exceeds int64. floor(1e6 * .)
    makes it hashable cross-engine. Margins are cell-table-sized (enum
    x 7 rows), so their broadcast is provably bounded.

    Degrees of freedom = (types-1) * (dows-1); the caller owns the
    p-value threshold (sample size governs significance, same stance as
    benford_audit).
    """
    cells = events.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("event_type").agg(F.sum("o").alias("row_total"))
    cols = cells.groupBy("dow").agg(F.sum("o").alias("col_total"))
    total = cells.agg(F.sum("o").cast("long").alias("n_total"))
    dev = (
        F.col("o").cast("double") * F.col("n_total")
        - F.col("row_total").cast("double") * F.col("col_total")
    )
    denom = (
        F.col("n_total").cast("double")
        * F.col("row_total").cast("double")
        * F.col("col_total").cast("double")
    )
    return (
        cells.join(F.broadcast(rows), "event_type")
        .join(F.broadcast(cols), "dow")
        .crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "dow",
            "o",
            "row_total",
            "col_total",
            "n_total",
            F.floor(F.lit(1000000.0) * dev * dev / denom)
            .cast("long")
            .alias("contrib_e6"),
        )
    )


def rank_sum_test(
    events: DataFrame, type_a: str = "click", type_b: str = "purchase"
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two event types' value
    distributions — the nonparametric two-sample screen (no normality
    assumption; robust to the heavy tails that break a t-test).

    The scale trick: ranks are never assigned to raw rows. Values
    quantize to cents and pre-aggregate to a (cents -> count_a,
    count_b) HISTOGRAM, bounded by the value domain's cardinality, and
    average ranks of tied blocks come from one cumulative window over
    that histogram. Everything stays integer-exact by carrying DOUBLED
    rank sums (2*avg_rank of a tied block = 2*start + len - 1 is always
    an integer): r2_a = 2*R_a, u2_a = 2*U_a, mean2 = 2*E[U] = n1*n2.
    The tie-corrected z-statistic is the one deterministic double
    expression at the end (z_e6).

    The single-partition window is bounded by the histogram's row count
    (value-domain cardinality, <= ~50k here), never the event grain —
    the same justification as feature_quartiles' histogram note.
    """
    base = events.where(F.col("event_type").isin(type_a, type_b)).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_type") == type_a).cast("long").alias("is_a"),
    )
    hist = base.groupBy("cents").agg(
        F.sum("is_a").alias("na"),
        F.sum(F.lit(1) - F.col("is_a")).alias("nb"),
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = F.col("na") + F.col("nb")
    ranked = hist.select(
        "na",
        "nb",
        t.alias("t"),
        (F.sum(t).over(w) - t).alias("before"),
    )
    # 2 * average rank of the tied block starting at before+1, length t
    avg2 = 2 * F.col("before") + F.col("t") + 1
    agg = ranked.agg(
        F.sum("na").cast("long").alias("n1"),
        F.sum("nb").cast("long").alias("n2"),
        F.sum(F.col("na") * avg2).cast("long").alias("r2_a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_term"),
    )
    u2 = F.col("r2_a") - F.col("n1") * (F.col("n1") + 1)
    n = F.col("n1") + F.col("n2")
    var4 = (
        F.col("n1").cast("double")
        * F.col("n2").cast("double")
        / 3.0
        * (
            (n + 1).cast("double")
            - F.col("tie_term").cast("double")
            / (n.cast("double") * (n - 1).cast("double"))
        )
    )
    # degenerate-input guard (the autocorr_daily vx/vy > 0 pattern):
    # n1 or n2 = 0 makes n*(n-1) or var4 zero; all-tied values make
    # var4 = 0 — either way the z-score is undefined, so the row is
    # filtered rather than emitted as NaN.
    return agg.where(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (var4 > 0)
    ).select(
        "n1",
        "n2",
        u2.alias("u2_a"),
        (F.col("n1") * F.col("n2")).alias("mean2"),
        "tie_term",
        F.floor(
            F.lit(1000000.0)
            * (u2 - F.col("n1") * F.col("n2")).cast("double")
            / F.sqrt(var4)
        )
        .cast("long")
        .alias("z_e6"),
    )


def hll_overlap(
    events: DataFrame,
    type_a: str = "click",
    type_b: str = "purchase",
    error_bp: int = 1000,
) -> DataFrame:
    """Audience-overlap estimation from MERGEABLE sketches: |A and B|
    via inclusion-exclusion over three HLLs (est_a + est_b - est_union)
    — the pattern for "how many users both clicked and purchased" when
    A and B live in different partitions/tables and an exact
    intersection would shuffle raw IDs. Sketches are tiny, unionable,
    and precomputable per segment.

    Emits the exact triple (for the oracle) plus overlap_ok — the
    sketch estimate within error_bp of exact, scaled by the UNION size
    (inclusion-exclusion compounds the per-sketch error, so the bound
    is relative to what the sketches actually measured). Exact side
    is one conditional aggregate per user — the per-user flag rollup.
    """
    per_user = events.where(
        F.col("event_type").isin(type_a, type_b)
    ).groupBy("user_id").agg(
        F.max((F.col("event_type") == type_a).cast("long")).alias("ha"),
        F.max((F.col("event_type") == type_b).cast("long")).alias("hb"),
    )
    exact = per_user.agg(
        F.sum("ha").cast("long").alias("exact_a"),
        F.sum("hb").cast("long").alias("exact_b"),
        F.sum(F.col("ha") * F.col("hb")).cast("long").alias("exact_both"),
    )
    sk = events.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(
                F.when(F.col("event_type") == type_a, F.col("user_id"))
            )
        ).alias("est_a"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(
                F.when(F.col("event_type") == type_b, F.col("user_id"))
            )
        ).alias("est_b"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(
                F.when(
                    F.col("event_type").isin(type_a, type_b), F.col("user_id")
                )
            )
        ).alias("est_u"),
    )
    return exact.crossJoin(F.broadcast(sk)).select(
        "exact_a",
        "exact_b",
        "exact_both",
        (
            F.abs(
                (F.col("est_a") + F.col("est_b") - F.col("est_u"))
                - F.col("exact_both")
            )
            * 10000
            <= F.lit(error_bp)
            * (F.col("exact_a") + F.col("exact_b") - F.col("exact_both"))
        ).alias("overlap_ok"),
    )


def winsorized_stats(events: DataFrame) -> DataFrame:
    """Winsorized (clamped-tail) summary per event type: exact p05/p95
    cut points by histogram-rank selection, then the mean of values
    clamped into [p05, p95] — the robust location estimate that a few
    corrupt extreme values cannot move (the preprocessing standard for
    reward/score columns before training).

    Exactness: values quantize to cents; cut points are values AT
    integer ranks (ceil(q*n), lower-value convention) read off the
    per-type cumulative histogram — value-cardinality-bounded, same
    discipline as feature_quartiles at scale. The clamped sum then
    accumulates as BIGINT cents via the histogram (count * clamped
    value), and the mean ships as truncating integer division (sums
    are non-negative, so Spark div == DuckDB //).
    """
    hist = events.groupBy(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "event_type",
        "cents",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )
    k_lo = F.expr("(5 * n + 99) div 100")
    k_hi = F.expr("(95 * n + 99) div 100")
    cuts = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") >= k_lo, F.col("cents"))).alias("lo_cents"),
        F.min(F.when(F.col("cum") >= k_hi, F.col("cents"))).alias("hi_cents"),
    )
    clamped = (
        hist.join(F.broadcast(cuts), "event_type")
        .select(
            "event_type",
            "n",
            "lo_cents",
            "hi_cents",
            (
                F.col("cnt")
                * F.greatest(
                    F.col("lo_cents"), F.least(F.col("hi_cents"), F.col("cents"))
                )
            ).alias("part"),
        )
    )
    return clamped.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("lo_cents").alias("lo_cents"),
        F.max("hi_cents").alias("hi_cents"),
        F.sum("part").cast("long").alias("clamped_sum_cents"),
    ).withColumn(
        "winsor_mean_cents", F.expr("clamped_sum_cents div n")
    )


def _column_entropy(df: DataFrame, col: str, label: str) -> DataFrame:
    """One row: Shannon entropy of a categorical column in e6 units.

    Float summation order is the cross-engine killer for entropy
    (-sum p log p accumulates differently per engine); the fix is to
    make the fold order PART OF THE CONTRACT: counts collect into a
    SORTED array and reduce left-to-right with an explicit 0.0 seed —
    both engines then execute the identical IEEE operation sequence
    (ties in the sorted order hold equal values, so their order can't
    matter). The collected array is value-cardinality-bounded (it's a
    histogram, not rows). entropy = log2(n) - sum(c*log2(c))/n.
    """
    counts = df.groupBy(F.col(col).alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.agg(
        F.lit(label).alias("column_name"),
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sort_array(F.collect_list(F.col("cnt").cast("double"))).alias("arr"),
    ).select(
        "column_name",
        "n_values",
        "n_rows",
        F.expr(
            "CAST(floor(1000000.0 * (log2(CAST(n_rows AS DOUBLE)) - "
            "aggregate(arr, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * log2(x))"
            " / CAST(n_rows AS DOUBLE))) AS BIGINT)"
        ).alias("entropy_e6"),
    )


def entropy_profile(
    events: DataFrame, documents: DataFrame, orders: DataFrame
) -> DataFrame:
    """Column-entropy profile across the lake's categorical columns —
    the screening stat for mix drift, collapsed enums, and
    high-cardinality identifier leaks (near-log2(n) entropy on a
    'category' column means it isn't one).

    One keyed aggregate per column (map-side partials), each collapsing
    to a single histogram row; the union is four rows. Deterministic
    float discipline lives in _column_entropy."""
    parts = [
        _column_entropy(events, "event_type", "events.event_type"),
        _column_entropy(documents, "lang", "documents.lang"),
        _column_entropy(documents, "source", "documents.source"),
        _column_entropy(orders, "o_orderpriority", "orders.o_orderpriority"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ooo_audit(events: DataFrame) -> DataFrame:
    """Out-of-order ingestion audit: treating event_id as arrival order,
    how often does event time step BACKWARDS, per event type — the
    number that decides streaming watermark budgets (a pipeline with 2%
    backward steps of <=30 s needs a 30 s watermark; one with heavy
    regressions needs reprocessing, not a bigger buffer).

    One window pass per type ordered by arrival (event_id), comparing
    event time to the previous arrival's. Emits arrivals, backward
    steps, the worst regression (microseconds; NULL for types with
    zero backward steps — a forward gap is not a regression), and the
    p100-in-bp share. Exact integers throughout (epoch micros)."""
    w = Window.partitionBy("event_type").orderBy("event_id")
    us = F.unix_micros("ts")
    stepped = events.select(
        "event_type",
        (us - F.lag(us).over(w)).alias("step_us"),
    ).where(F.col("step_us").isNotNull())
    return stepped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_steps"),
        F.sum((F.col("step_us") < 0).cast("long"))
        .cast("long")
        .alias("n_backward"),
        F.min(F.when(F.col("step_us") < 0, F.col("step_us")))
        .cast("long")
        .alias("worst_regression_us"),
    ).withColumn(
        "backward_bp", F.expr("(10000 * n_backward) div n_steps")
    )


def bitmap_overlap(
    events: DataFrame,
    type_a: str = "click",
    type_b: str = "purchase",
    word_bits: int = 32,
) -> DataFrame:
    """EXACT audience intersection via BITWISE-AND of roaring-style
    word bitmaps — the precise counterpart to hll_overlap's estimate:
    build each segment's bitmap as (word -> mask) rows, join on the
    word index, AND the masks, popcount. Set algebra on compressed
    bitmaps is how OLAP engines answer audience combinations without
    ever shuffling raw IDs; the data moved is ceil(|universe|/64)
    words per segment regardless of event volume. Words are 32 bits —
    a 1 << 63 mask overflows engines that range-check BIGINT shifts
    (the bitmap_distinct convention).

    Emits one row: exact |A|, |B|, |A and B|, |A or B| — all four from
    the same two word tables (OR via a full-outer word join), plus the
    inclusion-exclusion identity check the algebra must satisfy.
    """
    def masks(t: str):
        return (
            events.where(F.col("event_type") == t)
            .select(
                F.expr(f"user_id div {word_bits}").alias("word"),
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), "
                    f"CAST(user_id % {word_bits} AS INT))"
                ).alias("m"),
            )
            .groupBy("word")
            .agg(F.bit_or("m").alias("mask"))
        )

    a, b = masks(type_a), masks(type_b)
    joined = a.select("word", F.col("mask").alias("ma")).join(
        b.select("word", F.col("mask").alias("mb")), "word", "full_outer"
    )
    za = F.coalesce("ma", F.lit(0))
    zb = F.coalesce("mb", F.lit(0))
    agg = joined.agg(
        F.sum(F.bit_count(za)).cast("long").alias("n_a"),
        F.sum(F.bit_count(zb)).cast("long").alias("n_b"),
        F.sum(F.bit_count(za.bitwiseAND(zb))).cast("long").alias("n_and"),
        F.sum(F.bit_count(za.bitwiseOR(zb))).cast("long").alias("n_or"),
    )
    return agg.select(
        "n_a",
        "n_b",
        "n_and",
        "n_or",
        (F.col("n_a") + F.col("n_b") - F.col("n_and") == F.col("n_or")).alias(
            "inclusion_exclusion_ok"
        ),
    )


def ks_test(
    events: DataFrame, type_a: str = "click", type_b: str = "purchase"
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between two event types'
    value distributions — the SHAPE test completing the location test
    (rank_sum_test): D = max |ECDF_a - ECDF_b|, sensitive to any
    distributional difference, not just a median shift.

    Exact: D's candidates live only at distinct values, so the whole
    statistic reduces on the value-domain HISTOGRAM — cumulative counts
    per side from one window, the max of |cumA*nB - cumB*nA| as exact
    BIGINTs (cross-multiplied, no per-step division), and one final
    d_e6 = floor(1e6 * maxdiff / (nA*nB)) double expression. The
    single-partition window is histogram-grain (feature_quartiles'
    justification)."""
    base = events.where(F.col("event_type").isin(type_a, type_b)).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_type") == type_a).cast("long").alias("is_a"),
    )
    hist = base.groupBy("cents").agg(
        F.sum("is_a").alias("na"),
        F.sum(F.lit(1) - F.col("is_a")).alias("nb"),
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    cum = hist.select(
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
        F.sum("na").over(tot).alias("n1"),
        F.sum("nb").over(tot).alias("n2"),
    )
    diff = F.abs(F.col("ca") * F.col("n2") - F.col("cb") * F.col("n1"))
    return cum.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.max(diff).cast("long").alias("d_num"),
    ).select(
        "n1",
        "n2",
        "d_num",
        F.floor(
            F.lit(1000000.0)
            * F.col("d_num").cast("double")
            / (F.col("n1").cast("double") * F.col("n2").cast("double"))
        )
        .cast("long")
        .alias("d_e6"),
    )


def gini_spend(events: DataFrame) -> DataFrame:
    """Gini coefficient of per-user purchase-spend concentration — the
    inequality readout ("do 10% of users carry 90% of revenue"), exact
    to the emitted unit via the tie-corrected rank formula

        G = (sum(avg_rank_i * x_i) * 2 - (n+1) * S) / (n * S)

    held integral with DOUBLED average ranks (rank_sum_test's trick:
    2*avg_rank of a tied block = 2*start + len - 1 is always an
    integer), so the numerator sum(avg2 * x) - (n+1)*S is an exact
    BIGINT and only the final g_e6 divides — one deterministic double
    expression. Runs on the (spend -> user count) HISTOGRAM, never a
    global user sort."""
    spend = events.where(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    hist = spend.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = hist.select(
        "cents",
        "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("before"),
    )
    avg2 = 2 * F.col("before") + F.col("cnt") + 1
    agg = ranked.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("cnt") * F.col("cents")).cast("long").alias("s"),
        F.sum(avg2 * F.col("cents") * F.col("cnt")).cast("long").alias("r2x"),
    )
    return agg.select(
        "n",
        "s",
        (F.col("r2x") - (F.col("n") + 1) * F.col("s")).alias("gini_num"),
        F.floor(
            F.lit(1000000.0)
            * (F.col("r2x") - (F.col("n") + 1) * F.col("s")).cast("double")
            / (F.col("n").cast("double") * F.col("s").cast("double"))
        )
        .cast("long")
        .alias("gini_e6"),
    )


def cramers_v(events: DataFrame) -> DataFrame:
    """Cramér's V — chi-square normalized to [0, 1] so association
    strength is comparable across tables of different shapes:
    V = sqrt(chi2 / (N * min(r-1, c-1))). Builds on
    chisq_independence's cells; the per-cell contributions are already
    INTEGER e6, so their sum is exact and only the final V takes one
    deterministic double sqrt."""
    cells = chisq_independence(events)
    agg = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.count_distinct("event_type").alias("r"),
        F.count_distinct("dow").alias("c"),
        F.max("n_total").cast("long").alias("n_total"),
        F.sum("contrib_e6").cast("long").alias("chi2_e6"),
    )
    return agg.select(
        "n_cells",
        "r",
        "c",
        "n_total",
        "chi2_e6",
        F.floor(
            F.lit(1000000.0)
            * F.sqrt(
                F.col("chi2_e6").cast("double")
                / 1000000.0
                / (
                    F.col("n_total").cast("double")
                    * F.least(F.col("r") - 1, F.col("c") - 1).cast("double")
                )
            )
        )
        .cast("long")
        .alias("v_e6"),
    )


def psi_value_drift(events: DataFrame, n_bins: int = 10) -> DataFrame:
    """Population Stability Index between the first and second half of
    the observation window, per event type — THE production drift gate
    for score/value distributions (PSI < 0.1 stable, > 0.25 investigate;
    thresholds belong to the caller).

    Bins are global value deciles by histogram-rank selection (the
    winsorized_stats discipline — no raw-row sort); each (type, bin)
    emits both periods' EXACT proportions in bp plus its PSI
    contribution (pa - pb) * ln(pa / pb) as one per-row deterministic
    double over exact integers, Laplace-smoothed (+1 per cell) so empty
    bins stay finite. Per-bin rows keep the contract hash-exact —
    consumers sum 10 rows for the scalar."""
    mid = events.agg(
        F.expr(
            "CAST((min(unix_micros(ts)) + max(unix_micros(ts))) div 2"
            " AS BIGINT)"
        ).alias("mid_us")
    )
    base = events.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.unix_micros("ts") <= F.col("mid_us")).cast("long").alias("is_a"),
    )
    hist = base.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "cents",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    cuts = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"({k} * n + {n_bins - 1}) div {n_bins}"),
                    F.col("cents"),
                )
            ).alias(f"t{k}")
            for k in range(1, n_bins)
        ]
    )
    binned = base.crossJoin(F.broadcast(cuts)).select(
        "event_type",
        "is_a",
        sum(
            (F.col("cents") > F.col(f"t{k}")).cast("long")
            for k in range(1, n_bins)
        ).alias("bin"),
    )
    cells = binned.groupBy("event_type", "bin").agg(
        F.sum("is_a").alias("na"),
        F.sum(F.lit(1) - F.col("is_a")).alias("nb"),
    )
    tots = cells.groupBy("event_type").agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb"),
        F.count(F.lit(1)).alias("k"),
    )
    j = cells.join(F.broadcast(tots), "event_type")
    pa = (F.col("na") + 1).cast("double") / (F.col("ta") + F.col("k")).cast(
        "double"
    )
    pb = (F.col("nb") + 1).cast("double") / (F.col("tb") + F.col("k")).cast(
        "double"
    )
    return j.select(
        "event_type",
        "bin",
        F.col("na").cast("long").alias("n_first"),
        F.col("nb").cast("long").alias("n_second"),
        F.floor(F.lit(1000000.0) * (pa - pb) * F.log(pa / pb))
        .cast("long")
        .alias("psi_contrib_e6"),
    )


# Poisson(1) inverse-CDF thresholds in 2^-32 units: floor(cum * 2^32)
# for k = 0..5; a 32-bit md5-uniform below threshold[k] draws weight k,
# anything above the last takes 6 (P > 6 is ~1e-4 — truncation is part
# of the contract, replayed identically by the oracle).
_POISSON1_CUM_E32 = (
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
)


def bootstrap_mean_ci(orders: DataFrame, b_reps: int = 32) -> DataFrame:
    """Poisson bootstrap confidence interval for the mean order value —
    THE resampling scheme that actually distributes: a classic
    multinomial bootstrap needs the global row count per replicate, but
    Poisson(1) per-row weights are independent, so all ``b_reps``
    replicates stream through ONE scan with a map-side expand and a
    B-row aggregate (the shape production systems use at petabyte
    scale precisely because no coordination crosses rows).

    Fully deterministic and oracle-replayable: the weight for (row,
    replicate) is the Poisson(1) inverse CDF applied to a 32-bit
    md5-uniform of ``orderkey:rep`` (thresholds hardcoded in 2^-32
    units above — no engine RNG anywhere). Replicate means are exact
    ``sum(w*cents) div sum(w)``; the CI reads value-at-rank over the
    B sorted means (the funnel-quartile convention), so every output
    cell is a BIGINT.

    Scale: expand is x B on the scanned rows but collapses immediately
    into a per-partition partial aggregate keyed by replicate — the
    shuffle carries at most B rows per task. The B-row window sort is
    bounded by b_reps.
    """
    # spread() (r15): the B-fold expand + md5 + inverse-CDF weight run
    # inside the scan task — a single-row-group source (the sf testdata
    # shape) computed all B x n row hashes on one core. The compact
    # (k, cents) rows shuffle BEFORE the expansion, so the repartition
    # moves n rows to unlock B x n parallel work; no-op when the scan
    # is already parallel.
    base = spread(
        orders.select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    point = base.agg(
        F.expr("sum(cents) div count(1)").alias("point_cents")
    )
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("k").cast("string"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    c = _POISSON1_CUM_E32
    w_expr = (
        F.when(u < c[0], 0)
        .when(u < c[1], 1)
        .when(u < c[2], 2)
        .when(u < c[3], 3)
        .when(u < c[4], 4)
        .when(u < c[5], 5)
        .otherwise(6)
        .cast("long")
    )
    reps = (
        base.select(
            "k",
            "cents",
            F.explode(
                F.sequence(F.lit(0), F.lit(b_reps - 1))
            ).alias("b"),
        )
        .select("b", F.col("cents"), w_expr.alias("w"))
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("swc"),
            F.sum("w").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select("b", F.expr("swc div sw").alias("mean_cents"))
    )
    wr = Window.orderBy("mean_cents", "b")
    ranked = reps.select(
        F.col("mean_cents"),
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nb"),
    )
    def pick(q: int) -> Column:
        # value-at-rank convention: rn = (n-1)*q div 100 + 1, all ints
        return F.expr(
            f"max(CASE WHEN rn = (nb - 1) * {q} div 100 + 1 "
            "THEN mean_cents END)"
        ).cast("long")

    return (
        ranked.agg(
            F.max("nb").cast("long").alias("n_reps"),
            pick(5).alias("lo_cents"),
            pick(50).alias("mid_cents"),
            pick(95).alias("hi_cents"),
        )
        .crossJoin(F.broadcast(point))
        .select("n_reps", "point_cents", "lo_cents", "mid_cents", "hi_cents")
    )


def weighted_median_price(lineitem: DataFrame) -> DataFrame:
    """Weighted LOWER median of extended price per return flag, with
    quantity as the weight — "the price at which half the shipped
    UNITS sit below" (the unweighted median answers rows, not units;
    procurement and pricing teams want units). Histogram construction
    all the way down: group to (flag, cents) cells with summed integer
    weights, one cumulative window over the value domain per flag, and
    the median is the first cell where 2*cum_weight >= total_weight
    (lower convention, same as feature_quartiles).

    Scale: the value-domain histogram is bounded by distinct prices,
    not rows; the window partitions by flag over that bounded domain.
    All-integer (quantities are integral in this schema; the contract
    rounds them to BIGINT units).
    """
    hist = lineitem.groupBy(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100)
        .cast("long")
        .alias("cents"),
    ).agg(
        F.sum(F.round("l_quantity").cast("long")).alias("wt")
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("l_returnflag")
    cum = hist.select(
        "l_returnflag",
        "cents",
        F.sum("wt").over(w).alias("cum_wt"),
        F.sum("wt").over(tot).alias("total_wt"),
    )
    return (
        cum.where(2 * F.col("cum_wt") >= F.col("total_wt"))
        .groupBy("l_returnflag")
        .agg(
            F.min("cents").cast("long").alias("wmedian_cents"),
            F.max("total_wt").cast("long").alias("total_units"),
        )
    )


def mutual_information(events: DataFrame) -> DataFrame:
    """Mutual information between event type and day-of-week in e9
    units — the information-theoretic complement to chisq_independence
    (chi-square asks "is there association?"; MI measures HOW MANY
    BITS one variable reveals about the other, the feature-selection
    number). I(X;Y) = sum_ij p_ij * log2(p_ij / (p_i p_j)).

    Exactness: every margin and cell count is exact BIGINT; each
    cell's contribution is ONE shared IEEE double expression floored
    to e9 BEFORE the sum, so the aggregate is an integer sum over at
    most |types| x 7 cells — no float fold-order anywhere.

    Scale: one contingency aggregate (map-side combinable), two
    enum-bounded margin aggregates broadcast back (type enum x
    calendar — provably bounded sides, hints allowed by the
    broadcast rule), 35-cell final rollup.
    """
    base = events.select(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    )
    cells = base.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("nij")
    )
    mt = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("ni"))
    md = base.groupBy("dow").agg(F.count(F.lit(1)).alias("nj"))
    n = base.agg(F.count(F.lit(1)).alias("n"))
    contrib = F.floor(
        F.lit(1_000_000_000.0)
        * (F.col("nij").cast("double") / F.col("n"))
        * F.log2(
            F.col("nij").cast("double")
            * F.col("n")
            / (F.col("ni").cast("double") * F.col("nj"))
        )
    ).cast("long")
    return (
        cells.join(F.broadcast(mt), "event_type")
        .join(F.broadcast(md), "dow")
        .crossJoin(F.broadcast(n))
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(contrib).cast("long").alias("mi_e9"),
        )
    )


def spearman_daily(events: DataFrame) -> DataFrame:
    """Spearman rank correlation between daily click and purchase
    counts — the monotonic-association number that Pearson
    (corr_pairs) misses when the relationship is nonlinear and
    mann_kendall only answers against TIME. Computed as Pearson over
    tie-averaged ranks, with the doubled-rank trick from
    rank_sum_test keeping every rank integral: r2(v) = 2*before(v) +
    t(v) + 1 over each metric's value histogram.

    Exactness: ranks and all six correlation sums are exact BIGINTs
    (r2 <= 2n, so products stay far inside int64 for any calendar);
    only the final rho is one floored-e6 double. Degenerate series
    (either metric constant) are filtered, not NaN.

    Scale: the day-grain series is calendar-bounded, so the histogram
    windows and joins all run over bounded rows; the corpus-sized
    work is one conditional daily aggregate.
    """
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("p"),
    )

    def ranked(col: str) -> DataFrame:
        hist = daily.groupBy(col).agg(F.count(F.lit(1)).alias("t"))
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return hist.select(
            col,
            (
                2 * (F.sum("t").over(w) - F.col("t"))
                + F.col("t")
                + 1
            ).alias(f"r2_{col}"),
        )

    j = daily.join(ranked("c"), "c").join(ranked("p"), "p")
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r2_c").alias("sx"),
        F.sum("r2_p").alias("sy"),
        F.sum(F.col("r2_c") * F.col("r2_c")).alias("sxx"),
        F.sum(F.col("r2_p") * F.col("r2_p")).alias("syy"),
        F.sum(F.col("r2_c") * F.col("r2_p")).alias("sxy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return agg.where((vx > 0) & (vy > 0)).select(
        F.col("n").cast("long").alias("n_days"),
        F.floor(
            F.lit(1_000_000.0)
            * num.cast("double")
            / F.sqrt(vx.cast("double") * vy.cast("double"))
        ).cast("long").alias("rho_e6"),
    )


def mode_per_type(events: DataFrame) -> DataFrame:
    """Deterministic MODE of the value column per event type — the
    most common price point, with the tie broken to the SMALLEST
    value (engines disagree on arbitrary-tie mode; a total order is
    the only portable contract). Histogram + one max_by-style
    selection via a struct max: max(struct(count, -cents)) picks the
    highest count and, among ties, the smallest cents — single
    aggregate over the histogram, no window.
    """
    hist = events.groupBy(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return hist.groupBy("event_type").agg(
        F.max(F.struct(F.col("n"), (-F.col("cents")).alias("neg")))
        .alias("m"),
        F.count(F.lit(1)).alias("n_distinct_values"),
    ).select(
        "event_type",
        (-F.col("m.neg")).cast("long").alias("mode_cents"),
        F.col("m.n").cast("long").alias("mode_count"),
        F.col("n_distinct_values").cast("long").alias("n_distinct_values"),
    )


def log_histogram(events: DataFrame) -> DataFrame:
    """Power-of-two (log2) value histogram per event type — THE way
    to histogram heavy-tailed money-like values: equal-width bins
    put 99% of mass in one bucket; doubling bins give constant
    relative resolution. Bin = floor(log2(cents)) — exact for any
    BIGINT cents (< 2^53 guards the double mantissa; money is).
    Emits per (type, bin): count, bin bounds, and share in bp.

    One histogram aggregate; the per-type totals attach by an
    enum-bounded broadcast.
    """
    base = events.where(F.col("value") > 0).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    binned = base.select(
        "event_type",
        F.floor(F.log2(F.col("cents").cast("double")))
        .cast("long")
        .alias("bin"),
    )
    hist = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = binned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total")
    )
    return (
        hist.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "bin",
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT)) "
                   "AS BIGINT)").alias("lo_cents"),
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT) + 1)"
                " - 1 AS BIGINT)"
            ).alias("hi_cents"),
            F.col("n").cast("long").alias("n"),
            F.expr("(10000 * n) div total").alias("share_bp"),
        )
    )


def median_of_means(orders: DataFrame, k_buckets: int = 32) -> DataFrame:
    """Median-of-means robust mean of order value — the estimator
    with sub-Gaussian tails under ANY finite-variance distribution:
    hash rows into ``k_buckets`` deterministic groups, take each
    group's exact mean, report the median of the bucket means. The
    heavy-tail-proof companion to bootstrap_mean_ci (same md5 bucket
    discipline; one pass, k-row state — the estimator was invented
    for exactly this streaming/distributed shape).

    Exact integers: bucket means by truncating division of exact
    sums; the median of the <= k means is value-at-rank (lower
    median). Emits the MoM, the plain mean, and their gap — a large
    gap IS the heavy-tail alarm.
    """
    base = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (
            F.conv(
                F.substring(
                    F.md5(F.col("o_orderkey").cast("string")), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % k_buckets
        ).alias("b"),
    )
    means = base.groupBy("b").agg(
        F.expr("sum(cents) div count(1)").alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.orderBy("m", "b")
    ranked = means.select(
        "m",
        "n",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nb"),
        F.sum(F.col("m") * F.col("n")).over(Window.partitionBy()).alias("tw"),
        F.sum("n").over(Window.partitionBy()).alias("tn"),
    )
    return ranked.where(
        F.col("rk") == F.expr("(nb + 1) div 2")
    ).select(
        F.col("nb").cast("long").alias("n_buckets"),
        F.col("m").cast("long").alias("mom_cents"),
    ).crossJoin(
        F.broadcast(
            orders.agg(
                F.expr(
                    "sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
                    "div count(1)"
                ).alias("mean_cents")
            )
        )
    ).withColumn("gap_cents", F.col("mom_cents") - F.col("mean_cents"))


def prop_ztest(events: DataFrame) -> DataFrame:
    """Two-sample proportion z-test for the deterministic A/B split's
    conversion difference — the inference layer on top of ab_lift's
    point estimate (a 300 bp lift on 40 users is noise; on 40k users
    it's real). Pooled-variance form: z = (p1 - p0) /
    sqrt(p*(1-p)*(1/n0 + 1/n1)) with p the pooled conversion.

    Completes the testing family (locations: rank_sum_test; shapes:
    ks_test; association: chisq/cramers_v; proportions: this). The
    outcome is "ABOVE-median purchase count" — every user in this
    corpus purchases at least once, so ever-purchased saturates at
    p = 1 and the z is undefined; a data-derived median cutoff keeps
    the proportion interior at any scale (the non-vacuous rule). All
    counts exact BIGINT from one user-grain aggregate, a histogram
    lower-median (1-row attach), and a 2-row cell rollup; z is ONE
    floored-e6 double expression over exact ints. Degenerate pools
    (p = 0 or 1, or an empty arm) are filtered.
    """
    pu = events.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("np")
    )
    hist = pu.groupBy("np").agg(F.count(F.lit(1)).alias("t"))
    w = Window.orderBy("np").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    med = (
        hist.select(
            "np",
            F.sum("t").over(w).alias("cum"),
            F.sum("t").over(Window.partitionBy()).alias("tot"),
        )
        .where(2 * F.col("cum") >= F.col("tot"))
        .agg(F.min("np").alias("med"))
    )
    per = (
        pu.crossJoin(F.broadcast(med))
        .select(
            "user_id",
            (F.col("user_id") % 2).cast("long").alias("variant"),
            (F.col("np") > F.col("med")).cast("long").alias("converted"),
        )
    )
    cells = per.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("k"),
    )
    wide = cells.groupBy().agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("k"))).alias("k0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("k"))).alias("k1"),
    )
    kp = F.col("k0") + F.col("k1")
    np_ = F.col("n0") + F.col("n1")
    z = (
        (
            F.col("k1").cast("double") / F.col("n1")
            - F.col("k0").cast("double") / F.col("n0")
        )
        / F.sqrt(
            (kp.cast("double") / np_)
            * (1 - kp.cast("double") / np_)
            * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
        )
    )
    return wide.where(
        (F.col("n0") > 0)
        & (F.col("n1") > 0)
        & (kp > 0)
        & (kp < np_)
    ).select(
        F.col("n0").cast("long").alias("n0"),
        F.col("k0").cast("long").alias("k0"),
        F.col("n1").cast("long").alias("n1"),
        F.col("k1").cast("long").alias("k1"),
        F.expr("(10000 * k0) div n0").alias("conv0_bp"),
        F.expr("(10000 * k1) div n1").alias("conv1_bp"),
        F.floor(F.lit(1_000_000.0) * z).cast("long").alias("z_e6"),
    )


def neyman_allocation(events: DataFrame, budget: int = 1000) -> DataFrame:
    """Neyman optimal sample allocation across event-type strata: the
    survey-sampling rule n_h ∝ N_h * S_h (big AND variable strata get
    more of the budget) — the design step before any stratified
    estimate, and the reason stratified sampling beats uniform at
    equal cost. S_h comes from exact integer sufficient statistics
    (sum, sum of squares in cents); the allocation integerizes by the
    SAME largest-remainder method as prorate_order_total, so the
    shares sum to exactly ``budget``.

    One stratum-grain aggregate (enum-bounded), weight = floor(N_h *
    S_h) as one shared double per stratum, Hamilton rounding over the
    |strata| rows.
    """
    g = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s1"),
        F.sum(
            F.round(F.col("value") * 100).cast("long")
            * F.round(F.col("value") * 100).cast("long")
        ).alias("s2"),
    )
    # weight = N_h * S_h = sqrt(n*s2 - s1^2); the products n*s2 and
    # s1*s1 exceed int64 at corpus scale, so the variance term is ONE
    # shared all-double expression (identical IEEE on both engines)
    wgt = F.floor(
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                F.col("n").cast("double") * F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double"),
            )
        )
    ).cast("long")
    base = g.select(
        "event_type", "n", wgt.alias("w")
    ).where(F.col("w") > 0)
    tot = Window.partitionBy()
    k = base.select(
        "event_type",
        "n",
        "w",
        F.sum("w").over(tot).alias("wsum"),
    ).select(
        "event_type",
        "n",
        "w",
        F.expr(f"({budget} * w) div wsum").alias("base_alloc"),
        F.expr(f"({budget} * w) % wsum").alias("rem"),
        F.expr(
            f"{budget} - sum(({budget} * w) div wsum) OVER ()"
        ).alias("deficit"),
    )
    rw = Window.orderBy(F.col("rem").desc(), F.col("event_type"))
    return k.withColumn("rk", F.row_number().over(rw)).select(
        "event_type",
        F.col("n").cast("long").alias("n_rows"),
        F.col("w").cast("long").alias("weight"),
        (
            F.col("base_alloc")
            + (F.col("rk") <= F.col("deficit")).cast("long")
        ).cast("long").alias("alloc"),
    )


def capture_recapture(events: DataFrame) -> DataFrame:
    """Chapman capture-recapture estimate of the user population from
    the two corpus halves as capture occasions — the coverage
    diagnostic: if the estimate sits well above the observed distinct
    count, the corpus is still missing users (the ecology trick that
    also powers dedup-completeness estimates). N_hat = ((n1+1)(n2+1)
    div (m+1)) - 1, exact integers; emitted next to the actually
    observed distinct so the gap reads directly.

    Two half-distinct aggregates + one intersection semi-count — all
    user-keyed; the midpoint is the usual 1-row stat.
    """
    mid = events.agg(
        F.expr(
            "min(to_date(ts)) + CAST(datediff(max(to_date(ts)), "
            "min(to_date(ts))) div 2 AS INT)"
        ).alias("mid_day")
    )
    seen = (
        events.crossJoin(F.broadcast(mid))
        .select(
            "user_id",
            (F.to_date("ts") > F.col("mid_day")).cast("long").alias("h"),
        )
        .distinct()
        .groupBy("user_id")
        .agg(
            F.max(1 - F.col("h")).alias("pre"),
            F.max("h").alias("post"),
        )
    )
    agg = seen.agg(
        F.sum("pre").cast("long").alias("n1"),
        F.sum("post").cast("long").alias("n2"),
        F.sum(F.col("pre") * F.col("post")).cast("long").alias("m"),
        F.count(F.lit(1)).alias("observed"),
    )
    return agg.select(
        "n1",
        "n2",
        "m",
        F.col("observed").cast("long").alias("observed"),
        F.expr(
            "((n1 + 1) * (n2 + 1)) div (m + 1) - 1"
        ).alias("estimated"),
    )


def srm_check(events: DataFrame) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the parity A/B split — the
    FIRST check any experiment readout must pass: if the observed arm
    sizes are inconsistent with the intended 50/50 assignment, every
    downstream metric is suspect (bucketing bug, logging loss). One
    chi-square cell pair against the 50/50 expectation:
    chi2 = (n0 - n1)^2 / (n0 + n1), exact integers until the one
    floored-e6 division; srm_flag fires above the chi2 ~ 3.84 (p <
    0.05) threshold, cross-multiplied so the flag itself is integer
    arithmetic.
    """
    cells = (
        events.select("user_id")
        .distinct()
        .groupBy((F.col("user_id") % 2).cast("long").alias("variant"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wide = cells.groupBy().agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
    )
    d = F.col("n0") - F.col("n1")
    tot = F.col("n0") + F.col("n1")
    return wide.where(tot > 0).select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.floor(
            F.lit(1_000_000.0)
            * (d * d).cast("double")
            / tot.cast("double")
        ).cast("long").alias("chi2_e6"),
        # chi2 > 3.84  <=>  100 * (n0-n1)^2 > 384 * (n0+n1)
        (100 * d * d > 384 * tot).alias("srm_flag"),
    )


def price_endings(events: DataFrame) -> DataFrame:
    """Price-ending psychology audit: the cents-digit distribution of
    transaction values per type — whole-dollar (.00) and
    charm-pricing (.99) shares in bp, plus the most common ending —
    the pricing-ops readout that catches rogue price feeds (a
    currency-conversion bug shows up as uniform endings overnight).
    One histogram over cents % 100 (bounded 100 cells per type),
    shares by truncating division, deterministic argmax via struct
    max.
    """
    base = events.select(
        "event_type",
        (F.round(F.col("value") * 100).cast("long") % 100).alias("e"),
    )
    hist = base.groupBy("event_type", "e").agg(
        F.count(F.lit(1)).alias("n")
    )
    return hist.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_values"),
        F.expr(
            "(10000 * sum(CASE WHEN e = 0 THEN n ELSE 0 END)) div sum(n)"
        ).alias("whole_dollar_bp"),
        F.expr(
            "(10000 * sum(CASE WHEN e = 99 THEN n ELSE 0 END)) div sum(n)"
        ).alias("charm_99_bp"),
        F.expr("max(named_struct('n', n, 'neg', -e)).n")
        .cast("long")
        .alias("top_count"),
        (-F.expr("max(named_struct('n', n, 'neg', -e)).neg"))
        .cast("long")
        .alias("top_ending"),
    )


def brand_type_association(part: DataFrame) -> DataFrame:
    """Catalog-structure association: chi-square of brand x type over
    the part catalog with Cramér's V — do brands specialize in types,
    or is the catalog a uniform grid? (A synthetic catalog reads
    independent; a real vendor mix never does — the readout that
    catches generator drift AND real assortment strategy.) Same
    exact-margin construction as chisq_independence: every count a
    BIGINT, each cell's contribution ONE shared double floored to e6
    before the integer sum; V from the exact chi2. Sparse-grid
    correction: UNOBSERVED cells contribute their full expectation
    ((0-E)^2/E = E), summed analytically as n - sum(E over observed
    cells) — skipping them (the dense-table shortcut) understates
    chi2 exactly when the association is strongest.

    Margins are catalog-enum-bounded; one contingency aggregate.
    """
    base = part.select("p_brand", "p_type")
    cells = base.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("nij")
    )
    mb = base.groupBy("p_brand").agg(F.count(F.lit(1)).alias("ni"))
    mt = base.groupBy("p_type").agg(F.count(F.lit(1)).alias("nj"))
    n = base.agg(F.count(F.lit(1)).alias("n"))
    contrib = F.floor(
        F.lit(1_000_000.0)
        * (
            F.col("nij").cast("double")
            - F.col("ni").cast("double") * F.col("nj") / F.col("n")
        )
        * (
            F.col("nij").cast("double")
            - F.col("ni").cast("double") * F.col("nj") / F.col("n")
        )
        / (F.col("ni").cast("double") * F.col("nj") / F.col("n"))
    ).cast("long")
    e_cell_e6 = F.floor(
        F.lit(1_000_000.0)
        * F.col("ni").cast("double")
        * F.col("nj")
        / F.col("n")
    ).cast("long")
    agg = (
        cells.join(F.broadcast(mb), "p_brand")
        .join(F.broadcast(mt), "p_type")
        .crossJoin(F.broadcast(n))
        .agg(
            F.max("n").cast("long").alias("n_parts"),
            F.count_distinct("p_brand").alias("n_brands"),
            F.count_distinct("p_type").alias("n_types"),
            (
                F.sum(contrib)
                + F.max("n") * F.lit(1_000_000)
                - F.sum(e_cell_e6)
            ).cast("long").alias("chi2_e6"),
        )
    )
    # V = sqrt(chi2 / (n * min(r-1, c-1)))
    return agg.select(
        "n_parts",
        F.col("n_brands").cast("long").alias("n_brands"),
        F.col("n_types").cast("long").alias("n_types"),
        "chi2_e6",
        F.floor(
            F.lit(10_000.0)
            * F.sqrt(
                F.col("chi2_e6").cast("double")
                / 1_000_000.0
                / (
                    F.col("n_parts").cast("double")
                    * F.least(
                        F.col("n_brands") - 1, F.col("n_types") - 1
                    )
                )
            )
        ).cast("long").alias("cramers_v_e4"),
    )


def spend_consistency(orders: DataFrame) -> DataFrame:
    """Spend-consistency bands: customers bucketed by the coefficient
    of variation of their order values — steady subscribers (CV near
    0) vs spiky opportunists (CV above 1), the segmentation axis RFM
    misses entirely. CV per customer from exact integer sufficient
    statistics (population form: sqrt(n*s2 - s1^2)/s1 — one shared
    double per customer); bands at 0.25/0.5/1.0. Customers need >= 2
    orders.

    One customer-grain aggregate + a 4-row band rollup; the s1^2 and
    n*s2 products are computed in shared doubles (the int64-overflow
    guard for corpus-scale spend sums).
    """
    g = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("s1"),
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
            * F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("s2"),
    ).where((F.col("n") >= 2) & (F.col("s1") > 0))
    cv_e2 = F.floor(
        F.lit(100.0)
        * F.sqrt(
            F.greatest(
                F.lit(0.0),
                F.col("n").cast("double") * F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double"),
            )
        )
        / F.col("s1").cast("double")
    ).cast("long")
    banded = g.select(
        cv_e2.alias("cv_e2"),
    ).select(
        F.when(F.col("cv_e2") < 25, "steady")
        .when(F.col("cv_e2") < 50, "moderate")
        .when(F.col("cv_e2") < 100, "variable")
        .otherwise("spiky")
        .alias("band")
    )
    tot = Window.partitionBy()
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_customers")
    ).select(
        "band",
        "n_customers",
        F.expr(
            "(10000 * n_customers) div sum(n_customers) OVER ()"
        ).alias("share_bp"),
    )


def error_rate_daily(events: DataFrame) -> DataFrame:
    """Daily error-rate SLO readout: errors per mille of all events,
    with a breach flag against a DATA-DERIVED threshold (twice the
    median daily rate — a fixed '1%' goes vacuous or always-on
    depending on the corpus; the scale-aware-threshold rule). The
    ops dashboard's top-left tile.

    One day-grain conditional aggregate; the median rate comes from
    the standard histogram rank selection over the bounded daily
    series (1-row attach); breach by integer cross-multiplication.
    """
    daily = events.groupBy(
        F.to_date("ts").cast("string").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("event_type") == "error").cast("long"))
        .cast("long")
        .alias("n_errors"),
    ).withColumn(
        "rate_pm", F.expr("(1000 * n_errors) div n_events")
    )
    hist = daily.groupBy("rate_pm").agg(F.count(F.lit(1)).alias("t"))
    w = Window.orderBy("rate_pm").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    med = (
        hist.select(
            "rate_pm",
            F.sum("t").over(w).alias("cum"),
            F.sum("t").over(Window.partitionBy()).alias("tot"),
        )
        .where(2 * F.col("cum") >= F.col("tot"))
        .agg(F.min("rate_pm").alias("med_pm"))
    )
    return daily.crossJoin(F.broadcast(med)).select(
        "day",
        "n_events",
        "n_errors",
        "rate_pm",
        (F.col("rate_pm") > 2 * F.col("med_pm")).alias("breach"),
    )


def segment_mix_drift(events: DataFrame) -> DataFrame:
    """Revenue-mix drift at event-type grain between the corpus
    halves: each type's share of revenue pre and post, with the
    share delta in bp — the mix-shift companion to psi_value_drift
    (PSI scores VALUE drift inside a type; this watches the mix
    BETWEEN types). Enum-bounded output; one (type, half) aggregate
    + per-half total attaches.
    """
    mid = events.agg(
        F.expr(
            "min(to_date(ts)) + CAST(datediff(max(to_date(ts)), "
            "min(to_date(ts))) div 2 AS INT)"
        ).alias("mid_day")
    )
    rev = (
        events.crossJoin(F.broadcast(mid))
        .groupBy(
            "event_type",
            (F.to_date("ts") > F.col("mid_day"))
            .cast("long")
            .alias("h"),
        )
        .agg(
            F.sum(
                F.round(F.col("value") * 100).cast("long")
            ).alias("cents")
        )
    )
    tot = Window.partitionBy("h")
    shares = rev.select(
        "event_type",
        "h",
        F.expr(
            "(10000 * cents) div sum(cents) OVER (PARTITION BY h)"
        ).alias("share_bp"),
    )
    pre = shares.where(F.col("h") == 0).select(
        "event_type", F.col("share_bp").alias("share_pre_bp")
    )
    post = shares.where(F.col("h") == 1).select(
        "event_type", F.col("share_bp").alias("share_post_bp")
    )
    return pre.join(post, "event_type", "full_outer").select(
        "event_type",
        F.coalesce("share_pre_bp", F.lit(0)).alias("share_pre_bp"),
        F.coalesce("share_post_bp", F.lit(0)).alias("share_post_bp"),
        (
            F.coalesce("share_post_bp", F.lit(0))
            - F.coalesce("share_pre_bp", F.lit(0))
        ).alias("drift_bp"),
    )


def brand_price_dispersion(part: DataFrame) -> DataFrame:
    """Catalog pricing discipline per brand: the coefficient of
    variation of retail prices — a brand whose CV explodes has either
    a broad range strategy or a price-entry problem; either way the
    merchandiser wants the list. Exact sufficient statistics per
    brand (enum-bounded), variance term in shared doubles (the
    corpus-scale overflow guard), CV in e2 with the brand's price
    span as evidence.
    """
    g = part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.round(F.col("p_retailprice") * 100).cast("long")
        ).alias("s1"),
        F.sum(
            F.round(F.col("p_retailprice") * 100).cast("long")
            * F.round(F.col("p_retailprice") * 100).cast("long")
        ).alias("s2"),
        F.min(
            F.round(F.col("p_retailprice") * 100).cast("long")
        ).alias("min_cents"),
        F.max(
            F.round(F.col("p_retailprice") * 100).cast("long")
        ).alias("max_cents"),
    ).where((F.col("n") >= 2) & (F.col("s1") > 0))
    return g.select(
        "p_brand",
        F.col("n").cast("long").alias("n_parts"),
        F.col("min_cents").cast("long").alias("min_cents"),
        F.col("max_cents").cast("long").alias("max_cents"),
        F.floor(
            F.lit(100.0)
            * F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    F.col("n").cast("double")
                    * F.col("s2").cast("double")
                    - F.col("s1").cast("double")
                    * F.col("s1").cast("double"),
                )
            )
            / F.col("s1").cast("double")
        ).cast("long").alias("cv_e2"),
    )
