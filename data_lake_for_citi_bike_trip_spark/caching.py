"""Session-lifetime cache registry for operator-internal persists.

Several operators cache an intermediate that the RETURNED lazy plan
consumes more than once (LSH signature tables feeding both the rep
aggregation and the member expansion; graph edge lists feeding every
iteration of an iterative algorithm). The operator cannot unpersist
before returning — the cache must outlive the call, because the caller
may trigger the plan at any later time. Spark's ``CacheManager`` holds
cached plans by strong reference, so without an explicit release these
accumulate for the life of the session.

The contract: operators register such caches via :func:`cached`, and a
long-lived session (a notebook, a service) reclaims them at a point
where no previously returned plan will be re-executed by calling
:func:`release_caches`. Short-lived jobs (the bench, the driver's
correctness runs) never need to — the session teardown reclaims
everything. ``spark.catalog.clearCache()`` remains the indiscriminate
alternative; this registry only releases what operators registered, so
caller-owned caches survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_REGISTRY: list[DataFrame] = []
_RELEASE_CALLBACKS: list = []
_DATA_RELEASE_CALLBACKS: list = []


def on_release(cb) -> None:
    """Register a zero-arg callback run by :func:`release_caches` —
    for operator-level memos whose lifetime must match the cache
    registry's (e.g. the salted-join gate memo in operators.skew)."""
    _RELEASE_CALLBACKS.append(cb)


def on_data_release(cb) -> None:
    """Register a zero-arg callback run by :func:`release_data_caches`
    (and, transitively, by :func:`release_caches`) — for module-level
    holders of MATERIALIZED data (e.g. the ANN index caches in the
    entry surface) as opposed to plan-handle/metadata memos. The split
    exists so a caller can drop every byte of cached DATA while keeping
    the cheap plan memos (schema-inference handles, gate scalars) —
    what a cold-cost benchmark wants between repeats."""
    _DATA_RELEASE_CALLBACKS.append(cb)


def cached(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register for later :func:`release_caches`."""
    df = df.cache()
    _REGISTRY.append(df)
    return df


def register(df: DataFrame) -> DataFrame:
    """Register an ALREADY-cached DataFrame for :func:`release_caches`.

    For operators that cache eagerly to answer a metadata-scale gate
    question and only then learn whether the returned plan will consume
    the cache (if not, they unpersist on the spot instead)."""
    _REGISTRY.append(df)
    return df


def release_data_caches(blocking: bool = False) -> int:
    """Unpersist every operator-registered DataFrame cache and run the
    data-release callbacks; returns how many registry entries dropped.

    Unlike :func:`release_caches` this does NOT clear the plan-handle /
    metadata memos (load_table handles, ts-sniff flags, gate scalars) —
    only materialized data goes. Re-execution after release is still
    CORRECT (Spark recomputes from source), just cold."""
    n = 0
    while _REGISTRY:
        df = _REGISTRY.pop()
        try:
            df.unpersist(blocking)
        except Exception:
            pass  # session already stopped — nothing to release
        n += 1
    for cb in _DATA_RELEASE_CALLBACKS:
        try:
            cb()
        except Exception:
            pass
    return n


def release_caches(blocking: bool = False) -> int:
    """Unpersist every operator-registered cache; returns how many.

    Call only when no DataFrame previously returned by an operator will
    be executed again (re-execution after release is still CORRECT —
    Spark recomputes from source — just no longer cached)."""
    n = release_data_caches(blocking)
    for cb in _RELEASE_CALLBACKS:
        try:
            cb()
        except Exception:
            pass
    return n


def registered_count() -> int:
    return len(_REGISTRY)
