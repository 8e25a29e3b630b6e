"""Surrogate/derived key expressions (SURVEY.md §1.1, §2.8).

The reference derives every key with scalar expressions inside Spark SQL;
we keep them as composable Column functions so fact and dim sides are
guaranteed to use the *same* expression (the property that makes the
reference's NULL-keyed joins self-consistent, SURVEY.md §2.12 #5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference's weather feed observes at :51 past each hour; its join
#: key is the trip's hour-truncated epoch minus 540 s (spark_elt_emr.py:79).
#: Named constant per SURVEY.md §4.
WEATHER_OBS_OFFSET_SECONDS = 540


def trip_id(starttime_epoch_us: Column, bikeid: Column) -> Column:
    """Fact PK: md5 over (start time, bike id) — spark_elt_emr.py:64.

    The reference hashes the raw starttime *string*; we hash the exact
    integer epoch-micros rendering instead so the key is independent of
    timestamp-to-string formatting (which differs across engines/configs).
    NULL-propagating concat is preserved: a NULL input => NULL id.
    """
    return F.md5(F.concat(starttime_epoch_us.cast("string"), bikeid))


def user_agg_id(usertype: Column, gender: Column, birth_year: Column) -> Column:
    """Degenerate composite key (spark_elt_emr.py:72,110).

    Deliberately uses NULL-propagating ``concat`` (not concat_ws): any NULL
    component nulls the whole key, matching reference semantics — dim and
    fact agree because both call this function.
    """
    return F.concat(usertype, gender, birth_year)


def hour_bucket_epoch(ts: Column) -> Column:
    """J2's as-of alignment key (spark_elt_emr.py:78-79).

    Idiomatic form of the reference's string-slice trick
    (``substr(starttime, 0, 13)`` + ':00:00'): truncate to the hour,
    convert to epoch seconds, subtract the observation offset. Requires
    the session timezone pinned to UTC (session.RUNTIME_CONF).
    """
    return (
        F.unix_seconds(F.date_trunc("hour", ts).cast("timestamp"))
        - WEATHER_OBS_OFFSET_SECONDS
    ).cast("bigint")
