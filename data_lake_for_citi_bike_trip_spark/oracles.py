"""DuckDB oracle SQL — ANSI mirrors of every query in ``__spark_entry__``.

These strings run against DuckDB views named after the testdata tables.
They must stay in lockstep with the Spark implementations (operators/*) —
the driver hash-compares row count + schema + order-insensitive values.

Cross-engine parity rules used throughout (verified empirically):
- DuckDB ``concat`` ignores NULLs; Spark ``concat`` propagates -> use ``||``.
- DuckDB ``dayofweek``: Sunday=0..6; Spark: Sunday=1..7 -> ``dayofweek(x)+1``.
- DuckDB ``epoch()`` returns DOUBLE -> always ``::BIGINT``.
- Cross-row float sums are order-dependent -> round at final aggregate in
  BOTH engines; per-row array reductions are deterministic and exact.
- Output columns restricted to {VARCHAR, BIGINT, DOUBLE, BOOLEAN}; dates
  and timestamps are emitted as ISO strings / epoch integers so pandas
  dtype rendering can't diverge.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Staging CTEs — exact mirrors of operators/staging.py. Any edit there MUST
# be reflected here.
# ---------------------------------------------------------------------------

STAGING_CTES = r"""
trips AS (
  SELECT
    ts AS starttime,
    epoch_us(ts) AS start_epoch_us,
    CAST(user_id AS VARCHAR) AS bikeid,
    event_type AS usertype,
    value AS tripduration,
    CAST(user_id % 50 AS VARCHAR) AS start_station_id,
    CAST((user_id * 7 + 3) % 50 AS VARCHAR) AS end_station_id,
    CASE WHEN k % 10 <> 0 THEN CAST(k % 3 AS VARCHAR) END AS gender,
    CASE WHEN k % 13 <> 0 THEN CAST(1950 + k % 70 AS VARCHAR) END AS birth_year
  FROM (
    SELECT *, CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k
    FROM events
  )
),
covid AS (
  SELECT
    strftime(d, '%m/%d/%Y') AS date_of_interest,
    case_count, probable_case_count, bx_case_count, bk_case_count
  FROM (
    SELECT
      CAST(ts AS DATE) AS d,
      COUNT(*) AS case_count,
      COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS probable_case_count,
      COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS bx_case_count,
      COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS bk_case_count
    FROM events GROUP BY 1
  ) WHERE day(d) % 7 <> 0
),
weather_base AS (
  SELECT
    CAST(epoch(obs_hour) AS BIGINT) - 540 AS valid_time_gmt,
    temp, rh, gust, pressure, wx_phrase,
    hour(obs_hour) AS obs_hour_of_day
  FROM (
    SELECT
      date_trunc('hour', ts) AS obs_hour,
      max(value) AS temp,
      COUNT(*) AS rh,
      max(CASE WHEN event_type = 'error' THEN value END) AS gust,
      min(value) AS pressure,
      max(event_type) AS wx_phrase
    FROM events GROUP BY 1
  ) WHERE hour(obs_hour) <> 3
),
weather AS (
  SELECT valid_time_gmt, temp, rh, gust, pressure, wx_phrase FROM weather_base
  UNION ALL
  SELECT valid_time_gmt, temp, rh, gust, pressure, wx_phrase
  FROM weather_base WHERE obs_hour_of_day = 7
),
stations AS (
  SELECT
    CAST(c_custkey AS VARCHAR) AS station_id,
    c_name AS name,
    CAST(c_nationkey AS VARCHAR) AS region_id,
    c_acctbal AS lat,
    c_mktsegment AS station_type
  FROM customer
)
"""


def with_staging(select_sql: str) -> str:
    return f"WITH {STAGING_CTES} {select_sql}"


# ---------------------------------------------------------------------------
# Star-schema oracles (operators/star.py)
# ---------------------------------------------------------------------------

FACT_TRIPS = with_staging(
    r"""
SELECT
  md5(CAST(t.start_epoch_us AS VARCHAR) || t.bikeid) AS id,
  t.start_epoch_us,
  t.tripduration AS duration,
  t.start_station_id,
  t.end_station_id,
  t.bikeid,
  t.usertype,
  t.usertype || t.gender || t.birth_year AS user_agg_id,
  CAST(c.covid_id AS VARCHAR) AS covid_id,
  w.weather_id,
  CAST(year(t.starttime) AS BIGINT) AS year,
  CAST(month(t.starttime) AS BIGINT) AS month
FROM trips t
LEFT JOIN (
  SELECT CAST(strptime(date_of_interest, '%m/%d/%Y') AS DATE) AS covid_id
  FROM covid
) c ON CAST(t.starttime AS DATE) = c.covid_id
LEFT JOIN (
  SELECT valid_time_gmt AS weather_id FROM weather
) w ON CAST(epoch(date_trunc('hour', t.starttime)) AS BIGINT) - 540 = w.weather_id
"""
)

DIM_TIME = with_staging(
    r"""
SELECT
  start_epoch_us,
  CAST(minute(starttime) AS BIGINT) AS minute,
  CAST(hour(starttime) AS BIGINT) AS hour,
  CAST(day(starttime) AS BIGINT) AS day,
  CAST(weekofyear(starttime) AS BIGINT) AS week,
  CAST(dayofweek(starttime) + 1 AS BIGINT) AS weekday,
  CAST(year(starttime) AS BIGINT) AS year,
  CAST(month(starttime) AS BIGINT) AS month
FROM (SELECT DISTINCT starttime, start_epoch_us FROM trips)
"""
)

DIM_USER_AGG = with_staging(
    r"""
SELECT DISTINCT
  usertype || gender || birth_year AS user_agg_id,
  usertype, gender, birth_year
FROM trips
"""
)

DIM_BIKE = with_staging("SELECT DISTINCT bikeid AS bike_id FROM trips")

DIM_COVID = with_staging(
    r"""
SELECT
  CAST(CAST(strptime(date_of_interest, '%m/%d/%Y') AS DATE) AS VARCHAR) AS covid_id,
  case_count, probable_case_count, bx_case_count, bk_case_count
FROM covid
"""
)

DIM_WEATHER = with_staging(
    r"""
SELECT DISTINCT
  valid_time_gmt AS weather_id,
  temp AS temperature,
  rh AS humidity,
  coalesce(gust, 0.0) AS gust,
  pressure,
  wx_phrase AS condition
FROM weather
"""
)

DIM_STATION = with_staging("SELECT DISTINCT * FROM stations")

DQ_COUNTS = with_staging(
    r"""
SELECT 'trips' AS table_name, COUNT(*) AS row_cnt FROM trips
UNION ALL SELECT 'covid', COUNT(*) FROM covid
UNION ALL SELECT 'weather', COUNT(*) FROM weather
UNION ALL SELECT 'stations', COUNT(*) FROM stations
UNION ALL SELECT 'null_trip_ids', COUNT(*) FROM trips WHERE bikeid IS NULL
"""
)
