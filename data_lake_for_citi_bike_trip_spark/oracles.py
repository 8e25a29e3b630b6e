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

# ---------------------------------------------------------------------------
# Analytics-layer oracles (operators/analytics.py, asof.py, setops.py)
# ---------------------------------------------------------------------------

PRICING_SUMMARY = r"""
SELECT
  l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(avg(l_quantity), 4) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

TOP_STATIONS = with_staging(
    r"""
SELECT start_station_id, rides, rnk FROM (
  SELECT start_station_id, rides,
         CAST(row_number() OVER (ORDER BY rides DESC, start_station_id ASC) AS BIGINT) AS rnk
  FROM (
    SELECT start_station_id, COUNT(*) AS rides FROM trips GROUP BY 1
  )
) WHERE rnk <= 10
"""
)

RIDES_PER_HOUR = with_staging(
    r"""
SELECT
  CAST(hour(starttime) AS BIGINT) AS hour,
  CAST(dayofweek(starttime) + 1 AS BIGINT) AS weekday,
  COUNT(*) AS rides
FROM trips GROUP BY 1, 2
"""
)

REVENUE_BY_NATION = r"""
SELECT
  r_name AS region_name,
  n_name AS nation_name,
  CAST(year(o_orderdate) AS BIGINT) AS order_year,
  round(sum(o_totalprice), 2) AS revenue,
  COUNT(*) AS order_cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2, 3
"""

EVENT_TYPE_PIVOT = r"""
SELECT
  CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS cnt_click,
  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS cnt_view,
  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS cnt_purchase,
  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS cnt_signup,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS cnt_error
FROM events GROUP BY 1
"""

SESSIONIZE = r"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, ts_us, event_id,
    CASE WHEN lag(ts_us) OVER w IS NULL
           OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS new_session
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sessions AS (
  SELECT user_id, ts_us,
    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
  COUNT(*) AS n_events,
  min(ts_us) AS session_start_us,
  max(ts_us) AS session_end_us
FROM sessions GROUP BY 1, 2
"""

ASOF_PURCHASE = r"""
SELECT
  e.event_id,
  e.user_id,
  epoch_us(e.ts) AS ts_us,
  p.p_ts_us AS asof_p_ts_us,
  p.p_value AS asof_p_value
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (
  SELECT user_id, ts, epoch_us(ts) AS p_ts_us, value AS p_value
  FROM events WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts >= p.ts
"""

RANGE_PRICE_MATCH = r"""
SELECT
  l.l_orderkey, l.l_linenumber, l.l_extendedprice,
  p.p_partkey, p.p_retailprice
FROM lineitem l
JOIN part p
  ON l.l_extendedprice >= p.p_retailprice - 5.0
 AND l.l_extendedprice <  p.p_retailprice + 5.0
"""

UNION_BACKFILL = r"""
SELECT event_id, event_type, value, user_id
FROM events WHERE event_type IN ('view', 'click')
UNION ALL BY NAME
SELECT event_id, event_type FROM events WHERE event_type = 'signup'
"""

ANTI_USERS = r"""
SELECT DISTINCT user_id FROM events e
WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = e.user_id)
"""
