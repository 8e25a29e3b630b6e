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
- Ratios/means/probabilities are emitted as INTEGER basis points
  (``(10000 * x) div y`` / ``// y``): float rounding is engine-dependent
  at ``..5`` boundaries, integer division never is. Keep numerators
  non-negative — Spark ``div`` truncates toward zero while DuckDB ``//``
  floors, and they only agree on non-negative operands.
- Per-key date spines: DuckDB ``generate_series`` is not lateral-capable;
  use the scalar ``unnest(generate_series(...))`` form.
- ``list_zip`` + ``unnest`` yields UNNAMED structs -> index ``z[1]``.
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

# Lake round-trip: aggregate over the FULL fact result (weather fan-out
# included) filtered to the 2024-01 partition — the parquet write/read
# hop on the Spark side must be value-neutral.
LAKE_ROUNDTRIP = f"""
SELECT usertype,
       COUNT(*) AS n_trips,
       COUNT(DISTINCT bikeid) AS n_bikes,
       min(start_epoch_us) AS first_trip_us,
       max(start_epoch_us) AS last_trip_us
FROM ({FACT_TRIPS}) f
WHERE f.year = 2024 AND f.month = 1
GROUP BY 1
"""

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

ASOF_FORWARD = r"""
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
) p ON e.user_id = p.user_id AND e.ts <= p.ts
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

# ---------------------------------------------------------------------------
# LLM-pipeline extension oracles (operators/dedup.py, similarity.py,
# text.py, multimodal.py). Repetitive SQL (16 minhash columns, 32 simhash
# bits) is generated so the formulas can't drift per-column.
# ---------------------------------------------------------------------------

_TOKS = r"list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"

#: word 3-grams, distinct, guarded for short docs — mirror of
#: functions.text.word_shingles(n=3)
_SHINGLES = (
    "list_distinct(CASE WHEN len(w) >= 3 "
    "THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' ')) "
    "ELSE [] END)"
)

_N_PERMS, _BAND_SIZE, _N_BANDS = 16, 4, 4

# One md5 per shingle; permutations from the pairwise-independent family
# (a_i*h + b_i) mod p — constants imported so both engines share them
# (mirror of functions.text.minhash_agg_columns).
from .functions.text import MINHASH_COEFFS as _COEFFS
from .functions.text import MINHASH_PRIME as _PRIME

_SIG_COLS = ",\n    ".join(
    f"min(({a} * h + {b}) % {_PRIME}) AS mh_{i}"
    for i, (a, b) in enumerate(_COEFFS[:_N_PERMS])
)
_BAND_SELECTS = "\n  UNION ALL ".join(
    "SELECT doc_id, {b} AS band_no, md5(concat_ws(',', {cols})) AS key FROM sigs".format(
        b=b,
        cols=", ".join(f"mh_{i}" for i in range(b * _BAND_SIZE, (b + 1) * _BAND_SIZE)),
    )
    for b in range(_N_BANDS)
)
_MATCHES = " + ".join(
    f"CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END" for i in range(_N_PERMS)
)

_DOC_SIGS = f"""
toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
shingled AS (SELECT doc_id, {_SHINGLES} AS sh FROM toks),
postings AS (SELECT doc_id, unnest(sh) AS s FROM shingled),
hashed AS (
  SELECT doc_id, CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) AS h
  FROM postings
),
sigs AS (
  SELECT doc_id,
    {_SIG_COLS}
  FROM hashed GROUP BY doc_id
)
"""

DEDUP_EXACT = """
WITH source AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, lang, source, n_chars
  FROM documents WHERE doc_id % 10 = 0
)
SELECT md5(text) AS content_hash,
       COUNT(*) AS copies,
       min(doc_id) AS survivor_doc_id
FROM source GROUP BY 1
"""

DEDUP_MINHASH = f"""
WITH {_DOC_SIGS},
bands AS (
  {_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b
    ON a.band_no = b.band_no AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT d1, d2,
  CAST({_MATCHES} AS DOUBLE) / {_N_PERMS} AS est_jaccard
FROM cand
JOIN sigs sa ON sa.doc_id = d1
JOIN sigs sb ON sb.doc_id = d2
WHERE CAST({_MATCHES} AS DOUBLE) / {_N_PERMS} >= 0.5
"""

# operators/dedup.py:incremental_dedup — new shard (src0-src4) deduped
# against the existing corpus (the rest): exact content-hash tier takes
# precedence over the banded-MinHash near tier; dup_of = smallest
# matching old doc_id. Signatures/bands mirror _DOC_SIGS exactly; the
# join is asymmetric (new x old only).
_NEW_SOURCES = "('src0','src1','src2','src3','src4')"

DEDUP_INCREMENTAL = f"""
WITH {_DOC_SIGS},
newdocs AS (SELECT * FROM documents WHERE source IN {_NEW_SOURCES}),
olddocs AS (SELECT * FROM documents WHERE source NOT IN {_NEW_SOURCES}),
old_hashes AS (
  SELECT md5(text) AS content_hash, min(doc_id) AS dup_of FROM olddocs GROUP BY 1
),
exact AS (
  SELECT n.doc_id, oh.dup_of, 'exact' AS reason
  FROM newdocs n JOIN old_hashes oh ON md5(n.text) = oh.content_hash
),
bands AS (
  {_BAND_SELECTS}
),
new_bands AS (SELECT b.* FROM bands b JOIN newdocs USING (doc_id)),
old_bands AS (SELECT b.* FROM bands b JOIN olddocs USING (doc_id)),
cand AS (
  SELECT DISTINCT a.doc_id AS nd, b.doc_id AS od
  FROM new_bands a JOIN old_bands b ON a.band_no = b.band_no AND a.key = b.key
),
near AS (
  SELECT nd AS doc_id, min(od) AS dup_of, 'near' AS reason
  FROM cand
  JOIN sigs sa ON sa.doc_id = nd
  JOIN sigs sb ON sb.doc_id = od
  WHERE CAST({_MATCHES} AS DOUBLE) / {_N_PERMS} >= 0.5
  GROUP BY nd
),
flagged AS (
  SELECT * FROM exact
  UNION ALL
  SELECT * FROM near WHERE doc_id NOT IN (SELECT doc_id FROM exact)
)
SELECT n.doc_id, f.reason IS NOT NULL AS is_dup, f.dup_of, f.reason
FROM newdocs n LEFT JOIN flagged f ON n.doc_id = f.doc_id
"""

# Connected components over the minhash near-dup pairs as a recursive
# transitive closure: every node starts labeled with itself; labels
# propagate along (symmetrized) edges; min reachable label = component id.
# Mirrors operators.dedup.connected_components' fixpoint exactly.
DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS (
  SELECT d1, d2 FROM ({DEDUP_MINHASH})
),
edges AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION ALL
  SELECT d2 AS src, d1 AS dst FROM pairs
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.node
)
SELECT node AS doc_id,
       min(label) AS cluster_id,
       (node = min(label)) AS is_survivor
FROM reach GROUP BY node
"""

# SimHash per-bit majority as a GROUP BY aggregate over exploded token
# hashes (mirror of functions.text.simhash_agg)
_SIMHASH_SUM = " + ".join(
    f"(CASE WHEN 2 * sum((h >> {j}) & 1) >= count(*) "
    f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
    for j in range(32)
)

_SIMHASH_DOCS = f"""
toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
exploded AS (SELECT doc_id, unnest(w) AS t FROM toks),
hashed AS (
  SELECT doc_id, CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) AS h
  FROM exploded
),
sim AS (SELECT doc_id, {_SIMHASH_SUM} AS simhash FROM hashed GROUP BY doc_id)
"""

DEDUP_SIMHASH_DOCS = f"WITH {_SIMHASH_DOCS} SELECT doc_id, simhash FROM sim"

# Banded pigeonhole candidates: max_hamming+1 = 5 bands over the 32-bit
# hash (widths 7,7,6,6,6) — exact mirror of
# operators.dedup.simhash_band_layout / simhash_pairs_from_signatures.
from .operators.dedup import simhash_band_layout as _simhash_band_layout

_SIMHASH_BANDS = "\n  UNION ALL\n  ".join(
    f"SELECT doc_id, simhash, "
    f"'{i}:' || CAST((simhash >> {off}) & {(1 << width) - 1} AS VARCHAR) "
    f"AS band_key FROM sim"
    for i, (off, width) in enumerate(_simhash_band_layout(5))
)

DEDUP_SIMHASH_PAIRS = f"""
WITH {_SIMHASH_DOCS},
bands AS (
  {_SIMHASH_BANDS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
         a.simhash AS s1, b.simhash AS s2
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(s1, s2)) <= 4
"""

# Frequency cap mirror: default max_doc_frequency=0.2 -> cap_bp=2000;
# integer comparison df*10000 > n_docs*2000 matches the Spark plan exactly.
DEDUP_NGRAM_JACCARD = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
shingled AS (SELECT doc_id, {_SHINGLES} AS sh FROM toks),
postings_all AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM shingled),
ndocs AS (SELECT COUNT(*) AS n_docs FROM documents),
hot AS (
  SELECT s FROM (SELECT s, COUNT(*) AS df FROM postings_all GROUP BY 1), ndocs
  WHERE df * 10000 > n_docs * 2000
),
postings AS (
  SELECT p.doc_id, p.s FROM postings_all p ANTI JOIN hot h ON p.s = h.s
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM postings GROUP BY 1),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM postings a JOIN postings b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = d1
JOIN sizes sb ON sb.doc_id = d2
WHERE round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) >= 0.5
"""

# -- vectors ----------------------------------------------------------------

_DOT = "list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"


def _cos(a: str, b: str) -> str:
    return (
        f"round({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})), 6)"
    )


#: fixed-width sign bucket (lsh_bucket_topk's serving-path contract)
_SIGN_BUCKET = (
    "array_to_string(list_transform({v}[1:8], "
    "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"
)

#: corpus-size-derived sign bucket — mirrors similarity.auto_bucket_bits
#: (clamp(ceil(log2(n)) - 3, 4, 24)) for the dedup embedding family;
#: requires a ``bits(b)`` CTE in scope.
_SIGN_BUCKET_DYN = (
    "substring(array_to_string(list_transform({v}[1:24], "
    "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), ''), "
    "1, (SELECT b FROM bits))"
)

DEDUP_EMBEDDING = f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x * 2.0)
  FROM embeddings WHERE vec_id % 20 = 0
),
bits AS (
  SELECT GREATEST(4, LEAST(24, CAST(CEIL(LOG2(GREATEST(COUNT(*), 2)))
    AS INT) - 3)) AS b FROM corpus
),
bucketed AS (
  SELECT vec_id, v, {_SIGN_BUCKET_DYN.format(v='v')} AS bucket FROM corpus
)
SELECT a.vec_id AS d1, b.vec_id AS d2, {_cos('a.v', 'b.v')} AS cos_sim
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_cos('a.v', 'b.v')} >= 0.999
"""

# Checked projection of the HLL operator: exact count cross-verified,
# engine-specific sketch asserted via its 5% bound flag (uniformly TRUE).
APPROX_DISTINCT_USERS = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_ok
FROM events GROUP BY 1
"""

# IVF companion: recall_ok must be uniformly TRUE for the 10 query ids
# (the Spark side computes hits vs its own oracle-verified brute-force
# top-k; k-means itself is iterative and not SQL-expressible).
ANN_IVF_RECALL = """
SELECT DISTINCT vec_id AS q_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 10
"""


def _subdot(a: str, b: str, j: int, sub: int = 16) -> str:
    off = j * sub
    return (
        f"list_sum(list_transform(range(1, {sub + 1}), "
        f"i -> {a}[{off} + i] * {b}[{off} + i]))"
    )


def _pq_cos(a: str, b: str, m: int = 4) -> str:
    """Subspace-decomposed cosine — the EXACT float-addition order of
    similarity.pq_search's ordered fold (partial dots per 16-dim
    subspace, then a left-assoc chain), so the lossless PQ path matches
    bit-for-bit."""
    dot = " + ".join(_subdot(a, b, j) for j in range(m))
    an2 = " + ".join(_subdot(a, a, j) for j in range(m))
    bn2 = " + ".join(_subdot(b, b, j) for j in range(m))
    return f"round(({dot}) / (sqrt({an2}) * sqrt({bn2})), 6)"


# __spark_entry__.q_ann_pq_topk runs product quantization in the
# LOSSLESS configuration (codebook = every distinct subvector), where
# asymmetric-distance cosine equals exact subspace-decomposed cosine —
# SQL-expressible. The lossy path is covered by ANN_PQ_RECALL.
ANN_PQ_TOPK = f"""
WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
queries AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q_id, vec_id, {_pq_cos('qv', 'v')} AS cos_pq_r6
  FROM corpus CROSS JOIN queries WHERE vec_id <> q_id
)
SELECT q_id, vec_id, cos_pq_r6, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
            ORDER BY cos_pq_r6 DESC, vec_id ASC) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 10
"""

ANN_PQ_RECALL = """
SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_queries, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 10
"""

# sources/pydatasource.py — the synthetic feed is pure integer
# arithmetic over row ids, reproduced from generate_series.
PYSOURCE_AGG = """
SELECT i % 97 AS user_id,
       COUNT(*) AS n,
       CAST(sum((i * 37) % 10000) AS BIGINT) AS total_cents,
       max(i) AS max_event_id
FROM (SELECT unnest(generate_series(0, 49999)) AS i)
GROUP BY 1
"""

# operators/analytics.py:variant_props_rollup — variant path extraction
# mirrors to plain JSON extraction; outputs all-integer.
VARIANT_PROPS_ROLLUP = """
SELECT event_type,
       COUNT(*) AS n_events,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
"""

# operators/profile.py:hll_incremental_distinct — the sketch union is
# engine-specific; the oracle pins the exact column and expects the
# 5%-bound flag TRUE (datasketches HLL at lgK=12 is ~1.6% typical).
HLL_INCREMENTAL_DISTINCT = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS hll_ok
FROM events
GROUP BY 1
"""

# __spark_entry__.q_orc_roundtrip — the ORC hop is value-invisible, so
# the oracle is the plain aggregate over the source table. Cents are
# per-row rounded THEN summed: integer-valued doubles below 2^53 sum
# exactly in any order.
ORC_ROUNDTRIP = """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       min(o_orderkey) AS min_orderkey,
       max(o_orderkey) AS max_orderkey,
       CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS total_cents
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""

# Semantic dedup: recursive closure over the embedding cosine pairs;
# nodes are the corpus incl. the planted colinear copies.
SEMANTIC_DEDUP = f"""
WITH RECURSIVE pairs AS (
  SELECT d1, d2 FROM ({DEDUP_EMBEDDING})
),
nodes AS (
  SELECT vec_id FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 FROM embeddings WHERE vec_id % 20 = 0
),
edges AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION ALL
  SELECT d2 AS src, d1 AS dst FROM pairs
),
reach(node, label) AS (
  SELECT vec_id, vec_id FROM nodes
  UNION
  SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.node
)
SELECT node AS vec_id,
       min(label) AS cluster_id,
       (node = min(label)) AS is_survivor
FROM reach GROUP BY node
"""

ANN_COSINE_TOPK = f"""
WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
queries AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q_id, vec_id, {_cos('qv', 'v')} AS cos_sim
  FROM corpus CROSS JOIN queries WHERE vec_id <> q_id
)
SELECT q_id, vec_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 10
"""

# __spark_entry__.q_ann_ivf_topk runs IVF with nprobe == centroid count
# (exhaustive probe): candidate generation covers every inverted list, so
# the result is exactly brute-force top-k over the same ranking — which IS
# SQL-expressible. The pruned-nprobe path is covered by ANN_IVF_RECALL.
ANN_IVF_TOPK = f"""
WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
queries AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q_id, vec_id, {_cos('qv', 'v')} AS cos_sim
  FROM corpus CROSS JOIN queries WHERE vec_id <> q_id
)
SELECT q_id, vec_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 10
"""

ANN_LSH_TOPK = f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {_SIGN_BUCKET.format(v='(embedding::DOUBLE[])')} AS bucket
  FROM embeddings
),
queries AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv,
         {_SIGN_BUCKET.format(v='(embedding::DOUBLE[])')} AS bucket
  FROM embeddings WHERE vec_id < 50
),
scored AS (
  SELECT q_id, vec_id, {_cos('qv', 'v')} AS cos_sim
  FROM corpus JOIN queries USING (bucket) WHERE vec_id <> q_id
)
SELECT q_id, vec_id, cos_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 5
"""

# -- text analysis ----------------------------------------------------------

_LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
}


def _hit_ratio(words: list[str]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return (
        f"CAST(len(list_intersect(dw, {arr})) AS DOUBLE) / "
        f"CAST(greatest(len(dw), 1) AS DOUBLE)"
    )


_LANGS = list(_LANG_STOPWORDS)
_SCORE_SELECTS = ",\n  ".join(
    f"round({_hit_ratio(_LANG_STOPWORDS[lang])}, 6) AS score_{lang}" for lang in _LANGS
)
_RAW_SCORES = ",\n  ".join(
    f"{_hit_ratio(_LANG_STOPWORDS[lang])} AS raw_{lang}" for lang in _LANGS
)
_ARGMAX = "CASE " + " ".join(
    "WHEN "
    + " AND ".join(f"raw_{lang} >= raw_{o}" for o in _LANGS if o != lang)
    + f" THEN '{lang}'"
    for lang in _LANGS
) + " ELSE 'und' END"

TEXT_LANGUAGE_ID = f"""
WITH toks AS (
  SELECT doc_id, lang, list_distinct({_TOKS}) AS dw FROM documents
),
scored AS (
  SELECT doc_id, lang,
  {_SCORE_SELECTS},
  {_RAW_SCORES}
  FROM toks
)
SELECT doc_id, lang AS labeled_lang,
  {", ".join(f"score_{lang}" for lang in _LANGS)},
  {_ARGMAX} AS pred_lang
FROM scored
"""

TEXT_QUALITY = f"""
WITH base AS (
  SELECT doc_id, text, {_TOKS} AS w, list_distinct({_TOKS}) AS dw FROM documents
),
feats AS (
  SELECT doc_id,
    CAST(len(w) AS BIGINT) AS n_tokens,
    CAST(length(text) AS BIGINT) AS n_chars_measured,
    CAST(length(text) AS DOUBLE) / CAST(greatest(len(w), 1) AS DOUBLE) AS mean_word_len,
    {_hit_ratio(_LANG_STOPWORDS["en"])} AS stopword_ratio,
    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
      / CAST(greatest(length(text), 1) AS DOUBLE) AS alpha_ratio
  FROM base
)
SELECT doc_id, n_tokens, n_chars_measured,
  round(mean_word_len, 6) AS mean_word_len,
  round(stopword_ratio, 6) AS stopword_ratio,
  round(alpha_ratio, 6) AS alpha_ratio,
  round(CAST(
    (CASE WHEN n_tokens >= 50 AND n_tokens <= 100000 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 12.0 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN stopword_ratio >= 0.05 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN alpha_ratio >= 0.6 THEN 0.25 ELSE 0.0 END) AS DOUBLE), 2) AS quality
FROM feats
"""

TEXT_TOKEN_STATS = rf"""
WITH base AS (
  SELECT doc_id,
    CAST(len({_TOKS}) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
  FROM documents
)
SELECT doc_id, ws_tokens, bpe_tokens,
  CAST(bpe_tokens AS DOUBLE) / CAST(greatest(ws_tokens, 1) AS DOUBLE) AS subword_ratio
FROM base
"""

TEXT_FINGERPRINT = f"""
WITH toks AS (SELECT doc_id, text, {_TOKS} AS w FROM documents),
shingled AS (SELECT doc_id, w, {_SHINGLES} AS sh FROM toks),
minfp AS (
  SELECT doc_id, min(md5(s)) AS min_shingle_fp
  FROM (SELECT doc_id, unnest(sh) AS s FROM shingled) GROUP BY doc_id
)
SELECT t.doc_id, m.min_shingle_fp,
  md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS bag_fp
FROM toks t LEFT JOIN minfp m ON t.doc_id = m.doc_id
"""

MULTIMODAL_PAYLOAD_STATS = """
SELECT doc_id AS media_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS content_md5,
  (octet_length(encode(text)) + 255) // 256 AS n_chunks
FROM documents
"""

# Unigram surprisal mirror: identical floor(x*1000+0.5) quantization
# before the (then purely integer) per-doc sum.
TEXT_SURPRISAL = f"""
WITH postings AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
),
vocab AS (SELECT token, COUNT(*) AS cf FROM postings GROUP BY 1),
total AS (SELECT SUM(cf) AS total_cf FROM vocab),
scored AS (
  SELECT p.doc_id,
    CAST(floor(log2(CAST(t.total_cf AS DOUBLE) / v.cf) * 1000 + 0.5) AS BIGINT) AS mb
  FROM postings p JOIN vocab v USING (token), total t
)
SELECT doc_id,
  COUNT(*) AS n_tokens,
  CAST(SUM(mb) AS BIGINT) AS surprisal_mb,
  CAST(SUM(mb) // COUNT(*) AS BIGINT) AS avg_surprisal_mb
FROM scored GROUP BY doc_id
"""

# Independent prediction of the BMP builder+parser round-trip: width =
# n_chars%31+1, height = doc_id%17+1, bytes = 54 + 4-padded-row * height.
MULTIMODAL_DECODE_DIMS = """
SELECT doc_id AS media_id,
  CAST(54 + (((n_chars % 31 + 1) * 3 + 3) // 4) * 4 * (doc_id % 17 + 1) AS BIGINT) AS n_bytes,
  CAST(n_chars % 31 + 1 AS BIGINT) AS width,
  CAST(doc_id % 17 + 1 AS BIGINT) AS height,
  CAST(3 AS BIGINT) AS n_channels
FROM documents
"""

# batch equivalent of the stream-stream interval join (inner joins emit
# eagerly, so the availableNow drain matches exactly)
STREAM_INTERVAL_JOIN = """
SELECT e.event_id AS l_event_id, p.event_id AS r_event_id,
       epoch_us(e.ts) AS l_ts_us, epoch_us(p.ts) AS r_ts_us,
       p.value AS r_value
FROM events e JOIN events p
  ON e.user_id = p.user_id
 AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR
WHERE e.event_type = 'error' AND p.event_type = 'purchase'
"""

STREAM_WINDOW_COUNTS = """
SELECT
  epoch_us(date_trunc('hour', ts)) AS window_start_us,
  event_type,
  COUNT(*) AS cnt
FROM events GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# SQL-surface oracles (operators/sqlsurface.py)
# ---------------------------------------------------------------------------

ROLLUP_REVENUE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       o_orderstatus,
       CAST(GROUPING(year(o_orderdate), o_orderstatus) AS BIGINT) AS gid,
       COUNT(*) AS order_cnt,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
"""

CUBE_PRIORITY = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS order_cnt
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

GROUPING_SETS_ORDERS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS order_cnt,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

# The incremental merge must equal the from-scratch aggregate.
INCREMENTAL_AGG = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type, COUNT(*) AS cnt
FROM events GROUP BY 1, 2
"""

# percent_rank/cume_dist are exact integer ratios under a total order —
# emitted unrounded (both engines divide the same integers).
WINDOW_FUNCS = """
SELECT o_orderkey, o_custkey,
  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume,
  first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
  lag(o_totalprice) OVER w AS prev_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

# exact percentile cross-verified; the engine-specific sketch asserted
# via its error-bound flag (uniformly TRUE), as for approx_distinct_users
APPROX_PERCENTILE = """
SELECT l_returnflag,
  round(quantile_cont(l_quantity, 0.5), 4) AS exact_p50,
  TRUE AS approx_ok
FROM lineitem GROUP BY 1
"""

SCD1_CUSTOMERS = """
WITH cust AS (SELECT c_custkey, c_name, c_mktsegment FROM customer),
batch AS (
  SELECT c_custkey, c_name, 'RELOADED' AS c_mktsegment FROM cust WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey + 1000000, c_name, c_mktsegment FROM cust WHERE c_custkey % 7 = 0
)
SELECT c.c_custkey, c.c_name, c.c_mktsegment FROM cust c
ANTI JOIN batch b ON c.c_custkey = b.c_custkey
UNION ALL
SELECT * FROM batch
"""

# the salted join must be result-identical to the plain join the oracle
# computes directly
SKEW_SALTED_AGG = """
SELECT 'flag_' || l_returnflag AS flag_label,
       COUNT(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY 1
"""

VECTOR_NORMS = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id,
  CAST(len(v) AS BIGINT) AS dims,
  round(sqrt({_DOT.format(a='v', b='v')}), 6) AS l2_norm,
  round(v[1] / sqrt({_DOT.format(a='v', b='v')}), 6) AS unit_first,
  round(list_sum(v) / len(v), 6) AS mean_component
FROM e
"""

INTERSECT_USERS = """
SELECT user_id FROM events WHERE day(CAST(ts AS DATE)) <= 15
INTERSECT
SELECT user_id FROM events WHERE day(CAST(ts AS DATE)) > 15
"""

EXCEPT_PARTS = """
SELECT p_partkey FROM part
EXCEPT
SELECT l_partkey FROM lineitem
WHERE l_quantity >= 49 AND l_discount >= 0.08
"""

EXISTS_BIG_SPENDERS = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
"""

ABOVE_AVERAGE_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT 1.5 * round(avg(o_totalprice), 2) FROM orders)
"""

CTE_MONTHLY_TOP_SEGMENT = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         c_mktsegment,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY y, m ORDER BY revenue DESC, c_mktsegment ASC
         ) AS BIGINT) AS rnk
  FROM monthly
)
SELECT y, m, c_mktsegment, revenue FROM ranked WHERE rnk = 1
"""

STREAM_USER_TOTALS = """
SELECT user_id, COUNT(*) AS total_events FROM events GROUP BY 1
"""

# ---------------------------------------------------------------------------
# Corpus data-prep oracles (operators/corpus.py)
# ---------------------------------------------------------------------------

_HB = "CAST('0x' || substr(md5({key}), 1, 8) AS BIGINT) % 100"

TRAIN_TEST_SPLIT = f"""
SELECT doc_id,
  {_HB.format(key="CAST(doc_id AS VARCHAR) || 'split-v1'")} AS bucket,
  CASE WHEN {_HB.format(key="CAST(doc_id AS VARCHAR) || 'split-v1'")} < 10 THEN 'test'
       WHEN {_HB.format(key="CAST(doc_id AS VARCHAR) || 'split-v1'")} < 20 THEN 'val'
       ELSE 'train' END AS split
FROM documents
"""

# pack_sequences mirror: same hash-group assignment, same cumulative
# window, integer bin arithmetic (defaults context_len=512, n_groups=8).
CORPUS_PACK_SEQUENCES = f"""
WITH base AS (
  SELECT doc_id,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'pack-v1'), 1, 8) AS BIGINT) % 8 AS pack_group,
    CAST(len({_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
),
off AS (
  SELECT *, CAST(COALESCE(sum(n_tokens) OVER (
    PARTITION BY pack_group ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
  FROM base
)
SELECT doc_id, pack_group, n_tokens, start_offset,
  start_offset // 512 AS bin_id,
  start_offset % 512 AS bin_offset
FROM off
"""

SAMPLE_BY_HASH = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {_HB.format(key="CAST(doc_id AS VARCHAR) || 'sample-v1'")} < 10
"""

# Stratified mixing mirror (rates en=100/de=50/fr=25/es=25/zh=10).
CORPUS_SAMPLE_STRATIFIED = f"""
SELECT doc_id, lang, source FROM documents
WHERE {_HB.format(key="CAST(doc_id AS VARCHAR) || 'strat-v1'")} <
  CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50 WHEN 'fr' THEN 25
            WHEN 'es' THEN 25 WHEN 'zh' THEN 10 ELSE 0 END
"""

# BM25 mirror: identical float expression tree, fixed-order per-term sum
# (sorted terms: data, hash, vector), ranking on the ROUNDED score.
BM25_TOPK = f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT SUM(dl) FROM doclen) AS sum_dl
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN ('data', 'hash', 'vector') GROUP BY 1, 2
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT t.doc_id, t.term,
    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      * t.tf * (1.2 + 1)
      / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
      AS term_score
  FROM tf t JOIN df d USING (term) JOIN doclen l USING (doc_id), stats s
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_terms_matched,
    round(
      COALESCE(max(CASE WHEN term = 'data' THEN term_score END), 0.0)
      + COALESCE(max(CASE WHEN term = 'hash' THEN term_score END), 0.0)
      + COALESCE(max(CASE WHEN term = 'vector' THEN term_score END), 0.0), 4
    ) AS score
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_terms_matched, score, rank FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
  FROM per_doc
) WHERE rank <= 10
"""

CORPUS_VOCABULARY = rf"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
exploded AS (SELECT doc_id, unnest(w) AS token FROM toks),
counts AS (
  SELECT token, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df
  FROM exploded GROUP BY 1
)
SELECT token, cf, df, rank FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY cf DESC, token ASC) AS BIGINT) AS rank
  FROM counts
) WHERE rank <= 50
"""

SCRUB_TEXT = r"""
WITH dirty AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0
         THEN text || ' contact bob@example.com via https://ex.com/x?q=1'
         ELSE text END AS text
  FROM documents
),
scrubbed AS (
  SELECT doc_id, text,
    regexp_replace(
      regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      'https?://[^\s]+', '<URL>', 'g') AS clean_text
  FROM dirty
)
SELECT doc_id, clean_text,
  CAST(length(text) - length(clean_text) AS BIGINT) AS chars_removed
FROM scrubbed
"""

LENGTH_HISTOGRAM = """
SELECT n_chars // 100 AS len_bucket,
  COUNT(*) AS n_docs,
  min(n_chars) AS min_chars,
  max(n_chars) AS max_chars
FROM documents GROUP BY 1
"""

JSON_PROPS_ROLLUP = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
  COUNT(*) AS n,
  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY 1
"""

STREAM_DEDUP_KEYS = """
SELECT DISTINCT user_id, event_type FROM events
"""

CHUNK_DOCUMENTS = rf"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
sized AS (
  SELECT doc_id, w,
    greatest(CAST(ceil(CAST(len(w) - 64 AS DOUBLE) / 48) AS INT) + 1, 1) AS n_starts
  FROM toks
),
chunks AS (
  SELECT doc_id, w, unnest(list_transform(range(0, n_starts), i -> i * 48)) AS start
  FROM sized
)
SELECT doc_id,
  CAST(start AS BIGINT) AS chunk_start,
  array_to_string(w[start + 1 : start + 64], ' ') AS chunk_text,
  CAST(len(w[start + 1 : start + 64]) AS BIGINT) AS chunk_tokens
FROM chunks
"""

_SCRUB_EXPR = (
    r"regexp_replace(regexp_replace(text,"
    r" '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),"
    r" 'https?://[^\s]+', '<URL>', 'g')"
)

LLM_PREP_PIPELINE = f"""
WITH quality AS (
  SELECT doc_id, quality FROM ({TEXT_QUALITY})
),
scrubbed AS (
  SELECT doc_id, {_SCRUB_EXPR} AS clean_text FROM documents
),
survivors AS (
  SELECT md5(s.clean_text) AS content_hash, min(s.doc_id) AS doc_id
  FROM scrubbed s JOIN quality q ON s.doc_id = q.doc_id
  WHERE q.quality >= 0.75
  GROUP BY 1
),
split AS (
  SELECT doc_id, split FROM ({TRAIN_TEST_SPLIT})
)
SELECT sv.doc_id, sv.content_hash, sp.split, q.quality
FROM survivors sv
JOIN split sp ON sv.doc_id = sp.doc_id
JOIN quality q ON sv.doc_id = q.doc_id
"""

STATS_SUMMARY = """
SELECT l_returnflag,
  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
  round(stddev_samp(l_quantity), 6) AS qty_stddev,
  round(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar
FROM lineitem GROUP BY 1
"""

MOVING_AVERAGE = with_staging(
    """
, daily AS (
  SELECT start_station_id AS station,
         CAST(CAST(starttime AS DATE) AS VARCHAR) AS day,
         COUNT(*) AS rides
  FROM trips GROUP BY 1, 2
)
SELECT station, day, rides,
  CAST(sum(rides) OVER w AS BIGINT) AS window_rides,
  CAST(count(*) OVER w AS BIGINT) AS window_n,
  max(rides) OVER w AS peak_rides,
  lead(rides) OVER (PARTITION BY station ORDER BY day) AS next_day_rides,
  CAST((10000 * sum(rides) OVER w) // (count(*) OVER w) AS BIGINT) AS avg_rides_e4
FROM daily
WINDOW w AS (PARTITION BY station ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""
)

# session_window(gap): sessions merge while consecutive gaps <= gap —
# identical boundaries to the lag/cumsum formulation
SESSION_WINDOW = """
WITH base AS (SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us FROM events),
flagged AS (
  SELECT user_id, ts_us,
    CASE WHEN lag(ts_us) OVER w IS NULL
           OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS new_session
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sessions AS (
  SELECT user_id, ts_us,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us) AS session_id
  FROM flagged
)
SELECT user_id, min(ts_us) AS session_start_us, COUNT(*) AS n_events
FROM sessions GROUP BY user_id, session_id
"""

UNPIVOT_EVENT_COUNTS = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, t.event_type,
       COUNT(CASE WHEN events.event_type = t.event_type THEN 1 END) AS cnt
FROM events CROSS JOIN (
  SELECT unnest(['click','view','purchase','signup','error']) AS event_type
) t
GROUP BY 1, 2
"""

SCD2_STATIONS = """
WITH current AS (
  SELECT CAST(c_custkey AS VARCHAR) AS station_id,
         CAST(c_nationkey AS BIGINT) AS capacity,
         CAST(0 AS BIGINT) AS valid_from_us,
         CAST(253402300799000000 AS BIGINT) AS valid_to_us
  FROM customer
),
updates AS (
  SELECT CAST(c_custkey AS VARCHAR) AS station_id,
         CAST(c_nationkey + 1 AS BIGINT) AS capacity
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT CAST(c_custkey AS VARCHAR), CAST(c_nationkey AS BIGINT)
  FROM customer WHERE c_custkey % 3 = 1
  UNION ALL
  SELECT CAST(c_custkey + 1000000 AS VARCHAR), CAST(99 AS BIGINT)
  FROM customer WHERE c_custkey % 10 = 0
),
kept AS (
  SELECT c.station_id, c.capacity, c.valid_from_us,
    CASE WHEN c.valid_to_us = 253402300799000000
           AND u.station_id IS NOT NULL
           AND c.capacity IS DISTINCT FROM u.capacity
         THEN 1000 ELSE c.valid_to_us END AS valid_to_us
  FROM current c LEFT JOIN updates u ON c.station_id = u.station_id
),
new_versions AS (
  SELECT u.station_id, u.capacity,
         CAST(1000 AS BIGINT) AS valid_from_us,
         CAST(253402300799000000 AS BIGINT) AS valid_to_us
  FROM updates u
  LEFT JOIN (SELECT * FROM current WHERE valid_to_us = 253402300799000000) c
    ON u.station_id = c.station_id
  WHERE c.station_id IS NULL OR c.capacity IS DISTINCT FROM u.capacity
)
SELECT * FROM kept UNION ALL SELECT * FROM new_versions
"""

# ---------------------------------------------------------------------------
# Round-2 continuation: profiling, robust anomalies, CDC merge, Z-order,
# blocked edit-distance dedup.
# ---------------------------------------------------------------------------

# operators/profile.py:orders_profile — single-agg wide row, unpivoted.
# Doubles are emitted as integer cents (engine-independent VARCHAR repr).
_PROFILE_COLS = [
    ("o_orderkey", "CAST({m}(o_orderkey) AS VARCHAR)"),
    ("o_custkey", "CAST({m}(o_custkey) AS VARCHAR)"),
    ("o_orderstatus", "CAST({m}(o_orderstatus) AS VARCHAR)"),
    ("o_totalprice", "CAST(CAST(round({m}(o_totalprice) * 100) AS BIGINT) AS VARCHAR)"),
    ("o_orderdate", "CAST({m}(o_orderdate) AS VARCHAR)"),
    ("o_orderpriority", "CAST({m}(o_orderpriority) AS VARCHAR)"),
]

_PROFILE_AGGS = ",\n    ".join(
    f"COUNT({c}) AS nn_{c}, COUNT(DISTINCT {c}) AS nd_{c},\n    "
    + tmpl.format(m="MIN") + f" AS mn_{c},\n    "
    + tmpl.format(m="MAX") + f" AS mx_{c}"
    for c, tmpl in _PROFILE_COLS
)

_PROFILE_SELECTS = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col_name, n_rows, n_rows - nn_{c} AS n_null, "
    f"nd_{c} AS n_distinct, mn_{c} AS min_val, mx_{c} AS max_val FROM w"
    for c, _ in _PROFILE_COLS
)

PROFILE_ORDERS = f"""
WITH w AS (
  SELECT COUNT(*) AS n_rows,
    {_PROFILE_AGGS}
  FROM orders
)
{_PROFILE_SELECTS}
"""

# operators/analytics.py:mad_anomalies — integer-exact MAD outliers.
# median of integers is a multiple of 0.5 in both engines (interpolating
# quantile), so 2*median rounds to an exact BIGINT.
MAD_ANOMALIES = with_staging(
    """
, daily AS (
  SELECT start_station_id AS station,
         CAST(CAST(starttime AS DATE) AS VARCHAR) AS day,
         COUNT(*) AS rides
  FROM trips GROUP BY 1, 2
),
med AS (
  SELECT station, CAST(round(2 * median(rides)) AS BIGINT) AS med2
  FROM daily GROUP BY 1
),
dev AS (
  SELECT daily.station, day, rides, abs(2 * rides - med2) AS dev2
  FROM daily JOIN med ON daily.station = med.station
),
mad AS (
  SELECT station, CAST(round(2 * median(dev2)) AS BIGINT) AS mad4
  FROM dev GROUP BY 1
)
SELECT dev.station, day, rides, dev2, mad4
FROM dev JOIN mad ON dev.station = mad.station
WHERE 2 * dev2 > 3 * mad4
"""
)

# operators/scd.py:apply_changes — CDC batch derived deterministically
# from orders (key=o_custkey, seq=o_orderkey), applied onto customer.
CDC_MERGE = """
WITH changes AS (
  SELECT o_custkey AS c_custkey, o_orderkey AS seq,
         CASE WHEN o_orderkey % 10 < 2 THEN 'D'
              WHEN o_orderkey % 10 < 6 THEN 'U'
              ELSE 'I' END AS op,
         'cdc_' || CAST(o_orderkey AS VARCHAR) AS c_name,
         CAST(round(o_totalprice * 100) AS BIGINT) AS acctbal_cents
  FROM orders
),
latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
    FROM changes
  ) WHERE rn = 1
),
cur AS (
  SELECT c_custkey, c_name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer
)
SELECT COALESCE(g.c_custkey, c.c_custkey) AS c_custkey,
       CASE WHEN g.c_custkey IS NOT NULL THEN g.c_name ELSE c.c_name END AS c_name,
       CASE WHEN g.c_custkey IS NOT NULL THEN g.acctbal_cents
            ELSE c.acctbal_cents END AS acctbal_cents
FROM cur c FULL JOIN latest g ON c.c_custkey = g.c_custkey
WHERE NOT (g.c_custkey IS NOT NULL AND g.op = 'D')
"""

# sources/txn.py:TxnTable.merge — two sequential transactional CDC
# batches (o_orderkey % 3 = 0 then = 1) over customer; each merge is the
# same latest-wins/upsert/delete algebra as CDC_MERGE, chained.
LAKE_MERGE = """
WITH cur0 AS (
  SELECT c_custkey, c_name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer
),
ch1 AS (
  SELECT o_custkey AS c_custkey, o_orderkey AS seq,
         CASE WHEN o_orderkey % 10 < 2 THEN 'D'
              WHEN o_orderkey % 10 < 6 THEN 'U'
              ELSE 'I' END AS op,
         'm1_' || CAST(o_orderkey AS VARCHAR) AS c_name,
         CAST(round(o_totalprice * 100) AS BIGINT) AS acctbal_cents
  FROM orders WHERE o_orderkey % 3 = 0
),
l1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
    FROM ch1
  ) WHERE rn = 1
),
cur1 AS (
  SELECT COALESCE(g.c_custkey, c.c_custkey) AS c_custkey,
         CASE WHEN g.c_custkey IS NOT NULL THEN g.c_name
              ELSE c.c_name END AS c_name,
         CASE WHEN g.c_custkey IS NOT NULL THEN g.acctbal_cents
              ELSE c.acctbal_cents END AS acctbal_cents
  FROM cur0 c FULL JOIN l1 g ON c.c_custkey = g.c_custkey
  WHERE NOT (g.c_custkey IS NOT NULL AND g.op = 'D')
),
ch2 AS (
  SELECT o_custkey AS c_custkey, o_orderkey AS seq,
         CASE WHEN o_orderkey % 10 < 2 THEN 'D'
              WHEN o_orderkey % 10 < 6 THEN 'U'
              ELSE 'I' END AS op,
         'm2_' || CAST(o_orderkey AS VARCHAR) AS c_name,
         CAST(round(o_totalprice * 100) AS BIGINT) AS acctbal_cents
  FROM orders WHERE o_orderkey % 3 = 1
),
l2 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
    FROM ch2
  ) WHERE rn = 1
)
SELECT COALESCE(g.c_custkey, c.c_custkey) AS c_custkey,
       CASE WHEN g.c_custkey IS NOT NULL THEN g.c_name
            ELSE c.c_name END AS c_name,
       CASE WHEN g.c_custkey IS NOT NULL THEN g.acctbal_cents
            ELSE c.acctbal_cents END AS acctbal_cents
FROM cur1 c FULL JOIN l2 g ON c.c_custkey = g.c_custkey
WHERE NOT (g.c_custkey IS NOT NULL AND g.op = 'D')
"""

# operators/graph.py:pagerank — integer-exact PageRank (e6 fixed point,
# 3 iterations, damping 85%) over the customer<->supplier co-purchase
# graph; the oracle unrolls the identical arithmetic (floor division on
# non-negative operands only). Dangling mass dropped by construction
# (every node has out-edges — the graph is symmetric).
GRAPH_PAGERANK = """
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
),
nodes AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
ce AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON e.src = d.src),
r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank_e6 FROM nodes),
c1 AS (SELECT ce.dst, SUM(r.rank_e6 // ce.outdeg) AS contrib
       FROM ce JOIN r0 r ON r.id = ce.src GROUP BY ce.dst),
r1 AS (SELECT n.id,
              CAST(150000 + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT)
                  AS rank_e6
       FROM nodes n LEFT JOIN c1 c ON n.id = c.dst),
c2 AS (SELECT ce.dst, SUM(r.rank_e6 // ce.outdeg) AS contrib
       FROM ce JOIN r1 r ON r.id = ce.src GROUP BY ce.dst),
r2 AS (SELECT n.id,
              CAST(150000 + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT)
                  AS rank_e6
       FROM nodes n LEFT JOIN c2 c ON n.id = c.dst),
c3 AS (SELECT ce.dst, SUM(r.rank_e6 // ce.outdeg) AS contrib
       FROM ce JOIN r2 r ON r.id = ce.src GROUP BY ce.dst),
r3 AS (SELECT n.id,
              CAST(150000 + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT)
                  AS rank_e6
       FROM nodes n LEFT JOIN c3 c ON n.id = c.dst)
SELECT id, rank_e6 FROM r3
"""

# operators/layout.py:zorder_sample — Morton code over the low 8 bits of
# (l_orderkey, l_partkey); bit arithmetic is engine-identical.
_ZBITS = 8
_ZVAL = " + ".join(
    f"(((l_orderkey & {(1 << _ZBITS) - 1}) >> {i}) & 1) * {1 << (2 * i)}"
    f" + (((l_partkey & {(1 << _ZBITS) - 1}) >> {i}) & 1) * {1 << (2 * i + 1)}"
    for i in range(_ZBITS)
)

ZORDER_SAMPLE = f"""
SELECT l_orderkey, l_linenumber, l_partkey, CAST({_ZVAL} AS BIGINT) AS zval
FROM lineitem
ORDER BY zval, l_orderkey, l_linenumber
LIMIT 100
"""

# operators/dedup.py:blocked_levenshtein_pairs — prefix blocking + exact
# edit distance over the head (unit costs in both engines).
DEDUP_LEVENSHTEIN = """
WITH b AS (
  SELECT doc_id,
         substr(lower(text), 1, 16) AS blk,
         substr(lower(text), 1, 80) AS head
  FROM documents
)
SELECT a.doc_id AS d1, c.doc_id AS d2,
       CAST(levenshtein(a.head, c.head) AS BIGINT) AS lev
FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
WHERE levenshtein(a.head, c.head) <= 10
"""

# ---------------------------------------------------------------------------
# Round 2: time-series regularization, behavior analytics, spatial grid
# join, mutual-kNN graph, TPC-H Q3 shape.
# ---------------------------------------------------------------------------

# operators/timeseries.py:gap_fill_daily — per-key date spine via
# generate_series (the lateral mirrors Spark's sequence+explode).
_GAPFILL_CTES = """
daily AS (
  SELECT start_station_id AS station, CAST(starttime AS DATE) AS day,
         COUNT(*) AS rides
  FROM trips GROUP BY 1, 2
),
spans AS (SELECT station, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1),
spine AS (
  SELECT station, CAST(unnest(generate_series(
    CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE)
    AS day
  FROM spans
),
filled AS (
  SELECT s.station, s.day,
         COALESCE(d.rides, 0) AS rides,
         CASE WHEN d.rides IS NOT NULL THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS observed
  FROM spine s LEFT JOIN daily d ON s.station = d.station AND s.day = d.day
)
"""

GAP_FILL_DAILY = with_staging(
    f""", {_GAPFILL_CTES}
SELECT station, CAST(day AS VARCHAR) AS day, rides, observed FROM filled
"""
)

# operators/timeseries.py:interpolate_daily — linear blend in integer e4
# units; numerators are non-negative so Spark `div` == DuckDB `//`.
INTERPOLATE_DAILY = with_staging(
    f""", {_GAPFILL_CTES},
base AS (
  SELECT station, day,
         CASE WHEN day(day) % 5 <> 0 THEN rides END AS obs
  FROM filled
),
stepped AS (
  SELECT station, day, obs,
    last_value(obs IGNORE NULLS) OVER wb AS prev_v,
    last_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
      OVER wb AS prev_d,
    first_value(obs IGNORE NULLS) OVER wf AS next_v,
    first_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
      OVER wf AS next_d
  FROM base
  WINDOW
    wb AS (PARTITION BY station ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY station ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT station, CAST(day AS VARCHAR) AS day,
  COALESCE(obs, -1) AS observed_rides,
  CAST(CASE
    WHEN obs IS NOT NULL THEN 10000 * obs
    WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
      (10000 * (prev_v * (datediff('day', prev_d, next_d)
                          - datediff('day', prev_d, day))
                + next_v * datediff('day', prev_d, day)))
      // datediff('day', prev_d, next_d)
    WHEN prev_v IS NOT NULL THEN 10000 * prev_v
    ELSE 10000 * next_v END AS BIGINT) AS value_e4
FROM stepped
"""
)

# operators/behavior.py:cohort_retention
COHORT_RETENTION = """
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
fs AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1),
cs AS (SELECT cohort_day, COUNT(*) AS cohort_users FROM fs GROUP BY 1),
tri AS (
  SELECT cohort_day,
         CAST(datediff('day', cohort_day, day) AS BIGINT) AS offset_days,
         COUNT(DISTINCT d.user_id) AS active_users
  FROM days d JOIN fs ON d.user_id = fs.user_id
  GROUP BY 1, 2
)
SELECT CAST(t.cohort_day AS VARCHAR) AS cohort_day, offset_days,
       active_users, cohort_users,
       CAST((10000 * active_users) // cohort_users AS BIGINT) AS retention_e4
FROM tri t JOIN cs ON t.cohort_day = cs.cohort_day
"""

# operators/behavior.py:funnel_counts — strictly-ordered funnel.
FUNNEL_COUNTS = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE event_type = 'click' AND ts > s1.t GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE event_type = 'purchase' AND ts > s2.t GROUP BY 1
),
counts AS (
  SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
         (SELECT COUNT(*) FROM s1) AS users
  UNION ALL
  SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
  UNION ALL
  SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
)
SELECT step_idx, step, users,
       CAST((10000 * users) // (SELECT COUNT(*) FROM s1) AS BIGINT)
         AS conv_from_first_e4
FROM counts
"""

# operators/behavior.py:markov_transitions — lead() over a (ts, event_id)
# total order, then |types|^2 counts.
MARKOV_TRANSITIONS = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, COUNT(*) AS transitions
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, transitions,
       CAST((10000 * transitions)
            // (sum(transitions) OVER (PARTITION BY from_type)) AS BIGINT)
         AS prob_e4
FROM c
"""

# operators/geo.py:station_neighbor_pairs — the oracle is the BRUTE-FORCE
# all-pairs distance join: the grid-blocked plan must reproduce it
# exactly (completeness proof in the operator docstring).
STATION_NEIGHBORS = """
WITH pts AS (
  SELECT c_custkey AS pid,
         CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS x,
         (c_custkey * 2654435761) % 1000000 AS y
  FROM customer
)
SELECT a.pid AS pid1, b.pid AS pid2,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
FROM pts a JOIN pts b ON a.pid < b.pid
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= 40000 * 40000
"""

# operators/similarity.py:mutual_knn_pairs
KNN_MUTUAL_PAIRS = f"""
WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, {_cos('a.v', 'b.v')} AS cos_sim
  FROM corpus a CROSS JOIN corpus b WHERE a.vec_id <> b.vec_id
),
edges AS (
  SELECT * FROM (
    SELECT *, CAST(row_number() OVER (
      PARTITION BY src ORDER BY cos_sim DESC, dst ASC) AS BIGINT) AS rank
    FROM scored
  ) WHERE rank <= 5
)
SELECT f.src AS v1, f.dst AS v2, f.cos_sim,
       f.rank AS rank_fwd, r.rank AS rank_rev
FROM edges f JOIN edges r ON f.src = r.dst AND f.dst = r.src
WHERE f.src < f.dst
"""

# operators/sqlsurface.py:tpch_shipping_priority — TPC-H Q3 shape on the
# slimmed schema (o_orderpriority stands in for o_shippriority).
TPCH_SHIPPING_PRIORITY = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""

# operators/analytics.py:feature_deciles — ntile under a total order is
# engine-independent; bounds in exact cents.
FEATURE_DECILES = """
SELECT decile, COUNT(*) AS n_orders,
       min(cents) AS min_cents, max(cents) AS max_cents
FROM (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
           AS decile
  FROM orders
) GROUP BY 1
"""

# operators/scd.py:snapshot_diff — deterministic old/new snapshots derived
# from orders; unchanged rows dropped.
SNAPSHOT_DIFF = """
WITH old_s AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 20 <> 0
),
new_s AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END AS cents
  FROM orders WHERE o_orderkey % 30 <> 0
),
classified AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN NOT (o.cents IS NOT DISTINCT FROM n.cents) THEN 'changed'
         END AS status,
         o.cents AS old_cents, n.cents AS new_cents
  FROM old_s o FULL JOIN new_s n ON o.o_orderkey = n.o_orderkey
)
SELECT * FROM classified WHERE status IS NOT NULL
"""

# operators/text.py:token_colocation_lift — integer-exact colocation
# strength over adjacent-token bigrams.
TOKEN_COLOCATION = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS w
  FROM documents
),
bg AS (
  SELECT z[1] AS a, z[2] AS b
  FROM (SELECT unnest(list_zip(w[1:-2], w[2:-1])) AS z FROM toks)
),
pc AS (SELECT a, b, COUNT(*) AS n_ab FROM bg GROUP BY 1, 2
       HAVING COUNT(*) >= 3),
fc AS (SELECT a, COUNT(*) AS n_a FROM bg GROUP BY 1),
sc AS (SELECT b, COUNT(*) AS n_b FROM bg GROUP BY 1),
t AS (SELECT COUNT(*) AS n_total FROM bg)
SELECT pc.a, pc.b, n_ab,
       CAST((n_ab * n_total * 10000) // (n_a * n_b) AS BIGINT) AS lift_e4
FROM pc JOIN fc ON pc.a = fc.a JOIN sc ON pc.b = sc.b CROSS JOIN t
"""

# operators/dedup.py:dedup_keep_best — keep-highest-score policy over the
# same MinHash components as DEDUP_CLUSTERS.
DEDUP_KEEP_BEST = f"""
WITH RECURSIVE pairs AS (
  SELECT d1, d2 FROM ({DEDUP_MINHASH})
),
edges AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION ALL
  SELECT d2 AS src, d1 AS dst FROM pairs
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.node
),
cc AS (SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY 1),
scored AS (
  SELECT cc.doc_id, cluster_id, n_chars AS score
  FROM cc JOIN documents ON cc.doc_id = documents.doc_id
)
SELECT doc_id, cluster_id, score,
       (row_number() OVER (PARTITION BY cluster_id
                           ORDER BY score DESC, doc_id ASC) = 1) AS is_keeper
FROM scored
"""

# streaming/pipeline.py:session_counts — same output as the batch
# session_window query, so it reuses the gaps-and-islands mirror.
STREAM_SESSION_COUNTS = SESSION_WINDOW

# operators/skew.py:key_skew_profile — heavy hitters with exact share.
KEY_SKEW_PROFILE = """
WITH c AS (
  SELECT CAST(l_partkey AS VARCHAR) AS key_value, COUNT(*) AS n_rows
  FROM lineitem GROUP BY 1
),
t AS (SELECT COUNT(*) AS n_total FROM lineitem)
SELECT key_value, n_rows,
       CAST((10000 * n_rows) // n_total AS BIGINT) AS share_e4
FROM c CROSS JOIN t
ORDER BY n_rows DESC, key_value ASC
LIMIT 20
"""

# plans/checks.py:referential_orphans — anti-join counts per FK
# relationship (parents deterministically thinned so orphans exist).
REFERENTIAL_ORPHANS = """
WITH o_thin AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 13 <> 0),
c_thin AS (SELECT c_custkey FROM customer WHERE c_custkey % 11 <> 0)
SELECT 'lineitem->orders' AS relationship,
       (SELECT COUNT(*) FROM lineitem) AS n_child,
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM o_thin)) AS n_orphans
UNION ALL
SELECT 'orders->customer',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM c_thin))
UNION ALL
SELECT 'customer->nation',
       (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM customer
        WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
"""

# operators/setops.py:null_safe_gender_rollup — IS NOT DISTINCT FROM join;
# the NULL gender is a real dim member.
NULL_SAFE_GENDER_ROLLUP = with_staging(
    """
, dim AS (
  SELECT DISTINCT gender,
         COALESCE('g_' || gender, 'unknown') AS gender_label
  FROM trips
)
SELECT gender_label, COUNT(*) AS n_trips
FROM trips t JOIN dim d ON t.gender IS NOT DISTINCT FROM d.gender
GROUP BY 1
"""
)

# operators/timeseries.py:moving_average_range_frame — RANGE (value)
# frame over an integer day index; contrast with MOVING_AVERAGE's ROWS
# frame. DuckDB RANGE frames accept integer offsets over the BIGINT key.
MOVING_AVERAGE_RANGE = with_staging(
    """
, daily AS (
  SELECT start_station_id AS station, CAST(starttime AS DATE) AS day,
         COUNT(*) AS rides
  FROM trips GROUP BY 1, 2
),
idx AS (
  SELECT station, day, rides,
         CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS day_idx
  FROM daily
)
SELECT station, CAST(day AS VARCHAR) AS day, rides,
  CAST(sum(rides) OVER w AS BIGINT) AS window_rides,
  COUNT(*) OVER w AS window_days_observed,
  CAST((10000 * sum(rides) OVER w) // (COUNT(*) OVER w) AS BIGINT)
    AS avg_rides_e4
FROM idx
WINDOW w AS (PARTITION BY station ORDER BY day_idx
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""
)

# streaming/pipeline.py:sliding_avg — every event belongs to exactly two
# 1-hour/30-minute-slide windows (epoch-aligned); mirror by exploding
# each event into both window starts.
STREAM_SLIDING_SUM = """
SELECT window_start_us, COUNT(*) AS cnt, round(sum(value), 2) AS sum_value_r2
FROM (
  SELECT (epoch_us(ts) // 1800000000) * 1800000000 - d.off AS window_start_us,
         value
  FROM events CROSS JOIN (SELECT unnest([0, 1800000000]) AS off) d
)
GROUP BY 1
"""

# operators/corpus.py:sample_per_group — salted-md5 order is engine-
# independent, so the k-per-group sample matches exactly.
SAMPLE_PER_GROUP = """
SELECT source, doc_id, rk FROM (
  SELECT source, doc_id,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY md5('pergroup-v1' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS rk
  FROM documents
) WHERE rk <= 20
"""

# operators/sqlsurface.py:tpch_order_priority — Q4 shape (correlated
# EXISTS on the shipped-late line).
TPCH_ORDER_PRIORITY = """
SELECT o_orderpriority, COUNT(*) AS order_cnt
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""

# operators/sqlsurface.py:tpch_local_supplier_volume — Q5 shape.
TPCH_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lines
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

# operators/sqlsurface.py:tpch_volume_shipping — Q7 shape.
TPCH_VOLUME_SHIPPING = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue,
       COUNT(*) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

# operators/sqlsurface.py:tpch_returned_items — Q10 shape.
TPCH_RETURNED_ITEMS = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1996-10-01'
  AND o_orderdate < DATE '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

# operators/sqlsurface.py:tpch_priority_shipping — Q12 shape (priority
# split; the slim schema has no l_shipmode).
TPCH_PRIORITY_SHIPPING = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# operators/sqlsurface.py:tpch_promo_effect — Q14 shape; the share uses
# floor() (identical across engines) instead of round-half.
TPCH_PROMO_EFFECT = """
SELECT round(sum(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0 END), 2) AS promo_revenue,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
       CAST(floor(10000.0 * sum(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0 END)
                  / sum(l_extendedprice * (1 - l_discount)))
            AS BIGINT) AS promo_bps
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-09-01'
  AND l_shipdate < DATE '1996-10-01'
"""

# operators/sqlsurface.py:tpch_large_orders — Q18 shape.
TPCH_LARGE_ORDERS = """
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       o_totalprice,
       CAST(sum(l_quantity) AS BIGINT) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(l_quantity) > 180
)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""

# operators/sqlsurface.py:tpch_discounted_revenue — Q19 shape.
TPCH_DISCOUNTED_REVENUE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""

# operators/sqlsurface.py:tpch_market_share — Q8 shape.
TPCH_MARKET_SHARE = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_5'
                      THEN volume ELSE 0 END), 2) AS nation_volume,
       round(sum(volume), 2) AS total_volume,
       CAST(floor(10000.0 * sum(CASE WHEN supp_nation = 'NATION_5'
                      THEN volume ELSE 0 END) / sum(volume))
            AS BIGINT) AS mkt_share_bps
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE p_type = 'STANDARD'
    AND r_name = 'EUROPE'
    AND o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1998-01-01'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

# operators/sqlsurface.py:tpch_customer_distribution — Q13 shape.
TPCH_CUSTOMER_DISTRIBUTION = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority = '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

# operators/sqlsurface.py:tpch_top_supplier — Q15 shape (integer-cents
# max so the winner is ulp-robust).
TPCH_TOP_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(floor(100 * sum(l_extendedprice * (1 - l_discount)))
              AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01'
    AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_cents
FROM supplier
JOIN (
  SELECT *, max(total_cents) OVER () AS max_cents FROM revenue
) r ON s_suppkey = supplier_no
WHERE total_cents = max_cents
ORDER BY s_suppkey
"""

# operators/sqlsurface.py:tpch_small_quantity_revenue — Q17 shape
# (integer cross-multiply threshold).
TPCH_SMALL_QUANTITY_REVENUE = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(sum(l_quantity) AS BIGINT) AS qty_sum,
         COUNT(*) AS qty_cnt
  FROM lineitem
  GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN per_part ON pk = l_partkey
WHERE p_brand = 'Brand#23'
  AND 5 * CAST(l_quantity AS BIGINT) * qty_cnt < qty_sum
"""

# operators/sqlsurface.py:tpch_inactive_customers — Q22 shape.
TPCH_INACTIVE_CUSTOMERS = """
SELECT CAST(c_custkey % 7 AS BIGINT) AS cty_code,
       COUNT(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT round(avg(c_acctbal), 2) FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= DATE '2000-01-01'
  )
GROUP BY c_custkey % 7
ORDER BY cty_code
"""

# operators/sqlsurface.py:tpch_forecast_revenue — Q6 shape.
TPCH_FORECAST_REVENUE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

# operators/timeseries.py:trend_slope — integer OLS; Spark `div`
# truncates toward zero while DuckDB `//` floors, so negative slopes are
# mirrored with an explicit sign split.
TREND_SLOPE = with_staging(
    """
, daily AS (
  SELECT start_station_id AS station,
         CAST(datediff('day', DATE '1970-01-01', CAST(starttime AS DATE))
              AS BIGINT) AS x,
         COUNT(*) AS y
  FROM trips GROUP BY 1, CAST(starttime AS DATE)
),
agg AS (
  SELECT station, COUNT(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM daily GROUP BY 1
),
terms AS (
  SELECT station, n,
         CAST(n * sxy - sx * sy AS BIGINT) AS numer,
         CAST(n * sxx - sx * sx AS BIGINT) AS denom
  FROM agg WHERE n >= 2
)
SELECT station, n, numer, denom,
       CAST(CASE WHEN numer >= 0 THEN (1000000 * numer) // denom
                 ELSE -((1000000 * (-numer)) // denom) END AS BIGINT)
         AS slope_e6
FROM terms WHERE denom > 0
"""
)


# operators/corpus.py:contamination_check — same hash split, same
# distinct word-5-gram hashing, same integer e4 overlap.
CONTAMINATION_CHECK = f"""
WITH tagged AS (
  SELECT doc_id, text,
    CASE WHEN {_HB.format(key="CAST(doc_id AS VARCHAR) || 'split-v1'")} < 10 THEN 'test'
         WHEN {_HB.format(key="CAST(doc_id AS VARCHAR) || 'split-v1'")} < 20 THEN 'val'
         ELSE 'train' END AS split
  FROM documents
),
toks AS (SELECT doc_id, split, {_TOKS} AS w FROM tagged),
grams AS (
  SELECT doc_id, split,
         CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) AS g
  FROM (
    SELECT doc_id, split,
           unnest(list_distinct(CASE WHEN len(w) >= 5
             THEN list_transform(range(1, len(w) - 3),
                                 i -> array_to_string(w[i:i+4], ' '))
             ELSE [] END)) AS s
    FROM toks
  )
),
train AS (SELECT DISTINCT g FROM grams WHERE split = 'train'),
test AS (SELECT doc_id, g FROM grams WHERE split = 'test')
SELECT t.doc_id,
       COUNT(*) AS n_grams,
       CAST(sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       (10000 * CAST(sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT))
         // COUNT(*) AS contam_e4,
       CAST(sum(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10
         >= COUNT(*) AS flagged
FROM test t LEFT JOIN train tr ON t.g = tr.g
GROUP BY t.doc_id
"""

# operators/corpus.py:mixture_epochs — same weight table
# (DEFAULT_MIXTURE_E2), same hash bucket, same sequence explode.
MIXTURE_EPOCHS = f"""
WITH w(source, e2) AS (
  VALUES ('src0', 250), ('src1', 130), ('src2', 0), ('src3', 75)
),
tagged AS (
  SELECT doc_id, d.source,
         COALESCE(e2, 100) AS e2,
         {_HB.format(key="CAST(doc_id AS VARCHAR) || 'mix-v1'")} AS b
  FROM documents d LEFT JOIN w ON d.source = w.source
),
counted AS (
  SELECT doc_id, source,
         e2 // 100 + CASE WHEN b < e2 % 100 THEN 1 ELSE 0 END AS n_copies
  FROM tagged
)
SELECT doc_id, source,
       CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_id
FROM counted
WHERE n_copies >= 1
"""

# operators/text.py:repetition_stats — per-row array arithmetic for
# word/trigram duplication, exploded NON-distinct bigrams for the mode.
TEXT_REPETITION = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
base AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_tokens,
         CAST(CASE WHEN len(w) >= 3 THEN len(w) - 2 ELSE 0 END AS BIGINT) AS n_tri,
         CAST(len(list_distinct(CASE WHEN len(w) >= 3
             THEN list_transform(range(1, len(w) - 1),
                                 i -> array_to_string(w[i:i+2], ' '))
             ELSE [] END)) AS BIGINT) AS n_distinct_tri,
         CASE WHEN len(w) >= 2
              THEN list_transform(range(1, len(w)),
                                  i -> array_to_string(w[i:i+1], ' '))
              ELSE [] END AS bi
  FROM toks
),
per_gram AS (
  SELECT doc_id, n_tokens, n_distinct_tokens, n_tri, n_distinct_tri,
         s AS gram, COUNT(*) AS cnt
  FROM (SELECT doc_id, n_tokens, n_distinct_tokens, n_tri, n_distinct_tri,
               unnest(bi) AS s
        FROM base)
  GROUP BY doc_id, n_tokens, n_distinct_tokens, n_tri, n_distinct_tri, s
),
rolled AS (
  SELECT doc_id, n_tokens, n_distinct_tokens, n_tri, n_distinct_tri,
         CAST(max(cnt) AS BIGINT) AS top_bigram_cnt,
         CAST(sum(cnt) AS BIGINT) AS n_bi
  FROM per_gram
  GROUP BY doc_id, n_tokens, n_distinct_tokens, n_tri, n_distinct_tri
)
SELECT doc_id, n_tokens,
       CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
            ELSE (10000 * (n_tokens - n_distinct_tokens)) // n_tokens END
         AS dup_word_e4,
       CASE WHEN n_tri = 0 THEN CAST(0 AS BIGINT)
            ELSE (10000 * (n_tri - n_distinct_tri)) // n_tri END
         AS dup_trigram_e4,
       (10000 * top_bigram_cnt) // n_bi AS top_bigram_e4
FROM rolled
"""


# operators/behavior.py:cumulative_uniques — first-seen reduction + tiny
# day-grain running sum.
CUMULATIVE_UNIQUES = """
WITH firsts AS (
  SELECT user_id, event_type,
         CAST(min(CAST(ts AS DATE)) AS VARCHAR) AS first_day
  FROM events GROUP BY user_id, event_type
),
daily AS (
  SELECT event_type, first_day, COUNT(*) AS new_users
  FROM firsts GROUP BY event_type, first_day
)
SELECT event_type, first_day AS day, new_users,
       CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY first_day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM daily
"""

# operators/intervals.py:incident_exposure — brute-force overlap join;
# the Spark side must produce identical pairs despite grid bucketing.
INCIDENT_EXPOSURE = """
WITH activity AS (
  SELECT user_id,
         CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(epoch_us(min(ts)) AS BIGINT) AS l_start_us,
         CAST(epoch_us(max(ts)) AS BIGINT) AS l_end_us
  FROM events GROUP BY user_id, CAST(CAST(ts AS DATE) AS VARCHAR)
),
incidents AS (
  SELECT event_id AS r_id,
         CAST(epoch_us(ts) AS BIGINT) - 900000000 AS r_start_us,
         CAST(epoch_us(ts) AS BIGINT) + 900000000 AS r_end_us
  FROM events
  WHERE event_type = 'error' AND value > 200.0
)
SELECT a.user_id, a.day, COUNT(*) AS n_incidents
FROM activity a JOIN incidents i
  ON a.l_start_us <= i.r_end_us AND i.r_start_us <= a.l_end_us
GROUP BY a.user_id, a.day
"""

# streaming/pipeline.py:static_enrich — batch equivalence of the
# stream-static broadcast join rollup.
STREAM_STATIC_ENRICH = """
SELECT n_name, COUNT(*) AS cnt
FROM events JOIN nation ON user_id % 25 = n_nationkey
GROUP BY n_name
"""

# operators/sqlsurface.py:lateral_topk — row_number() form of the
# correlated LATERAL LIMIT (DuckDB also supports LATERAL, but the
# window form pins the same tie-break explicitly).
LATERAL_TOPK = """
SELECT n_name, c_custkey, c_name, c_acctbal
FROM (
  SELECT n_name, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY n_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM nation JOIN customer ON c_nationkey = n_nationkey
)
WHERE rk <= 3
ORDER BY n_name, c_acctbal DESC, c_custkey
"""


# operators/corpus.py:boilerplate_chunks — chunk_documents at (8, 8)
# then chunks recurring in >= 2 distinct docs.
BOILERPLATE_CHUNKS = rf"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
sized AS (
  SELECT doc_id, w,
    greatest(CAST(ceil(CAST(len(w) - 8 AS DOUBLE) / 8) AS INT) + 1, 1) AS n_starts
  FROM toks
),
chunks AS (
  SELECT doc_id,
         array_to_string(w[s + 1 : s + 8], ' ') AS chunk_text
  FROM (
    SELECT doc_id, w,
           unnest(list_transform(range(0, n_starts), i -> i * 8)) AS s
    FROM sized
  )
)
SELECT CAST('0x' || substr(md5(chunk_text), 1, 8) AS BIGINT) AS chunk_hash,
       chunk_text,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       COUNT(*) AS n_occurrences
FROM chunks
GROUP BY chunk_text
HAVING COUNT(DISTINCT doc_id) >= 2
"""

# operators/similarity.py:quantize_int8 — same floor arithmetic, codes
# as a joined string (list cells hash engine-differently).
QUANTIZE_INT8 = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
  FROM embeddings
),
scaled AS (
  SELECT vec_id, vd,
         list_max(list_transform(vd, x -> abs(x))) AS scale
  FROM v
)
SELECT vec_id,
       CAST(floor(scale * 1e6) AS BIGINT) AS scale_e6,
       array_to_string(
         list_transform(vd, x -> CAST(CASE WHEN scale = 0 THEN 0
                                      ELSE CAST(floor(x * 127.0 / scale) AS BIGINT)
                                      END AS VARCHAR)), ',') AS codes_i8,
       CAST(len(vd) AS BIGINT) AS dim
FROM scaled
"""


# operators/asof.py:_asof_nearest — both directional ASOF joins, then
# the per-row closer-side pick (strict < keeps backward on exact ties).
ASOF_NEAREST = r"""
WITH e AS (
  SELECT event_id, user_id, ts, CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events WHERE event_type = 'error'
),
p AS (
  SELECT user_id, ts, CAST(epoch_us(ts) AS BIGINT) AS p_ts_us,
         value AS p_value
  FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT e.event_id, p.p_ts_us AS b_ts, p.p_value AS b_val
  FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
),
f AS (
  SELECT e.event_id, p.p_ts_us AS f_ts, p.p_value AS f_val
  FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.ts
)
SELECT e.event_id, e.user_id, e.ts_us,
  CASE WHEN b_ts IS NULL OR (f_ts IS NOT NULL AND (f_ts - ts_us) < (ts_us - b_ts))
       THEN f_ts ELSE b_ts END AS asof_p_ts_us,
  CASE WHEN b_ts IS NULL OR (f_ts IS NOT NULL AND (f_ts - ts_us) < (ts_us - b_ts))
       THEN f_val ELSE b_val END AS asof_p_value
FROM e
JOIN b USING (event_id)
JOIN f USING (event_id)
"""


# operators/behavior.py:user_gap_median — lower-middle integer median of
# whole-second gaps (mirrors the numpy selection exactly).
USER_GAP_MEDIAN = """
WITH ts AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us FROM events
),
gaps AS (
  SELECT user_id,
         (us - lag(us) OVER (PARTITION BY user_id ORDER BY us)) // 1000000
           AS gap_s
  FROM ts
),
g AS (SELECT user_id, gap_s FROM gaps WHERE gap_s IS NOT NULL),
ranked AS (
  SELECT user_id, gap_s,
         row_number() OVER (PARTITION BY user_id ORDER BY gap_s) AS rk,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM g
)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps, gap_s AS median_gap_s
FROM ranked
WHERE rk = (n - 1) // 2 + 1
"""


# __spark_entry__.q_stream_append_counts — batch mirror of append-mode
# emission: tumbling hourly counts for windows closed by the final
# watermark (max event time - 2h). Single-batch drain => no late drops,
# so emitted counts equal batch counts exactly.
STREAM_APPEND_COUNTS = """
WITH mx AS (
  SELECT CAST(epoch_us(max(ts)) AS BIGINT) AS max_us FROM events
),
w AS (
  SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_start_us,
         event_type, COUNT(*) AS cnt
  FROM events
  GROUP BY 1, 2
)
SELECT window_start_us, event_type, cnt
FROM w, mx
WHERE window_start_us + 3600000000 <= max_us - 7200000000
"""


# operators/sqlsurface.py:not_in_null_semantics — standard 3VL: the
# NULL in the subquery empties NOT IN; NOT EXISTS stays an anti join.
NOT_IN_NULL_SEMANTICS = """
SELECT
  (SELECT COUNT(*) FROM part WHERE p_partkey NOT IN
     (SELECT CASE WHEN l_quantity > 49 THEN NULL ELSE l_partkey END
      FROM lineitem)) AS not_in_cnt,
  (SELECT COUNT(*) FROM part p WHERE NOT EXISTS
     (SELECT 1 FROM lineitem l
      WHERE (CASE WHEN l_quantity > 49 THEN NULL
                  ELSE l.l_partkey END) = p.p_partkey))
    AS not_exists_cnt
"""


# ---------------------------------------------------------------------------
# partsupp-derived TPC-H shapes (Q2/Q11/Q16/Q20/Q21). The SQL is ANSI and
# engine-agnostic (pure integer derivations, no float summation hazards),
# so the oracle IS the same string the Spark side runs — imported, not
# duplicated, to make divergence impossible.
# ---------------------------------------------------------------------------

from .operators.sqlsurface import (  # noqa: E402
    TPCH_IMPORTANT_STOCK_SQL,
    TPCH_MIN_COST_SUPPLIER_SQL,
    TPCH_PROMO_STOCK_SUPPLIERS_SQL,
    TPCH_SUPPLIER_RELATION_SQL,
    TPCH_WAITING_SUPPLIERS_SQL,
)

from .operators.sqlsurface import TPCH_PRODUCT_PROFIT_SQL  # noqa: E402

TPCH_MIN_COST_SUPPLIER = TPCH_MIN_COST_SUPPLIER_SQL
TPCH_PRODUCT_PROFIT = TPCH_PRODUCT_PROFIT_SQL
TPCH_IMPORTANT_STOCK = TPCH_IMPORTANT_STOCK_SQL
TPCH_SUPPLIER_RELATION = TPCH_SUPPLIER_RELATION_SQL
TPCH_PROMO_STOCK_SUPPLIERS = TPCH_PROMO_STOCK_SUPPLIERS_SQL
TPCH_WAITING_SUPPLIERS = TPCH_WAITING_SUPPLIERS_SQL


# operators/multimodal.py:png_pixel_stats over synthetic_png_table — the
# generator writes width = n_chars%31+1, height = doc_id%17+1, RGB rows
# constant at (doc_id+y)%256; the expected pixel sum is therefore
# 3*width * sum_y (doc_id+y)%256, computed here without touching a byte
# of PNG — an independent check of the inflate+unfilter pipeline.
MULTIMODAL_PNG_PIXELS = """
SELECT doc_id AS media_id,
       CAST(n_chars % 31 + 1 AS BIGINT) AS width,
       CAST(doc_id % 17 + 1 AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS n_channels,
       (SELECT CAST(sum(((doc_id + y) % 256) * (n_chars % 31 + 1) * 3) AS BIGINT)
        FROM unnest(generate_series(0, doc_id % 17)) AS t(y)) AS pixel_sum
FROM documents
"""


# streaming/pipeline.py:stream_upsert_scd1 — the final upserted state is
# batch-boundary-independent by construction (latest-seq-wins), so the
# oracle is simply the max-event_id row per user.
STREAM_SCD1_UPSERT = """
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_event_type,
       value AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""

# streaming/pipeline.py:stream_merge_to_txn — global latest-wins into the
# ACID table with tombstone deletes: the visible final state is the
# max-event_id row per user unless that row is a tombstone
# (event_id % 10 < 2). The transactional machinery (txn-id replay skip,
# bucket COW, staleness filter) must be value-invisible.
STREAM_TXN_MERGE = """
SELECT user_id,
       event_id AS last_event_id,
       'ev_' || CAST(event_id AS VARCHAR) AS name,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_id % 10 >= 2
"""


# operators/search.py:hybrid_rrf — reciprocal rank fusion of the BM25
# top-10 and the exact-cosine top-10 for query vector 3; contributions
# are integer e6 (1000000 // (60 + rank)), so the fused order is
# engine-identical. Composes the existing BM25 oracle verbatim.
HYBRID_RRF = f"""
WITH lex_full AS (
{BM25_TOPK}
),
lex AS (SELECT doc_id, rank AS lex_rank FROM lex_full),
sem_scored AS (
  SELECT c.vec_id AS doc_id, {_cos('q.qv', 'c.v')} AS cos_sim
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) c,
       (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 3) q
  WHERE c.vec_id <> 3
),
sem AS (
  SELECT doc_id, sem_rank FROM (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS BIGINT)
               AS sem_rank
    FROM sem_scored
  ) WHERE sem_rank <= 10
),
fused AS (
  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         l.lex_rank,
         s.sem_rank,
         COALESCE(1000000 // (60 + l.lex_rank), 0)
         + COALESCE(1000000 // (60 + s.sem_rank), 0) AS rrf_e6
  FROM lex l FULL JOIN sem s ON l.doc_id = s.doc_id
)
SELECT doc_id, lex_rank, sem_rank, rrf_e6, rank FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY rrf_e6 DESC, doc_id) AS BIGINT)
            AS rank
  FROM fused
) WHERE rank <= 10
"""


# operators/graph.py:triangle_count over copart_edges — the same
# wedge-join arithmetic in SQL; all-integer.
GRAPH_TRIANGLES = """
WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 4 = 0),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
verts AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
tri AS (
  SELECT COUNT(*) AS n
  FROM e ab
  JOIN e bc ON ab.dst = bc.src
  JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM verts) AS n_vertices,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(n AS BIGINT) FROM tri) AS n_triangles
"""


# operators/behavior.py:user_paths — ordered aggregation mirrored with
# string_agg ORDER BY over the row_number-limited prefix; (ts, event_id)
# is a total order so both engines build the identical string.
USER_PATHS = """
WITH ordered AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
),
counts AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY 1)
SELECT c.user_id, c.n_events,
       (SELECT string_agg(o.event_type, '>' ORDER BY o.rn)
        FROM ordered o WHERE o.user_id = c.user_id AND o.rn <= 12) AS path
FROM counts c
"""


# operators/corpus.py:sample_weighted — integer weighted priority keys
# (md5-uniform // weight); both operands non-negative so Spark div and
# DuckDB // agree, and the bottom-k order is total via doc_id.
SAMPLE_WEIGHTED = """
SELECT doc_id, lang, weight, priority FROM (
  SELECT doc_id, lang,
         CAST(n_chars AS BIGINT) AS weight,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'wsample-v1'), 1, 8)
              AS BIGINT)
         // greatest(CAST(n_chars AS BIGINT), 1) AS priority
  FROM documents
)
ORDER BY priority, doc_id
LIMIT 50
"""


# plans/checks.py:observed_write — metrics collected during the write's
# pass must equal a plain aggregate; integer-valued cents sum exactly.
OBSERVED_DQ = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT)
           AS null_keys,
       max(o_orderkey) AS max_key,
       CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS total_cents
FROM orders
"""


# operators/profile.py:bitmap_distinct — identical word/mask arithmetic;
# DuckDB sum(bit_count) widens to HUGEINT -> cast. 32-bit words keep the
# shifted mask positive in both engines' signed-64 lanes.
BITMAP_DISTINCT = """
WITH words AS (
  SELECT event_type AS grp, user_id // 32 AS word,
         bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS mask
  FROM events GROUP BY 1, 2
)
SELECT grp, CAST(sum(bit_count(mask)) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_words
FROM words GROUP BY 1
"""


# operators/analytics.py:pareto_frontier — the oracle keeps the naive
# quadratic NOT-EXISTS dominance semantics; the Spark side must produce
# the identical frontier from its join-free cummax formulation.
PARETO_FRONTIER = """
WITH pts AS (
  SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS part_size,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         min(p_partkey) AS min_partkey
  FROM part GROUP BY 1, 2
)
SELECT p.price_cents, p.part_size, p.n_parts, p.min_partkey
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price_cents <= p.price_cents AND q.part_size >= p.part_size
    AND (q.price_cents < p.price_cents OR q.part_size > p.part_size)
)
"""


# operators/text.py:bpe_pair_stats — same distinct-word rollup then
# scalar unnest(generate_series) pair explode; (pair_count DESC, pair)
# is a total order so the LIMIT boundary is engine-independent.
BPE_PAIRS = """
WITH words AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wc FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE length(w) >= 2 GROUP BY 1
),
expanded AS (
  SELECT word, wc, unnest(generate_series(1, length(word) - 1)) AS i
  FROM words
)
SELECT substr(word, CAST(i AS INT), 2) AS pair,
       CAST(sum(wc) AS BIGINT) AS pair_count
FROM expanded
GROUP BY 1
ORDER BY pair_count DESC, pair
LIMIT 40
"""


# operators/search.py:tfidf_similar_pairs — identical integer weighting
# (tf * (1e6 // df)); all-integer scores, total order at the LIMIT.
TFIDF_SIMILAR = """
WITH toks AS (
  SELECT doc_id, w AS term FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE length(w) >= 2
),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
post AS (
  SELECT t.term, t.doc_id, t.tf * (1000000 // d.df) AS w
  FROM tf t JOIN df d USING (term)
  WHERE d.df >= 2
    AND d.df * 100 <= 5 * (SELECT count(*) FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(sum(a.w * b.w) AS BIGINT) AS score
FROM post a JOIN post b ON a.term = b.term AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY score DESC, doc_a, doc_b
LIMIT 50
"""


# operators/timeseries.py:cusum_changepoints — identical integer CUSUM
# closed form (cumsum minus least(0, running-min of cumsum)) over the
# staged trips' daily series.
CUSUM_CHANGEPOINTS = with_staging(
""",
daily AS (
  SELECT start_station_id AS station, CAST(starttime AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS rides
  FROM trips GROUP BY 1, 2
),
stats AS (
  SELECT station, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(sum(rides) AS BIGINT) AS total
  FROM daily GROUP BY 1
),
dev AS (
  SELECT d.station, d.day, s.n_days, s.total,
         s.n_days * d.rides - s.total AS dev
  FROM daily d JOIN stats s USING (station)
),
cum AS (
  SELECT *, sum(dev) OVER w AS cum
  FROM dev
  WINDOW w AS (PARTITION BY station ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  SELECT *, cum - least(0, min(cum) OVER w) AS s
  FROM cum
  WINDOW w AS (PARTITION BY station ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT station,
       CAST(max(n_days) AS BIGINT) AS n_days,
       CAST(max(s) AS BIGINT) AS max_cusum,
       CAST(COUNT(CASE WHEN s > total THEN 1 END) AS BIGINT) AS n_alarms,
       CAST(min(CASE WHEN s > total THEN day END) AS VARCHAR) AS first_alarm
FROM s GROUP BY 1
"""
)


# operators/multimodal.py:synthetic_wav_table + wav_stats — the oracle
# replays the generator's integer sample stream per doc via the scalar
# unnest(generate_series) form; a wrong chunk walk or sample unpack
# shifts abs_sum/peak_abs.
MULTIMODAL_WAV_STATS = """
SELECT doc_id AS media_id,
       CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
       CAST(n_chars % 50 + 10 AS BIGINT) AS n_samples,
       CAST((n_chars % 50 + 10) * 1000 // (8000 + (doc_id % 3) * 4000) AS BIGINT)
         AS duration_ms,
       (SELECT CAST(max(abs(((doc_id * 31 + i * 17) % 4001) - 2000)) AS BIGINT)
        FROM unnest(generate_series(0, n_chars % 50 + 9)) AS t(i)) AS peak_abs,
       (SELECT CAST(sum(abs(((doc_id * 31 + i * 17) % 4001) - 2000)) AS BIGINT)
        FROM unnest(generate_series(0, n_chars % 50 + 9)) AS t(i)) AS abs_sum
FROM documents
"""


# operators/geo.py:grid_hotspots — same integer point synthesis and cell
# arithmetic; the 3x3 smoothing is a cells-x-offsets product in both
# engines. All coordinates non-negative -> div == //.
GEO_HOTSPOTS = """
WITH pts AS (
  SELECT c_custkey AS pid,
         CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS x,
         (c_custkey * 2654435761) % 1000000 AS y
  FROM customer
),
cells AS (
  SELECT x // 50000 AS cx, y // 50000 AS cy,
         CAST(COUNT(*) AS BIGINT) AS n_points
  FROM pts GROUP BY 1, 2
),
offsets AS (
  SELECT dx, dy FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)
),
smooth AS (
  SELECT c.cx + o.dx AS cx, c.cy + o.dy AS cy,
         CAST(sum(c.n_points) AS BIGINT) AS density
  FROM cells c, offsets o
  GROUP BY 1, 2
)
SELECT c.cx, c.cy, c.n_points, s.density
FROM cells c JOIN smooth s USING (cx, cy)
ORDER BY s.density DESC, c.cx, c.cy
LIMIT 20
"""


# streaming/pipeline.py:left_outer_interval_join — two output tiers:
# inner matches emit eagerly; null rows emit at left-state eviction,
# which happens when the FINAL GLOBAL watermark passes l_ts + horizon.
# The global watermark is the min over both sides' watermark operators,
# and each sits AFTER its event-type filter — so it derives from
# least(max error ts, max purchase ts), not the raw stream max.
# Eviction is strict (<): a row whose horizon sits exactly at the
# watermark could still match a boundary arrival.
STREAM_LEFT_JOIN = """
WITH mx AS (
  SELECT least(
    (SELECT max(ts) FROM events WHERE event_type = 'error'),
    (SELECT max(ts) FROM events WHERE event_type = 'purchase')
  ) AS m
)
SELECT e.event_id AS l_event_id, epoch_us(e.ts) AS l_ts_us,
       p.event_id AS r_event_id, p.value AS r_value
FROM events e JOIN events p
  ON e.user_id = p.user_id
 AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR
WHERE e.event_type = 'error' AND p.event_type = 'purchase'
UNION ALL
SELECT e.event_id, epoch_us(e.ts),
       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM events e, mx
WHERE e.event_type = 'error'
  AND NOT EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
      AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR)
  AND e.ts + INTERVAL 1 HOUR < m - INTERVAL 2 HOURS
"""


# operators/corpus.py:sliding_chunks — width 5 / stride 3 sliding
# windows; DuckDB list slices are 1-based inclusive, so chunk ci covers
# ws[ci*3+1 : least(ci*3+5, n)]. Both engines split on single spaces
# (empties preserved), so word indexing is identical.
UDTF_SLIDING_CHUNKS = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
idx AS (
  SELECT doc_id, ws, len(ws) AS n,
         unnest(generate_series(0, (len(ws) + 2) // 3 - 1)) AS ci
  FROM words
)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_idx,
       CAST(ci * 3 AS BIGINT) AS start_word,
       array_to_string(ws[ci * 3 + 1 : least(ci * 3 + 5, n)], ' ') AS chunk_text,
       CAST(least(5, n - ci * 3) AS BIGINT) AS n_words
FROM idx
"""


# streaming/stateful.py:user_sessions — gap-based sessions over the
# (ts, event_id) total order; session_idx via running sum of
# new-session flags (0-based to match the stateful walk).
STREAM_USER_SESSIONS = """
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events
),
flagged AS (
  SELECT *,
         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM ordered
),
sess AS (
  SELECT *,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1
           AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(min(us) AS BIGINT) AS start_us,
       CAST(max(us) AS BIGINT) AS end_us
FROM sess GROUP BY 1, 2
"""


# operators/search.py:phrase_search — positions over the same raw split
# array (DuckDB lists are 1-based; adjacency is i, i+1 regardless).
PHRASE_SEARCH = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS ws
  FROM documents
),
pos AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
  FROM toks
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM pos
WHERE ws[i] = 'table' AND ws[i + 1] = 'value'
GROUP BY 1
"""


# operators/profile.py:corr_pairs — identical exact-integer sufficient
# statistics; the only float math is the final per-row
# multiply/sqrt/divide over exact ints (no ordering freedom). Spark and
# DuckDB weekofyear are both ISO weeks.
CORR_PAIRS = """
WITH base AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS y,
         CAST(weekofyear(l_shipdate) AS BIGINT) AS z
  FROM lineitem
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(z) AS BIGINT) AS sz,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * z) AS BIGINT) AS sxz,
         CAST(sum(y * z) AS BIGINT) AS syz,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(z * z) AS BIGINT) AS szz
  FROM base
)
SELECT 'qty_discount' AS pair, n, n * sxy - sx * sy AS cov_num,
       CAST(floor(10000.0 * (n * sxy - sx * sy)
            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                   * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT) AS corr_bp
FROM s
UNION ALL
SELECT 'qty_week', n, n * sxz - sx * sz,
       CAST(floor(10000.0 * (n * sxz - sx * sz)
            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                   * CAST(n * szz - sz * sz AS DOUBLE))) AS BIGINT)
FROM s
UNION ALL
SELECT 'discount_week', n, n * syz - sy * sz,
       CAST(floor(10000.0 * (n * syz - sy * sz)
            / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
                   * CAST(n * szz - sz * sz AS DOUBLE))) AS BIGINT)
FROM s
"""


# operators/behavior.py:trailing_distinct_users — the oracle keeps the
# naive range-join formulation (window end x contributing days); the
# Spark side must produce identical counts from its explode form.
WINDOW_DISTINCT = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
ends AS (SELECT DISTINCT day AS window_end FROM pairs)
SELECT CAST(e.window_end AS VARCHAR) AS window_end,
       CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users
FROM ends e
JOIN pairs p
  ON p.day <= e.window_end AND p.day > e.window_end - INTERVAL 7 DAY
GROUP BY 1
"""


# operators/profile.py:feature_quartiles — identical lower-index rank
# selection; integer cents, so rank-tie order cannot change the value.
FEATURE_IQR = """
WITH base AS (
  SELECT o_orderpriority AS grp,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
ranked AS (
  SELECT grp, cents,
         row_number() OVER (PARTITION BY grp ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS n
  FROM base
)
SELECT grp, CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN rn = (n - 1) * 25 // 100 + 1 THEN cents END) AS p25_cents,
       max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN cents END) AS p50_cents,
       max(CASE WHEN rn = (n - 1) * 75 // 100 + 1 THEN cents END) AS p75_cents
FROM ranked GROUP BY 1
"""


# operators/similarity.py:knn_classify — same brute-force ranking as
# ANN_COSINE_TOPK restricted to the query subset, then majority vote
# with (votes DESC, label ASC) tie-break.
KNN_CLASSIFY = f"""
WITH corpus AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
queries AS (SELECT vec_id AS q_id, label AS true_label, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
  SELECT q_id, vec_id, label, {_cos('qv', 'v')} AS cos_sim
  FROM corpus CROSS JOIN queries WHERE vec_id <> q_id
),
topk AS (
  SELECT q_id, label FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY cos_sim DESC, vec_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 5
),
votes AS (
  SELECT q_id, CAST(label AS BIGINT) AS pred_label,
         CAST(COUNT(*) AS BIGINT) AS votes
  FROM topk GROUP BY 1, 2
),
pred AS (
  SELECT q_id, pred_label, votes FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY votes DESC, pred_label ASC) AS rk
    FROM votes
  ) WHERE rk = 1
)
SELECT p.q_id, p.pred_label, CAST(q.true_label AS BIGINT) AS true_label,
       p.votes, p.pred_label = q.true_label AS correct
FROM pred p JOIN queries q USING (q_id)
"""


# operators/timeseries.py:ewma_daily — windowed list() collects the
# same ordered frame; identical 2^i weighting via list_zip (unnamed
# struct fields index as z[1]/z[2]); all operands non-negative so
# div == //.
EWMA_DAILY = with_staging(
""",
daily AS (
  SELECT start_station_id AS station, CAST(starttime AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS rides
  FROM trips GROUP BY 1, 2
),
framed AS (
  SELECT station, day, rides,
         list(rides) OVER (PARTITION BY station ORDER BY day
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS arr
  FROM daily
)
SELECT station, CAST(day AS VARCHAR) AS day, rides,
       (1000 * CAST(list_sum(list_transform(
            list_zip(arr, generate_series(0, len(arr) - 1)),
            z -> z[1] * (1::BIGINT << CAST(z[2] AS INT)))) AS BIGINT))
         // ((1::BIGINT << len(arr)) - 1) AS ewma_milli
FROM framed
"""
)


# operators/setops.py:replica_diff_buckets — identical digest (first 15
# md5 hex chars -> 60-bit int), identical xor fold; the replica's
# perturbation mirrors the float formula verbatim so both engines
# corrupt identically.
REPLICA_DIFF = """
WITH dig_a AS (
  SELECT o_orderkey % 256 AS bucket,
         CAST('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey,
              o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT),
              strftime(o_orderdate, '%Y-%m-%d'))), 1, 15) AS BIGINT) AS digest
  FROM orders
),
replica AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 1009 = 0 THEN o_totalprice + 0.01
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate
  FROM orders WHERE o_orderkey % 997 <> 0
),
dig_b AS (
  SELECT o_orderkey % 256 AS bucket,
         CAST('0x' || substr(md5(concat_ws('|', o_orderkey, o_custkey,
              o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT),
              strftime(o_orderdate, '%Y-%m-%d'))), 1, 15) AS BIGINT) AS digest
  FROM replica
),
a AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_a,
             bit_xor(digest) AS xor_a FROM dig_a GROUP BY 1),
b AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_b,
             bit_xor(digest) AS xor_b FROM dig_b GROUP BY 1)
SELECT bucket,
       COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
       COALESCE(xor_a, 0) AS xor_a, COALESCE(xor_b, 0) AS xor_b
FROM a FULL OUTER JOIN b USING (bucket)
WHERE COALESCE(n_a, 0) <> COALESCE(n_b, 0)
   OR COALESCE(xor_a, 0) <> COALESCE(xor_b, 0)
"""


# operators/governance.py:gdpr_erase_audit — same cascade arithmetic;
# rows_changed for the day x type aggregate counts groups whose value
# changed or vanished.
GDPR_ERASE = """
WITH erased AS (SELECT * FROM events WHERE user_id % 97 <> 0),
daily_b AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
daily_a AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM erased GROUP BY 1, 2
)
SELECT 'events' AS dataset,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS rows_before,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM erased) AS rows_after,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM events)
         - (SELECT CAST(COUNT(*) AS BIGINT) FROM erased) AS rows_changed
UNION ALL
SELECT 'user_profiles',
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events),
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM erased),
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
         - (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM erased)
UNION ALL
SELECT 'daily_counts',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM daily_b),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM daily_a),
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM daily_b b LEFT JOIN daily_a a USING (day, event_type)
        WHERE a.n IS NULL OR a.n <> b.n)
"""


# operators/graph.py:kcore_peel — the oracle unrolls the identical
# three synchronous peeling rounds (k=3) over the same subgraph.
KCORE_PEEL = """
WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 4 = 0),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
u0 AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
a1 AS (SELECT src FROM (SELECT src, COUNT(*) AS deg FROM u0 GROUP BY 1)
       WHERE deg >= 3),
u1 AS (SELECT u.src, u.dst FROM u0 u
       JOIN a1 x ON u.src = x.src JOIN a1 y ON u.dst = y.src),
a2 AS (SELECT src FROM (SELECT src, COUNT(*) AS deg FROM u1 GROUP BY 1)
       WHERE deg >= 3),
u2 AS (SELECT u.src, u.dst FROM u1 u
       JOIN a2 x ON u.src = x.src JOIN a2 y ON u.dst = y.src),
a3 AS (SELECT src FROM (SELECT src, COUNT(*) AS deg FROM u2 GROUP BY 1)
       WHERE deg >= 3),
u3 AS (SELECT u.src, u.dst FROM u2 u
       JOIN a3 x ON u.src = x.src JOIN a3 y ON u.dst = y.src)
SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS residual_degree
FROM u3 GROUP BY 1
"""


# operators/analytics.py:mom_revenue_change — identical lag window and
# the non-negative-numerator percent form ((1e4*cur)//prev - 1e4).
MOM_CHANGE = """
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         strftime(o_orderdate, '%Y-%m') AS month,
         CAST(round(sum(round(o_totalprice * 100))) AS BIGINT) AS revenue_cents
  FROM orders GROUP BY 1, 2
),
lagged AS (
  SELECT *, lag(revenue_cents) OVER (PARTITION BY priority ORDER BY month)
         AS prev
  FROM monthly
)
SELECT priority, month, revenue_cents,
       revenue_cents - prev AS delta_cents,
       CASE WHEN prev IS NOT NULL
            THEN (10000 * revenue_cents) // prev - 10000 END AS pct_change_bp
FROM lagged
"""


# operators/similarity.py:label_centroid_cosine — identical e6
# quantization, exact integer centroid sums, identical per-row IEEE
# expression (1e6 * dot first, then the norm division, then floor),
# shifted-numerator integer average.
LABEL_CENTROIDS = """
WITH qv AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
),
elems AS (
  SELECT label, i, q[i] AS v
  FROM (SELECT label, q, unnest(generate_series(1, len(q))) AS i FROM qv)
),
cent AS (
  SELECT label, list(s ORDER BY i) AS c
  FROM (SELECT label, i, CAST(sum(v) AS BIGINT) AS s
        FROM elems GROUP BY 1, 2)
  GROUP BY 1
),
scored AS (
  SELECT q.label,
         CAST(floor(1000000.0 * CAST(list_sum(
                list_transform(list_zip(q.q, c.c), z -> z[1] * z[2])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(q.q, x -> x * x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(c.c, x -> x * x)) AS DOUBLE))))
          AS BIGINT) AS cos_e6
  FROM qv q JOIN cent c USING (label)
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(sum(cos_e6 + 1000000) AS BIGINT) // COUNT(*) - 1000000
         AS avg_cos_e6,
       min(cos_e6) AS min_cos_e6
FROM scored GROUP BY 1
"""


# operators/text.py:tokenizer_drift — identical RE2-compatible patterns
# counted with regexp_extract_all; same basis-point integer division.
TOKENIZER_DRIFT = r"""
WITH counts AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
         CAST(len(regexp_extract_all(text,
              '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
  FROM documents
)
SELECT doc_id, ws_tokens, bpe_tokens,
       (10000 * bpe_tokens) // greatest(ws_tokens, 1) AS ratio_bp
FROM counts
"""


# operators/behavior.py:peak_concurrency — identical sessionize, mark,
# and sweep arithmetic; (us, delta) ordering closes before opens at
# equal instants in both engines.
PEAK_CONCURRENCY = """
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events
),
sess AS (
  SELECT user_id,
         CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sess_id,
         us
  FROM ordered
),
spans AS (
  SELECT user_id, sess_id, min(us) AS start_us, max(us) AS end_us
  FROM sess GROUP BY 1, 2
),
marks AS (
  SELECT start_us AS us, 1 AS delta FROM spans
  UNION ALL
  SELECT end_us + 1, -1 FROM spans
),
sweep AS (
  SELECT us,
         CAST(sum(delta) OVER (ORDER BY us, delta
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS open_now
  FROM marks
)
SELECT strftime(make_timestamp(us), '%Y-%m-%d') AS day,
       CAST(max(open_now) AS BIGINT) AS peak_open_sessions
FROM sweep GROUP BY 1
"""


# operators/behavior.py:near_dup_events — identical lag-gap flagging
# over the (ts, event_id) total order.
NEAR_DUP_EVENTS = """
WITH flagged AS (
  SELECT user_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id, event_type ORDER BY ts, event_id)
                   <= 600000000
              THEN 1 ELSE 0 END AS is_dup
  FROM events
)
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(sum(is_dup) AS BIGINT) AS n_dups
FROM flagged GROUP BY 1, 2
HAVING sum(is_dup) > 0
"""


# operators/analytics.py:topk_stations_with_ties — rank() gap semantics
# over the staged trips' monthly station counts.
TOPK_WITH_TIES = with_staging(
""",
counts AS (
  SELECT strftime(starttime, '%Y-%m') AS month, start_station_id AS station,
         CAST(COUNT(*) AS BIGINT) AS rides
  FROM trips GROUP BY 1, 2
)
SELECT month, station, rides,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, rank() OVER (PARTITION BY month ORDER BY rides DESC) AS rnk
  FROM counts
) WHERE rnk <= 3
"""
)


# operators/analytics.py:ab_lift — identical parity assignment and
# non-negative-numerator lift arithmetic.
AB_LIFT = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1
),
variants AS (
  SELECT user_id % 2 AS variant,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM per_user GROUP BY 1
),
rated AS (
  SELECT *, (10000 * n_converted) // n_users AS conv_bp FROM variants
)
SELECT r.variant, r.n_users, r.n_converted, r.conv_bp,
       (10000 * r.conv_bp) // a.conv_bp - 10000 AS lift_bp
FROM rated r, (SELECT conv_bp FROM rated WHERE variant = 0) a
"""


# operators/timeseries.py:dow_seasonality — Spark dayofweek is
# Sunday=1..7; DuckDB dayofweek is Sunday=0..6 -> +1 (oracles.py header
# rule).
DOW_SEASONALITY = with_staging(
""",
daily AS (
  SELECT start_station_id AS station, CAST(starttime AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS rides
  FROM trips GROUP BY 1, 2
),
per_dow AS (
  SELECT station, CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS dow_days,
         CAST(sum(rides) AS BIGINT) AS dow_total
  FROM daily GROUP BY 1, 2
),
per_station AS (
  SELECT station, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(sum(rides) AS BIGINT) AS total
  FROM daily GROUP BY 1
)
SELECT d.station, d.dow, d.dow_days, d.dow_total,
       (10000 * d.dow_total * s.n_days) // (s.total * d.dow_days) AS index_bp
FROM per_dow d JOIN per_station s USING (station)
"""
)


# operators/analytics.py:ivm_join_view — the oracle is the from-scratch
# aggregate over ALL orders; the Spark side must reproduce it by
# merging delta partials onto the stored view.
IVM_JOIN = """
SELECT r_name AS region_name, n_name AS nation_name,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS order_cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2, 3
"""


# operators/corpus.py:mixture_deficit — identical token counts and
# integer mixture arithmetic; unconfigured sources target 0 bp.
MIXTURE_DEFICIT = r"""
WITH per_source AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS tokens
  FROM documents GROUP BY 1
),
targets AS (
  SELECT * FROM (VALUES ('src0', 4000), ('src1', 2500),
                        ('src2', 2000), ('src3', 1500)) t(source, target_bp)
),
total AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens FROM per_source)
SELECT COALESCE(p.source, t.source) AS source,
       COALESCE(p.n_docs, 0) AS n_docs,
       COALESCE(p.tokens, 0) AS tokens,
       (10000 * COALESCE(p.tokens, 0)) // total_tokens AS actual_bp,
       CAST(COALESCE(t.target_bp, 0) AS BIGINT) AS target_bp,
       (CAST(COALESCE(t.target_bp, 0) AS BIGINT) * total_tokens) // 10000
         - COALESCE(p.tokens, 0) AS deficit_tokens
FROM per_source p FULL OUTER JOIN targets t USING (source), total
"""


# operators/corpus.py:group_split — fold = md5-hash bucket of the
# group key (token_hash32 mirror), so leakage is zero by construction.
GROUP_SPLIT = """
SELECT CAST('0x' || substr(md5(source || '|gkf-v1'), 1, 8) AS BIGINT) % 5
         AS fold,
       source, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1, 2
"""


# operators/text.py:source_divergence — identical head-term grid and
# single-denominator L1 arithmetic; sum(dev) widens to HUGEINT in
# DuckDB so the numerator product is cast back before the division.
SOURCE_DIVERGENCE = """
WITH toks AS (
  SELECT source, w AS term FROM (
    SELECT source, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  ) WHERE length(w) >= 2
),
head AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c_t
  FROM toks GROUP BY 1 ORDER BY c_t DESC, term LIMIT 100
),
obs AS (
  SELECT t.source, t.term, CAST(COUNT(*) AS BIGINT) AS o_st
  FROM toks t JOIN head h ON t.term = h.term GROUP BY 1, 2
),
srcs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM toks GROUP BY 1),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
cells AS (
  SELECT s.source, s.n_s, h.c_t, COALESCE(o.o_st, 0) AS o_st
  FROM srcs s CROSS JOIN head h
  LEFT JOIN obs o ON o.source = s.source AND o.term = h.term
)
SELECT c.source, max(c.n_s) AS n_tokens,
       (10000 * CAST(sum(abs(c.o_st * t.n - c.c_t * c.n_s)) AS BIGINT))
         // (max(c.n_s) * max(t.n)) AS l1_bp
FROM cells c, total t
GROUP BY 1
"""


# operators/similarity.py:embedding_drift — identical parity halves,
# exact centroid sums, identical final IEEE cosine expression.
EMBEDDING_DRIFT = """
WITH qv AS (
  SELECT vec_id % 2 AS half, CAST(label AS BIGINT) AS label,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
),
elems AS (
  SELECT label, half, i, q[i] AS v
  FROM (SELECT label, half, q,
               unnest(generate_series(1, len(q))) AS i FROM qv)
),
cent AS (
  SELECT label, half, list(s ORDER BY i) AS c
  FROM (SELECT label, half, i, CAST(sum(v) AS BIGINT) AS s
        FROM elems GROUP BY 1, 2, 3)
  GROUP BY 1, 2
),
counts AS (
  SELECT label,
         CAST(COUNT(CASE WHEN half = 0 THEN 1 END) AS BIGINT) AS n_a,
         CAST(COUNT(CASE WHEN half = 1 THEN 1 END) AS BIGINT) AS n_b
  FROM qv GROUP BY 1
)
SELECT a.label, n.n_a, n.n_b,
       CAST(floor(1000000.0 * CAST(list_sum(
              list_transform(list_zip(a.c, b.c), z -> z[1] * z[2])) AS DOUBLE)
         / (sqrt(CAST(list_sum(list_transform(a.c, x -> x * x)) AS DOUBLE))
            * sqrt(CAST(list_sum(list_transform(b.c, x -> x * x)) AS DOUBLE))))
        AS BIGINT) AS centroid_cos_e6
FROM (SELECT label, c FROM cent WHERE half = 0) a
JOIN (SELECT label, c FROM cent WHERE half = 1) b USING (label)
JOIN counts n USING (label)
"""


# streaming/pipeline.py:stream_csv_counts — the CSV hop and the drain
# are value-invisible; the oracle is the plain batch aggregate.
STREAM_CSV_COUNTS = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1
"""


# operators/similarity.py:arrow_vector_stats — numpy rint is IEEE
# round-half-even, DuckDB round_even matches; everything after is
# integer.
ARROW_VECTOR_STATS = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dims,
       CAST(list_sum(list_transform(embedding::DOUBLE[],
            x -> abs(CAST(round_even(x * 1000000, 0) AS BIGINT)))) AS BIGINT)
         AS l1_e6,
       CAST(list_max(list_transform(embedding::DOUBLE[],
            x -> abs(CAST(round_even(x * 1000000, 0) AS BIGINT)))) AS BIGINT)
         AS linf_e6
FROM embeddings
"""


# operators/analytics.py:cube_distinct_users — identical CUBE grouping
# sets; DuckDB dayofweek is Sunday=0 -> +1; GROUPING() bit order
# matches Spark's grouping_id for the same column order.
CUBE_DISTINCT = """
WITH base AS (
  SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, event_type, user_id
  FROM events
)
SELECT dow, event_type,
       CAST(GROUPING(dow, event_type) AS BIGINT) AS gid,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM base
GROUP BY CUBE (dow, event_type)
"""


# operators/dedup.py:jaccard_prefix_join — the oracle brute-forces
# candidates from ALL shared tokens, so a lossy prefix goes red
# (completeness proof, not just precision).
JACCARD_PREFIX = """
WITH words AS (
  SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS ws
  FROM documents
),
toks AS (
  SELECT DISTINCT doc_id,
         ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS tok
  FROM (SELECT doc_id, ws,
               unnest(generate_series(1, len(ws) - 2)) AS i FROM words)
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM toks GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.inter,
       sa.sz + sb.sz - p.inter AS uni,
       (10000 * p.inter) // (sa.sz + sb.sz - p.inter) AS jaccard_e4
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE (10000 * p.inter) // (sa.sz + sb.sz - p.inter) >= 6000
"""


# streaming/pipeline.py:join_then_window — chained stateful operators:
# eager inner-join pairs, then the append-mode window cutoff under the
# DOWNSTREAM watermark. Crucial chaining semantics (verified at three
# scales): the join DELAYS the watermark it passes downstream by its
# own buffering horizon — an output row's l_ts can be up to `horizon`
# older than the source watermark — so the window cutoff is
# (min of the two filtered sides' max ts) - delay - horizon.
STREAM_JOIN_WINDOW = """
WITH mx AS (
  SELECT least(
    (SELECT max(ts) FROM events WHERE event_type = 'error'),
    (SELECT max(ts) FROM events WHERE event_type = 'purchase')
  ) AS m
),
pairs AS (
  SELECT e.ts AS l_ts FROM events e JOIN events p
    ON e.user_id = p.user_id
   AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR
  WHERE e.event_type = 'error' AND p.event_type = 'purchase'
),
w AS (
  SELECT epoch_us(date_trunc('hour', l_ts)) AS window_start_us,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY 1
)
SELECT window_start_us, n_pairs
FROM w, mx
WHERE window_start_us + 3600000000
      <= epoch_us(m) - 7200000000 - 3600000000
"""


# sources/pydatasource.py:SynthEventsStreamSource — the deterministic
# feed replayed by generate_series; the streaming drain is
# value-invisible.
PYSTREAM_AGG = """
WITH feed AS (
  SELECT i AS event_id, i % 97 AS user_id, (i * 37) % 10000 AS amount_cents
  FROM (SELECT unnest(generate_series(0, 9999)) AS i)
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(sum(amount_cents) AS BIGINT) AS total_cents
FROM feed GROUP BY 1
"""


# operators/behavior.py:cep_error_recovery — identical lead-bounded
# match windows; ties impossible on the (e_us, error_id) total order.
CEP_RECOVERY = """
WITH errors AS (
  SELECT user_id, event_id AS error_id, epoch_us(ts) AS e_us
  FROM events WHERE event_type = 'error'
),
bounded AS (
  SELECT *, least(
           e_us + 3600000000,
           COALESCE(lead(e_us) OVER (PARTITION BY user_id
                                     ORDER BY e_us, error_id),
                    4611686018427387904)
         ) AS end_us
  FROM errors
),
purchases AS (
  SELECT user_id, epoch_us(ts) AS p_us FROM events
  WHERE event_type = 'purchase'
),
matched AS (
  SELECT b.user_id, b.error_id, CAST(COUNT(*) AS BIGINT) AS n_purchases
  FROM bounded b JOIN purchases p
    ON p.user_id = b.user_id AND p.p_us > b.e_us AND p.p_us <= b.end_us
  GROUP BY 1, 2
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_recovered_errors,
       CAST(sum(n_purchases) AS BIGINT) AS n_recovery_purchases
FROM matched GROUP BY 1
"""


# operators/timeseries.py:theil_sen_slope — identical pairwise floor
# slopes (floor == // on negatives) and lower-median rank selection.
THEIL_SEN = with_staging(
""",
daily AS (
  SELECT start_station_id AS station, CAST(starttime AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS rides
  FROM trips GROUP BY 1, 2
),
keyed AS (
  SELECT d.station, n.n_days,
         CAST(datediff('day', DATE '1970-01-01', d.day) AS BIGINT) AS x,
         d.rides AS y
  FROM daily d
  JOIN (SELECT station, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1) n USING (station)
  WHERE n.n_days <= 64
),
pairs AS (
  SELECT a.station, a.n_days, a.x AS x1, b.x AS x2,
         CAST(floor(1000000.0 * CAST(b.y - a.y AS DOUBLE)
                    / CAST(b.x - a.x AS DOUBLE)) AS BIGINT) AS slope_e6
  FROM keyed a JOIN keyed b
    ON a.station = b.station AND a.x < b.x
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY station
                            ORDER BY slope_e6, x1, x2) AS rk,
         COUNT(*) OVER (PARTITION BY station) AS n_pairs
  FROM pairs
)
SELECT station, n_days, CAST(n_pairs AS BIGINT) AS n_pairs,
       slope_e6 AS median_slope_e6
FROM ranked WHERE rk = (n_pairs + 1) // 2
"""
)


# operators/profile.py:benford_audit — same integer e6 Benford
# constants and share arithmetic.
BENFORD_AUDIT = """
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                     AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_totalprice > 0 GROUP BY 1
),
bench AS (
  SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
                        (5, 79181), (6, 66947), (7, 57992), (8, 51153),
                        (9, 45757)) b(digit, expected_e6)
),
total AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts)
SELECT COALESCE(c.digit, b.digit) AS digit,
       COALESCE(c.n, 0) AS n,
       (1000000 * COALESCE(c.n, 0)) // total AS observed_e6,
       CAST(COALESCE(b.expected_e6, 0) AS BIGINT) AS expected_e6,
       abs((1000000 * COALESCE(c.n, 0)) // total
           - COALESCE(b.expected_e6, 0)) AS abs_dev_e6
FROM counts c FULL OUTER JOIN bench b USING (digit), total
"""


# operators/profile.py:fd_violations — the same three candidate FDs on
# the staged trips.
FD_VIOLATIONS = with_staging(
""",
fd1 AS (
  SELECT bikeid AS x, COUNT(DISTINCT usertype) AS ny FROM trips GROUP BY 1
),
fd2 AS (
  SELECT start_station_id AS x, COUNT(DISTINCT end_station_id) AS ny
  FROM trips GROUP BY 1
),
fd3 AS (
  SELECT bikeid AS x, COUNT(DISTINCT gender) AS ny FROM trips GROUP BY 1
)
SELECT 'bikeid -> usertype' AS fd, CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(COUNT(CASE WHEN ny > 1 THEN 1 END) AS BIGINT) AS violating_keys,
       CAST(max(ny) AS BIGINT) AS max_distinct_y
FROM fd1
UNION ALL
SELECT 'start_station -> end_station', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(CASE WHEN ny > 1 THEN 1 END) AS BIGINT),
       CAST(max(ny) AS BIGINT)
FROM fd2
UNION ALL
SELECT 'bikeid -> gender', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(CASE WHEN ny > 1 THEN 1 END) AS BIGINT),
       CAST(max(ny) AS BIGINT)
FROM fd3
"""
)


# operators/behavior.py:debounce_events — the greedy walk replayed by
# a recursive CTE (decision state threaded row to row).
DEBOUNCE_EVENTS = """
WITH RECURSIVE ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
walk AS (
  SELECT user_id, rn, n, us AS last_us,
         CAST(event_id AS VARCHAR) AS kept, 1 AS n_kept
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.rn, o.n,
         CASE WHEN o.us - w.last_us >= 7200000000 THEN o.us
              ELSE w.last_us END,
         CASE WHEN o.us - w.last_us >= 7200000000
              THEN w.kept || '>' || CAST(o.event_id AS VARCHAR)
              ELSE w.kept END,
         w.n_kept + CASE WHEN o.us - w.last_us >= 7200000000
                         THEN 1 ELSE 0 END
  FROM walk w
  JOIN ordered o ON o.user_id = w.user_id AND o.rn = w.rn + 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       CAST(n_kept AS BIGINT) AS n_kept, kept AS kept_ids
FROM walk WHERE rn = n
"""


# operators/analytics.py:share_of_parent — identical two-level window
# shares; revenue summed as exact cents.
SHARE_OF_PARENT = """
WITH per_nation AS (
  SELECT r_name AS region_name, n_name AS nation_name,
         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS revenue_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT region_name, nation_name, revenue_cents,
       (10000 * revenue_cents)
         // CAST(sum(revenue_cents) OVER (PARTITION BY region_name) AS BIGINT)
         AS share_of_region_bp,
       (10000 * revenue_cents)
         // CAST(sum(revenue_cents) OVER () AS BIGINT) AS share_of_global_bp
FROM per_nation
"""


# streaming/pipeline.py:stream_union_counts — the union drain is
# value-invisible; plain batch counts of the two types.
STREAM_UNION_COUNTS = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1
"""


# operators/similarity.py:blocked_mutual_knn — mutual kNN restricted to
# sign-pattern blocks, exactly mirrored INCLUDING the adaptive width:
# bits = clamp(ceil(log2(n)) - 3, 4, 24) from the same input relation
# (similarity.auto_bucket_bits), so the oracle checks the adaptive
# behavior itself, not one hard-coded width.
_BITS_CTE = (
    "SELECT GREATEST(4, LEAST(24, CAST(CEIL(LOG2(GREATEST(COUNT(*), 2)))"
    " AS INT) - 3)) AS b FROM {src}"
)
_SIGN_DYN = (
    "substring(array_to_string(list_transform({v}[1:24], "
    "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), ''), "
    "1, (SELECT b FROM bits))"
)

KNN_BLOCKED_PAIRS = f"""
WITH bits AS ({_BITS_CTE.format(src='embeddings')}),
corpus AS (
  SELECT vec_id, v, {_SIGN_DYN.format(v='v')} AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
),
scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, {_cos('a.v', 'b.v')} AS cos_sim
  FROM corpus a JOIN corpus b
    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
edges AS (
  SELECT * FROM (
    SELECT *, CAST(row_number() OVER (
      PARTITION BY src ORDER BY cos_sim DESC, dst ASC) AS BIGINT) AS rank
    FROM scored
  ) WHERE rank <= 5
)
SELECT f.src AS v1, f.dst AS v2, f.cos_sim
FROM edges f JOIN edges r ON f.src = r.dst AND f.dst = r.src
WHERE f.src < f.dst
"""


# operators/similarity.py:blocked_knn_recall — both graphs reproduced,
# recall computed as the same integer division.
KNN_BLOCKED_RECALL = f"""
WITH bits AS (
  {_BITS_CTE.format(src='embeddings WHERE vec_id % 5 = 0')}
),
corpus AS (
  SELECT vec_id, v, {_SIGN_DYN.format(v='v')} AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE vec_id % 5 = 0)
),
scored_e AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, {_cos('a.v', 'b.v')} AS cos_sim
  FROM corpus a CROSS JOIN corpus b WHERE a.vec_id <> b.vec_id
),
edges_e AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY cos_sim DESC, dst ASC) AS rank
    FROM scored_e
  ) WHERE rank <= 5
),
exact AS (
  SELECT f.src AS v1, f.dst AS v2
  FROM edges_e f JOIN edges_e r ON f.src = r.dst AND f.dst = r.src
  WHERE f.src < f.dst
),
scored_b AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, {_cos('a.v', 'b.v')} AS cos_sim
  FROM corpus a JOIN corpus b
    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
edges_b AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY cos_sim DESC, dst ASC) AS rank
    FROM scored_b
  ) WHERE rank <= 5
),
blocked AS (
  SELECT f.src AS v1, f.dst AS v2
  FROM edges_b f JOIN edges_b r ON f.src = r.dst AND f.dst = r.src
  WHERE f.src < f.dst
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_exact,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM blocked) AS n_blocked,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM exact e JOIN blocked b USING (v1, v2)) AS n_common,
       (10000 * (SELECT CAST(COUNT(*) AS BIGINT)
                 FROM exact e JOIN blocked b USING (v1, v2)))
         // greatest((SELECT CAST(COUNT(*) AS BIGINT) FROM exact), 1)
         AS recall_bp
"""


# sources/txn.py time travel as a queryable surface: per-version row
# counts of the lake_merge table, derived by replaying both merges.
TXN_HISTORY = """
WITH cur0 AS (
  SELECT c_custkey, c_name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer
),
ch1 AS (
  SELECT o_custkey AS c_custkey, o_orderkey AS seq,
         CASE WHEN o_orderkey % 10 < 2 THEN 'D'
              WHEN o_orderkey % 10 < 6 THEN 'U'
              ELSE 'I' END AS op,
         'm1_' || CAST(o_orderkey AS VARCHAR) AS c_name,
         CAST(round(o_totalprice * 100) AS BIGINT) AS acctbal_cents
  FROM orders WHERE o_orderkey % 3 = 0
),
l1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
    FROM ch1
  ) WHERE rn = 1
),
cur1 AS (
  SELECT COALESCE(g.c_custkey, c.c_custkey) AS c_custkey,
         CASE WHEN g.c_custkey IS NOT NULL THEN g.c_name
              ELSE c.c_name END AS c_name,
         CASE WHEN g.c_custkey IS NOT NULL THEN g.acctbal_cents
              ELSE c.acctbal_cents END AS acctbal_cents
  FROM cur0 c FULL JOIN l1 g ON c.c_custkey = g.c_custkey
  WHERE NOT (g.c_custkey IS NOT NULL AND g.op = 'D')
),
ch2 AS (
  SELECT o_custkey AS c_custkey, o_orderkey AS seq,
         CASE WHEN o_orderkey % 10 < 2 THEN 'D'
              WHEN o_orderkey % 10 < 6 THEN 'U'
              ELSE 'I' END AS op,
         'm2_' || CAST(o_orderkey AS VARCHAR) AS c_name,
         CAST(round(o_totalprice * 100) AS BIGINT) AS acctbal_cents
  FROM orders WHERE o_orderkey % 3 = 1
),
l2 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
    FROM ch2
  ) WHERE rn = 1
)
,
cur2 AS (
SELECT COALESCE(g.c_custkey, c.c_custkey) AS c_custkey,
       CASE WHEN g.c_custkey IS NOT NULL THEN g.c_name
            ELSE c.c_name END AS c_name,
       CASE WHEN g.c_custkey IS NOT NULL THEN g.acctbal_cents
            ELSE c.acctbal_cents END AS acctbal_cents
FROM cur1 c FULL JOIN l2 g ON c.c_custkey = g.c_custkey
WHERE NOT (g.c_custkey IS NOT NULL AND g.op = 'D')
)
SELECT CAST(1 AS BIGINT) AS version,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cur0) AS n_rows
UNION ALL
SELECT 2, (SELECT CAST(COUNT(*) AS BIGINT) FROM cur1)
UNION ALL
SELECT 3, (SELECT CAST(COUNT(*) AS BIGINT) FROM cur2)
"""


# sources/txn.py:read_keys — bucket-pruned point lookup; the rows must
# be exactly the source rows for the requested keys, whatever subset of
# buckets the pruning scanned.
TXN_POINT_LOOKUP = """
SELECT c_custkey, c_name,
       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM customer
WHERE c_custkey IN (1, 7, 19, 23, 42)
"""


# operators/similarity.py:blocked_mutual_knn_multiprobe — each vector
# probes its home sign-bucket plus the 4 one-bit-flip buckets; the
# probe relation is symmetric so the mutual graph needs no second pass.
_PROBES_DYN = (
    "unnest(list_prepend(bucket, "
    "list_transform(range(1, (SELECT b FROM bits) + 1), j -> "
    "substring(bucket, 1, j - 1) || "
    "(CASE WHEN substring(bucket, j, 1) = '1' THEN '0' ELSE '1' END) || "
    "substring(bucket, j + 1, 24))))"
)

KNN_MULTIPROBE_PAIRS = f"""
WITH bits AS ({_BITS_CTE.format(src='embeddings')}),
corpus AS (
  SELECT vec_id, v, {_SIGN_DYN.format(v='v')} AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
),
probes AS (
  SELECT vec_id AS src, v AS sv, {_PROBES_DYN} AS pb
  FROM corpus
),
scored AS (
  SELECT p.src, b.vec_id AS dst, {_cos('p.sv', 'b.v')} AS cos_sim
  FROM probes p JOIN corpus b ON b.bucket = p.pb AND b.vec_id <> p.src
),
edges AS (
  SELECT * FROM (
    SELECT *, CAST(row_number() OVER (
      PARTITION BY src ORDER BY cos_sim DESC, dst ASC) AS BIGINT) AS rank
    FROM scored
  ) WHERE rank <= 5
)
SELECT f.src AS v1, f.dst AS v2, f.cos_sim
FROM edges f JOIN edges r ON f.src = r.dst AND f.dst = r.src
WHERE f.src < f.dst
"""

KNN_MULTIPROBE_RECALL = f"""
WITH bits AS (
  {_BITS_CTE.format(src='embeddings WHERE vec_id % 5 = 0')}
),
corpus AS (
  SELECT vec_id, v, {_SIGN_DYN.format(v='v')} AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE vec_id % 5 = 0)
),
scored_e AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, {_cos('a.v', 'b.v')} AS cos_sim
  FROM corpus a CROSS JOIN corpus b WHERE a.vec_id <> b.vec_id
),
edges_e AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY cos_sim DESC, dst ASC) AS rank
    FROM scored_e
  ) WHERE rank <= 5
),
exact AS (
  SELECT f.src AS v1, f.dst AS v2
  FROM edges_e f JOIN edges_e r ON f.src = r.dst AND f.dst = r.src
  WHERE f.src < f.dst
),
scored_s AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, {_cos('a.v', 'b.v')} AS cos_sim
  FROM corpus a JOIN corpus b
    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
edges_s AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY cos_sim DESC, dst ASC) AS rank
    FROM scored_s
  ) WHERE rank <= 5
),
single AS (
  SELECT f.src AS v1, f.dst AS v2
  FROM edges_s f JOIN edges_s r ON f.src = r.dst AND f.dst = r.src
  WHERE f.src < f.dst
),
probes AS (
  SELECT vec_id AS src, v AS sv, {_PROBES_DYN} AS pb
  FROM corpus
),
scored_m AS (
  SELECT p.src, b.vec_id AS dst, {_cos('p.sv', 'b.v')} AS cos_sim
  FROM probes p JOIN corpus b ON b.bucket = p.pb AND b.vec_id <> p.src
),
edges_m AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY cos_sim DESC, dst ASC) AS rank
    FROM scored_m
  ) WHERE rank <= 5
),
multi AS (
  SELECT f.src AS v1, f.dst AS v2
  FROM edges_m f JOIN edges_m r ON f.src = r.dst AND f.dst = r.src
  WHERE f.src < f.dst
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_exact,
       (10000 * (SELECT CAST(COUNT(*) AS BIGINT)
                 FROM exact e JOIN single s USING (v1, v2)))
         // greatest((SELECT CAST(COUNT(*) AS BIGINT) FROM exact), 1)
         AS single_recall_bp,
       (10000 * (SELECT CAST(COUNT(*) AS BIGINT)
                 FROM exact e JOIN multi m USING (v1, v2)))
         // greatest((SELECT CAST(COUNT(*) AS BIGINT) FROM exact), 1)
         AS multi_recall_bp
"""


# operators/behavior.py:cep_sequence_matches with the SECOND pattern
# shape: click -> purchase within 30 min with no intervening ERROR
# (the forbidden set differs from the start type, so the window bound
# comes from a different event stream than the starts — the
# generalization the reusable builder exists for).
CEP_CLICK_CONVERSION = """
WITH starts AS (
  SELECT user_id, event_id AS start_id, epoch_us(ts) AS s_us
  FROM events WHERE event_type = 'click'
),
forb AS (
  SELECT user_id, event_id, epoch_us(ts) AS f_us
  FROM events WHERE event_type = 'error'
),
bounded AS (
  SELECT s.user_id, s.start_id, s.s_us,
         least(s.s_us + 1800000000,
               COALESCE((SELECT min(f.f_us) FROM forb f
                         WHERE f.user_id = s.user_id
                           AND (f.f_us > s.s_us
                                OR (f.f_us = s.s_us
                                    AND f.event_id > s.start_id))),
                        4611686018427387904)) AS end_us
  FROM starts s
),
ends AS (
  SELECT user_id, epoch_us(ts) AS p_us FROM events
  WHERE event_type = 'purchase'
),
matched AS (
  SELECT b.user_id, b.start_id, CAST(COUNT(*) AS BIGINT) AS n_ends
  FROM bounded b JOIN ends p
    ON p.user_id = b.user_id AND p.p_us > b.s_us AND p.p_us <= b.end_us
  GROUP BY 1, 2
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_matched_starts,
       CAST(sum(n_ends) AS BIGINT) AS n_end_events
FROM matched GROUP BY 1
"""


# operators/behavior.py:last_touch_attribution — latest touch strictly
# before each purchase in the (us, event_id) total order, within 24 h,
# else 'direct'; mirrored with correlated argmax subqueries.
LAST_TOUCH_ATTRIBUTION = """
WITH t AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
  FROM events WHERE event_type IN ('click', 'view', 'signup')
),
p AS (
  SELECT user_id, event_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
),
lt AS (
  SELECT p.user_id, p.us,
         (SELECT t.event_type FROM t
          WHERE t.user_id = p.user_id
            AND (t.us < p.us OR (t.us = p.us AND t.event_id < p.event_id))
          ORDER BY t.us DESC, t.event_id DESC LIMIT 1) AS lt_type,
         (SELECT t.us FROM t
          WHERE t.user_id = p.user_id
            AND (t.us < p.us OR (t.us = p.us AND t.event_id < p.event_id))
          ORDER BY t.us DESC, t.event_id DESC LIMIT 1) AS lt_us
  FROM p
)
SELECT CASE WHEN lt_us IS NOT NULL AND lt_us >= us - 86400000000
            THEN lt_type ELSE 'direct' END AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM lt GROUP BY 1
"""


# operators/scd.py:point_in_time_join probed at us=0 (pre-change) and
# us=1500 (post-change) against the scd2_stations dimension; the
# oracle predicts the version directly from the update rule (%3==0
# keys gained +1 capacity at batch_ts_us=1000).
SCD2_POINT_IN_TIME = """
SELECT CAST((o_orderkey % 2) * 1500 AS BIGINT) AS probe_us,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(sum(c_nationkey
                + CASE WHEN o_orderkey % 2 = 1 AND c_custkey % 3 = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS total_capacity
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


# operators/multimodal.py:synthetic_video_table + sample_video_frames —
# the generator writes pixel(f,y,x) = (doc_id + 3f + 5y + 7x) % 256
# with n_frames = doc_id%5+2, w = n_chars%16+2, h = doc_id%8+2; the
# expected per-sampled-frame sum is replayed without touching a byte
# of the container.
MULTIMODAL_VIDEO_FRAMES = """
SELECT doc_id AS media_id, CAST(f.f AS BIGINT) AS frame_idx,
       CAST(n_chars % 16 + 2 AS BIGINT) AS width,
       CAST(doc_id % 8 + 2 AS BIGINT) AS height,
       (SELECT CAST(sum((doc_id + 3 * f.f + 5 * y.y + 7 * x.x) % 256) AS BIGINT)
        FROM unnest(generate_series(0, doc_id % 8 + 1)) AS y(y),
             unnest(generate_series(0, n_chars % 16 + 1)) AS x(x)) AS pixel_sum
FROM documents, unnest(generate_series(0, doc_id % 5 + 1)) AS f(f)
WHERE f.f % 2 = 0
"""


# operators/graph.py:bfs_levels over the co-purchase graph from node 2
# (customer 1), depth 3 — UNION-distinct recursion keeps each level at
# most |V| rows, min(level) is the BFS distance.
GRAPH_BFS_LEVELS = """
WITH RECURSIVE pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
),
bfs AS (
  SELECT CAST(2 AS BIGINT) AS node, CAST(0 AS BIGINT) AS level
  UNION
  SELECT e.dst, b.level + 1
  FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.level < 3
)
SELECT node, CAST(min(level) AS BIGINT) AS level
FROM bfs GROUP BY 1
"""


# sources/txn.py:delete_where — merge-on-read deletion vectors; the
# visible table is simply the source minus the deleted keys, whatever
# sidecar machinery produced it.
TXN_DELETE_VECTORS = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(sum(round(c_acctbal * 100)) AS BIGINT) AS total_cents,
       CAST(COUNT(CASE WHEN c_custkey % 7 = 0 THEN 1 END) AS BIGINT)
         AS n_shadowed
FROM customer
WHERE c_custkey % 7 <> 0
"""


# operators/graph.py:also_bought — basket co-occurrence top-k per part,
# total order (n_baskets desc, other asc).
ALSO_BOUGHT = """
WITH pairs AS (
  SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS part,
                  b.l_partkey AS other
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
),
counts AS (
  SELECT part, other, CAST(COUNT(*) AS BIGINT) AS n_baskets
  FROM pairs GROUP BY 1, 2
)
SELECT part, other, n_baskets, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY part ORDER BY n_baskets DESC, other ASC) AS BIGINT) AS rank
  FROM counts
) WHERE rank <= 3
"""


# sources/readers.py:read_fixed_width — the staged fixed-width export
# must round-trip byte-exactly back to the source columns.
FIXED_WIDTH_ROUNDTRIP = """
SELECT s_suppkey, s_name, s_nationkey,
       CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents
FROM supplier
"""


# operators/profile.py:countmin_frequencies — the sketch is replayed
# cell-for-cell (same md5 hashes), so estimate, exact count, and the
# one-sided guarantee flag are all hash-checked.
COUNTMIN_FREQUENCIES = """
WITH keyed AS (
  SELECT user_id AS k, i
  FROM events, unnest(generate_series(0, 2)) AS t(i)
),
cells AS (
  SELECT i,
         CAST('0x' || substr(md5(CAST(k AS VARCHAR) || 'cms-'
                                 || CAST(i AS VARCHAR)), 1, 8) AS BIGINT)
           % 64 AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM keyed GROUP BY 1, 2
),
exact AS (
  SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM events GROUP BY 1
),
tracked AS (
  SELECT k, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, k ASC LIMIT 20
),
probes AS (
  SELECT t.k, t.exact_cnt, s.i,
         CAST('0x' || substr(md5(CAST(t.k AS VARCHAR) || 'cms-'
                                 || CAST(s.i AS VARCHAR)), 1, 8) AS BIGINT)
           % 64 AS b
  FROM tracked t, unnest(generate_series(0, 2)) AS s(i)
)
SELECT p.k AS user_id, p.exact_cnt,
       CAST(min(c.cnt) AS BIGINT) AS cms_estimate,
       min(c.cnt) >= p.exact_cnt AS overestimate_ok
FROM probes p JOIN cells c ON p.i = c.i AND p.b = c.b
GROUP BY 1, 2
"""


# operators/timeseries.py:rolling_median_daily — identical RANGE frame
# on the integer day index, identical lower-median selection.
ROLLING_MEDIAN_DAILY = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, day, n_events,
         list_sort(list(n_events) OVER (
           PARTITION BY event_type
           ORDER BY datediff('day', DATE '1970-01-01', day)
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
  FROM daily
)
SELECT event_type, CAST(day AS VARCHAR) AS day, n_events,
       CAST(arr[(len(arr) + 1) // 2] AS BIGINT) AS rolling_median,
       CAST(len(arr) AS BIGINT) AS window_days
FROM win
"""


# streaming/pipeline.py:stream_erase_to_txn — batching-invisible: the
# final table is the source minus every requested key, however the
# erase feed was micro-batched or replayed.
STREAM_ERASE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(sum(round(c_acctbal * 100)) AS BIGINT) AS total_cents
FROM customer
WHERE c_custkey NOT IN (
  SELECT DISTINCT user_id FROM events WHERE user_id % 3 = 0
)
"""


# operators/analytics.py:purchase_streaks — identical island-grouping
# (day index minus row_number), identical (len desc, start asc) pick.
PURCHASE_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE event_type = 'purchase'
),
islands AS (
  SELECT user_id, day,
         datediff('day', DATE '1970-01-01', day)
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len,
         min(day) AS start_day
  FROM islands GROUP BY 1, 2
)
SELECT user_id, len AS longest_streak_days,
       CAST(start_day AS VARCHAR) AS streak_start
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY len DESC, start_day ASC) AS rn
  FROM streaks
) WHERE rn = 1
"""


# sources/txn.py evolve_schema as a queryable surface: after the
# widening merge, untouched rows read the new column as NULL
# (schema-on-read) while merged rows carry it — the fill/null split is
# predicted straight from the update rule.
TXN_SCHEMA_EVOLUTION = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(3 AS BIGINT) AS n_cols_before,
       CAST(4 AS BIGINT) AS n_cols_after,
       CAST(COUNT(CASE WHEN c_custkey % 10 = 0 THEN 1 END) AS BIGINT)
         AS n_segment_filled,
       CAST(COUNT(CASE WHEN c_custkey % 10 <> 0 THEN 1 END) AS BIGINT)
         AS n_segment_null
FROM customer
"""


# operators/profile.py:trimmed_mean_by_type — identical sort, trim
# count floor(n*10/100), and integer-div e2 mean.
TRIMMED_MEAN = """
WITH cents AS (
  SELECT user_id, event_type, CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
grouped AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         list_sort(list(c)) AS v
  FROM cents GROUP BY 1, 2
),
trimmed AS (
  SELECT user_id, event_type, n_events,
         CASE WHEN len(v) > 2 * (len(v) * 10 // 100)
              THEN v[(len(v) * 10 // 100) + 1 : len(v) - (len(v) * 10 // 100)]
              ELSE v END AS kept
  FROM grouped
)
SELECT user_id, event_type, n_events,
       CAST((100 * list_sum(kept)) // len(kept) AS BIGINT) AS trimmed_mean_e2
FROM trimmed
"""


# operators/multimodal.py:image_features over synthetic_png_table —
# rows are constant (doc_id+y)%256 across 3 channels, so every feature
# is closed-form: mean_e2 = 100*total // npix, histogram bin = v//64
# with each row y contributing 3*width pixels.
IMAGE_FEATURES = """
SELECT doc_id AS media_id,
       CAST(n_chars % 31 + 1 AS BIGINT) AS width,
       CAST(doc_id % 17 + 1 AS BIGINT) AS height,
       (SELECT CAST((100 * sum((doc_id + y) % 256) * 3 * (n_chars % 31 + 1))
                    // ((n_chars % 31 + 1) * (doc_id % 17 + 1) * 3) AS BIGINT)
        FROM unnest(generate_series(0, doc_id % 17)) AS t(y)) AS mean_e2,
       (SELECT CAST(coalesce(sum(CASE WHEN (doc_id + y) % 256 // 64 = 0
                                      THEN 3 * (n_chars % 31 + 1) END), 0) AS BIGINT)
        FROM unnest(generate_series(0, doc_id % 17)) AS t(y)) AS hist_q1,
       (SELECT CAST(coalesce(sum(CASE WHEN (doc_id + y) % 256 // 64 = 1
                                      THEN 3 * (n_chars % 31 + 1) END), 0) AS BIGINT)
        FROM unnest(generate_series(0, doc_id % 17)) AS t(y)) AS hist_q2,
       (SELECT CAST(coalesce(sum(CASE WHEN (doc_id + y) % 256 // 64 = 2
                                      THEN 3 * (n_chars % 31 + 1) END), 0) AS BIGINT)
        FROM unnest(generate_series(0, doc_id % 17)) AS t(y)) AS hist_q3,
       (SELECT CAST(coalesce(sum(CASE WHEN (doc_id + y) % 256 // 64 = 3
                                      THEN 3 * (n_chars % 31 + 1) END), 0) AS BIGINT)
        FROM unnest(generate_series(0, doc_id % 17)) AS t(y)) AS hist_q4
FROM documents
"""


# streaming/pipeline.py:trending_topk drained complete-mode then ranked
# — batch mirror: hourly counts, rank with (cnt desc, type asc).
STREAM_TRENDING_TOPK = """
WITH counts AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
         event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT window_start_us, event_type, cnt, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY window_start_us ORDER BY cnt DESC, event_type ASC)
    AS BIGINT) AS rank
  FROM counts
) WHERE rank <= 2
"""


# operators/multimodal.py:audio_frame_features — sample i is
# ((doc_id*31 + i*17) % 4001) - 2000, frames of 16; mean_abs floors,
# zero crossings compare (s >= 0) of consecutive in-frame samples.
AUDIO_FRAME_FEATURES = """
WITH clips AS (
  SELECT doc_id AS media_id, n_chars % 50 + 10 AS n
  FROM documents
),
frames AS (
  SELECT media_id, n, f.f AS frame_idx,
         least(16, n - f.f * 16) AS n_samples
  FROM clips, unnest(generate_series(0, (n - 1) // 16)) AS f(f)
)
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(n_samples AS BIGINT) AS n_samples,
       (SELECT CAST(sum(abs(((media_id * 31 + (frame_idx * 16 + i) * 17)
                             % 4001) - 2000)) // n_samples AS BIGINT)
        FROM unnest(generate_series(0, n_samples - 1)) AS t(i)) AS mean_abs,
       (SELECT CAST(coalesce(sum(CASE WHEN
            ((((media_id * 31 + (frame_idx * 16 + i) * 17) % 4001) - 2000 >= 0)
             <> (((media_id * 31 + (frame_idx * 16 + i + 1) * 17) % 4001) - 2000 >= 0))
            THEN 1 END), 0) AS BIGINT)
        FROM unnest(generate_series(0, n_samples - 2)) AS t(i)) AS zero_crossings
FROM frames
"""


# sources/txn.py:changes() — change data feed between v1 (customer
# snapshot) and v2 (one CDC merge): latest-seq-wins per key; 'D' on an
# existing key -> removed, upserts -> changed (the m1_ name prefix
# guarantees inequality); keys absent from v1 never emit.
TXN_CDF = """
WITH cur AS (
  SELECT c_custkey, c_name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer
),
ch AS (
  SELECT o_custkey AS k, o_orderkey AS seq,
         CASE WHEN o_orderkey % 10 < 2 THEN 'D'
              WHEN o_orderkey % 10 < 6 THEN 'U'
              ELSE 'I' END AS op,
         'm1_' || CAST(o_orderkey AS VARCHAR) AS name,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 3 = 0
),
l AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
    FROM ch
  ) WHERE rn = 1
)
SELECT c.c_custkey,
       CASE WHEN l.op = 'D' THEN 'removed' ELSE 'changed' END AS status,
       c.c_name AS old_c_name,
       CASE WHEN l.op = 'D' THEN NULL ELSE l.name END AS new_c_name,
       c.acctbal_cents AS old_acctbal_cents,
       CASE WHEN l.op = 'D' THEN NULL ELSE l.cents END AS new_acctbal_cents
FROM l JOIN cur c ON c.c_custkey = l.k
"""


# operators/timeseries.py:ols_two_factor — normal-equations fit solved by
# Cramer's rule over exact BIGINT moment sums; the e6 coefficients are the
# identical IEEE double expression floor(1e6 * det_i / det) in both engines.
_OLS_DET = (
    "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s12 - s11 * s2))"
)
_OLS_DET0 = (
    "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
    " + s2 * (s1y * s12 - s11 * s2y))"
)
_OLS_DET1 = (
    "(n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s2y - s1y * s2))"
)
_OLS_DET2 = (
    "(n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
    " + sy * (s1 * s12 - s11 * s2))"
)


def _ols_coef(num: str) -> str:
    return (
        f"CAST(floor((1000000.0 * CAST({num} AS DOUBLE))"
        f" / CAST({_OLS_DET} AS DOUBLE)) AS BIGINT)"
    )


OLS_TWO_FACTOR = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
d0 AS (SELECT event_type, min(day) AS d0 FROM daily GROUP BY 1),
base AS (
  SELECT daily.event_type,
         CAST(datediff('day', d0.d0, daily.day) AS BIGINT) AS x1,
         CAST(CASE WHEN isodow(daily.day) IN (6, 7) THEN 1 ELSE 0 END
              AS BIGINT) AS x2,
         y
  FROM daily JOIN d0 ON daily.event_type = d0.event_type
),
g AS (
  SELECT event_type, COUNT(*) AS n,
         sum(x1) AS s1, sum(x2) AS s2,
         sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22,
         sum(y) AS sy, sum(x1 * y) AS s1y, sum(x2 * y) AS s2y
  FROM base GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST({_OLS_DET} AS BIGINT) AS det,
       {_ols_coef(_OLS_DET0)} AS b0_e6,
       {_ols_coef(_OLS_DET1)} AS b1_e6,
       {_ols_coef(_OLS_DET2)} AS b2_e6
FROM g WHERE {_OLS_DET} > 0
"""


# operators/timeseries.py:autocorr_daily — calendar-lag ACF on the
# zero-filled spine; exact integer moments, one double corr_bp expression.
_ACF_LEADS = "\nUNION ALL\n".join(
    f"SELECT event_type, y, CAST({k} AS BIGINT) AS lag,"
    f" lead(y, {k}) OVER (PARTITION BY event_type ORDER BY day) AS y2"
    " FROM filled"
    for k in range(1, 8)
)

AUTOCORR_DAILY = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
spans AS (SELECT event_type, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1),
spine AS (
  SELECT event_type, CAST(unnest(generate_series(
    CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE)
    AS day
  FROM spans
),
filled AS (
  SELECT s.event_type, s.day, COALESCE(d.y, 0) AS y
  FROM spine s LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day
),
lagged AS ({_ACF_LEADS}),
g AS (
  SELECT event_type, lag, COUNT(*) AS n_pairs,
         sum(y) AS sx, sum(y2) AS sy, sum(y * y2) AS sxy,
         sum(y * y) AS sxx, sum(y2 * y2) AS syy
  FROM lagged WHERE y2 IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, lag, CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_pairs * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(floor(10000.0 * CAST(n_pairs * sxy - sx * sy AS DOUBLE)
            / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                   * CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS BIGINT)
         AS corr_bp
FROM g
WHERE n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
"""


# operators/profile.py:chisq_independence — contingency margins as exact
# BIGINTs; the per-cell contribution is the identical double expression
# (Spark dayofweek is Sunday=1..7; DuckDB's is Sunday=0..6, hence +1).
CHISQ_INDEPENDENCE = """
WITH cells AS (
  SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS row_total FROM cells GROUP BY 1),
c AS (SELECT dow, CAST(sum(o) AS BIGINT) AS col_total FROM cells GROUP BY 1),
t AS (SELECT CAST(sum(o) AS BIGINT) AS n_total FROM cells)
SELECT cells.event_type, cells.dow, cells.o, r.row_total, c.col_total,
       t.n_total,
       CAST(floor(((1000000.0
         * (CAST(cells.o AS DOUBLE) * t.n_total
            - CAST(r.row_total AS DOUBLE) * c.col_total))
         * (CAST(cells.o AS DOUBLE) * t.n_total
            - CAST(r.row_total AS DOUBLE) * c.col_total))
         / (CAST(t.n_total AS DOUBLE) * CAST(r.row_total AS DOUBLE)
            * CAST(c.col_total AS DOUBLE))) AS BIGINT) AS contrib_e6
FROM cells
JOIN r ON cells.event_type = r.event_type
JOIN c ON cells.dow = c.dow
CROSS JOIN t
"""


# operators/profile.py:rank_sum_test — doubled rank sums stay integral
# through ties; the tie-corrected z is one mirrored double expression.
RANK_SUM_TEST = """
WITH base AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('click', 'purchase')
),
hist AS (
  SELECT cents, sum(is_a) AS na, sum(1 - is_a) AS nb FROM base GROUP BY 1
),
ranked AS (
  SELECT na, nb, na + nb AS t,
         sum(na + nb) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (na + nb)
           AS before
  FROM hist
),
agg AS (
  SELECT CAST(sum(na) AS BIGINT) AS n1, CAST(sum(nb) AS BIGINT) AS n2,
         CAST(sum(na * (2 * before + t + 1)) AS BIGINT) AS r2_a,
         CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
  FROM ranked
)
SELECT n1, n2,
       CAST(r2_a - n1 * (n1 + 1) AS BIGINT) AS u2_a,
       CAST(n1 * n2 AS BIGINT) AS mean2,
       tie_term,
       CAST(floor(1000000.0
         * CAST(r2_a - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
         / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 3.0
                * (CAST(n1 + n2 + 1 AS DOUBLE)
                   - CAST(tie_term AS DOUBLE)
                     / (CAST(n1 + n2 AS DOUBLE)
                        * CAST(n1 + n2 - 1 AS DOUBLE)))))
         AS BIGINT) AS z_e6
FROM agg
WHERE n1 > 0 AND n2 > 0
  AND CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 3.0
      * (CAST(n1 + n2 + 1 AS DOUBLE)
         - CAST(tie_term AS DOUBLE)
           / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))) > 0
"""


# operators/profile.py:hll_overlap — the exact flag rollup is the oracle;
# the sketch estimate is engine-specific, pinned by the within-bound flag
# (same stance as hll_incremental_distinct / approx_distinct_users).
HLL_OVERLAP = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ha,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hb
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1
)
SELECT CAST(sum(ha) AS BIGINT) AS exact_a,
       CAST(sum(hb) AS BIGINT) AS exact_b,
       CAST(sum(ha * hb) AS BIGINT) AS exact_both,
       TRUE AS overlap_ok
FROM per_user
"""


# operators/profile.py:winsorized_stats — cut points at histogram ranks
# (ceil(q*n), lower-value convention); clamped sums in BIGINT cents.
WINSORIZED_STATS = """
WITH hist AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, cents, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
),
cuts AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n,
         min(CASE WHEN cum >= (5 * n + 99) // 100 THEN cents END) AS lo_cents,
         min(CASE WHEN cum >= (95 * n + 99) // 100 THEN cents END) AS hi_cents
  FROM cum GROUP BY 1
)
SELECT h.event_type, c.n, c.lo_cents, c.hi_cents,
       CAST(sum(h.cnt * greatest(c.lo_cents, least(c.hi_cents, h.cents)))
            AS BIGINT) AS clamped_sum_cents,
       CAST(sum(h.cnt * greatest(c.lo_cents, least(c.hi_cents, h.cents)))
            AS BIGINT) // c.n AS winsor_mean_cents
FROM hist h JOIN cuts c ON h.event_type = c.event_type
GROUP BY 1, 2, 3, 4
"""


# operators/similarity.py:embedding_covariance — upper-triangle outer
# products reduced to exact BIGINT moments; Spark array subscripts are
# 0-based, DuckDB's 1-based, hence the +1 shifts.
EMBEDDING_COVARIANCE = """
WITH q AS (
  SELECT list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
cells AS (
  SELECT i.i AS i, j.j AS j, qv[i.i + 1] AS x, qv[j.j + 1] AS y
  FROM q,
       LATERAL (SELECT unnest(range(len(qv))) AS i) i,
       LATERAL (SELECT unnest(range(len(qv))) AS j) j
  WHERE j.j >= i.i
)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sx,
       CAST(sum(y) AS BIGINT) AS sy,
       CAST(sum(x * y) AS BIGINT) AS sxy,
       CAST(COUNT(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS cov_num
FROM cells GROUP BY 1, 2
"""


# operators/analytics.py:rollup_cascade — the oracle takes the DIRECT
# path; a hash match therefore proves the hour->day->week cascade is
# lossless. Both engines truncate weeks to Monday.
ROLLUP_CASCADE = """
SELECT event_type,
       CAST(CAST(date_trunc('week', ts) AS DATE) AS VARCHAR) AS week,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       TRUE AS count_match,
       TRUE AS cents_match
FROM events GROUP BY 1, 2
"""


# operators/linkage.py:link_customers — both blocking passes, the block
# purge, and the agreement scoring replayed verbatim in SQL.
RECORD_LINKAGE = """
WITH clean AS (
  SELECT c_custkey AS clean_id,
         CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS digits,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
         CAST(c_nationkey AS BIGINT) AS nation,
         c_mktsegment AS seg
  FROM customer
),
dirty AS (
  SELECT c_custkey AS dirty_id,
         CAST(regexp_extract(
           'cust-' || CASE WHEN c_custkey % 13 = 0
                           THEN reverse(CAST(c_custkey AS VARCHAR))
                           ELSE CAST(c_custkey AS VARCHAR) END,
           '([0-9]+)$', 1) AS BIGINT) AS d_digits,
         CAST(round(c_acctbal * 100) AS BIGINT) + (c_custkey % 7) - 3
           AS d_cents,
         CAST(CASE WHEN c_custkey % 20 = 0 THEN (c_nationkey + 1) % 25
                   ELSE c_nationkey END AS BIGINT) AS d_nation,
         c_mktsegment AS d_seg
  FROM customer WHERE c_custkey % 10 <> 9
),
p1 AS (
  SELECT clean_id, digits, cents, nation, seg,
         dirty_id, d_digits, d_cents, d_nation, d_seg
  FROM clean JOIN dirty ON digits = d_digits
),
cblk AS (
  SELECT clean.*, CAST(floor(cents / 10000.0) AS BIGINT) AS blk FROM clean
),
sizes AS (SELECT nation, blk, COUNT(*) AS bn FROM cblk GROUP BY 1, 2),
bounded AS (
  SELECT cblk.* FROM cblk
  JOIN sizes ON cblk.nation = sizes.nation AND cblk.blk = sizes.blk
  WHERE sizes.bn <= 1000
),
dblk AS (
  SELECT dirty.*, CAST(floor(d_cents / 10000.0) AS BIGINT) AS d_blk
  FROM dirty
),
p2 AS (
  SELECT clean_id, digits, cents, nation, seg,
         dirty_id, d_digits, d_cents, d_nation, d_seg
  FROM bounded JOIN dblk
    ON bounded.nation = dblk.d_nation AND bounded.blk = dblk.d_blk
),
cands AS (SELECT DISTINCT * FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)),
scored AS (
  SELECT clean_id, dirty_id,
         CAST(CASE WHEN digits = d_digits THEN 40 ELSE 0 END AS BIGINT)
           AS name_pts,
         CAST(CASE WHEN abs(cents - d_cents) <= 3 THEN 30 ELSE 0 END
           AS BIGINT) AS bal_pts,
         CAST(CASE WHEN nation = d_nation THEN 10 ELSE 0 END AS BIGINT)
           AS nation_pts,
         CAST(CASE WHEN seg = d_seg THEN 5 ELSE 0 END AS BIGINT) AS seg_pts
  FROM cands
)
SELECT clean_id, dirty_id, name_pts, bal_pts, nation_pts, seg_pts,
       CAST(name_pts + bal_pts + nation_pts + seg_pts AS BIGINT) AS score
FROM scored
WHERE name_pts + bal_pts + nation_pts + seg_pts >= 45
"""


# operators/behavior.py:capped_running_sum — the double-bounded clamp
# walk replayed as a recursive CTE (same discipline as debounce_events:
# the escape-hatch imperative logic is itself hash-checked).
CAPPED_RUNNING_SUM = """
WITH RECURSIVE ordered AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         CASE WHEN event_type = 'purchase'
              THEN -3 * CAST(round(value * 100) AS BIGINT)
              ELSE CAST(round(value * 100) AS BIGINT) END AS delta
  FROM events
),
walk AS (
  SELECT user_id, rn, n,
         CASE WHEN delta > 100000 THEN 100000
              WHEN delta < 0 THEN 0 ELSE delta END AS bal,
         CASE WHEN delta > 100000 THEN 1 ELSE 0 END AS hi,
         CASE WHEN delta < 0 THEN 1 ELSE 0 END AS lo
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.rn, o.n,
         CASE WHEN w.bal + o.delta > 100000 THEN 100000
              WHEN w.bal + o.delta < 0 THEN 0
              ELSE w.bal + o.delta END,
         w.hi + CASE WHEN w.bal + o.delta > 100000 THEN 1 ELSE 0 END,
         w.lo + CASE WHEN w.bal + o.delta < 0 THEN 1 ELSE 0 END
  FROM walk w JOIN ordered o ON o.user_id = w.user_id AND o.rn = w.rn + 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       CAST(bal AS BIGINT) AS final_balance,
       CAST(hi AS BIGINT) AS n_sat_hi, CAST(lo AS BIGINT) AS n_sat_lo
FROM walk WHERE rn = n
"""


# __spark_entry__.py:q_jsonl_roundtrip — the oracle reads the parquet
# directly; a hash match proves the JSONL write/read hop was lossless.
JSONL_ROUNDTRIP = """
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id,
       CAST(sum(length(text)) AS BIGINT) AS text_chars,
       CAST(sum(n_chars) AS BIGINT) AS n_chars_total
FROM documents GROUP BY 1, 2
"""


# operators/multimodal.py:image_downsample — surviving rows are
# y = 0, 2, ... (ceil-div dims); each contributes 3 * out_width pixels of
# the generator's (doc_id + y) % 256 row value.
IMAGE_DOWNSAMPLE = """
SELECT doc_id AS media_id,
       CAST((n_chars % 31 + 2) // 2 AS BIGINT) AS out_width,
       CAST((doc_id % 17 + 2) // 2 AS BIGINT) AS out_height,
       (SELECT CAST(sum((doc_id + 2 * yy) % 256) * 3 * ((n_chars % 31 + 2) // 2)
               AS BIGINT)
        FROM unnest(generate_series(0, (doc_id % 17 + 2) // 2 - 1)) AS t(yy))
         AS down_pixel_sum,
       (SELECT CAST((100 * sum((doc_id + 2 * yy) % 256) * 3
                     * ((n_chars % 31 + 2) // 2))
                    // (((n_chars % 31 + 2) // 2)
                        * ((doc_id % 17 + 2) // 2) * 3) AS BIGINT)
        FROM unnest(generate_series(0, (doc_id % 17 + 2) // 2 - 1)) AS t(yy))
         AS down_mean_e2
FROM documents
"""


# operators/graph.py:assoc_rules — basket-bounded pair join; support /
# confidence / lift as truncating integer divisions over exact counts.
ASSOC_RULES = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem
),
n_orders AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM baskets),
per_part AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS n_part FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.part AS part, b.part AS other, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.part <> b.part
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT p.part AS part_a, p.other AS part_b, p.n_ab,
       pa.n_part AS n_a, pb.n_part AS n_b, n.n_orders,
       (10000 * p.n_ab) // n.n_orders AS support_bp,
       (10000 * p.n_ab) // pa.n_part AS confidence_bp,
       (10000 * p.n_ab * n.n_orders) // (pa.n_part * pb.n_part) AS lift_bp
FROM pairs p
JOIN per_part pa ON p.part = pa.part
JOIN per_part pb ON p.other = pb.part
CROSS JOIN n_orders n
"""


# operators/timeseries.py:forecast_backtest — seasonal-naive lag-7 on
# the zero-filled spine; WAPE as a ratio of exact BIGINTs.
FORECAST_BACKTEST = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
spans AS (SELECT event_type, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1),
spine AS (
  SELECT event_type, CAST(unnest(generate_series(
    CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE)
    AS day
  FROM spans
),
filled AS (
  SELECT s.event_type, s.day, COALESCE(d.y, 0) AS y
  FROM spine s LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day
),
scored AS (
  SELECT event_type, y,
         lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS pred
  FROM filled
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(sum(abs(y - pred)) AS BIGINT) AS abs_err,
       CAST(sum(y) AS BIGINT) AS actual_total,
       CAST(sum(CASE WHEN y = pred THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       (10000 * CAST(sum(abs(y - pred)) AS BIGINT))
         // CAST(sum(y) AS BIGINT) AS wape_bp
FROM scored WHERE pred IS NOT NULL
GROUP BY 1
"""


# operators/analytics.py:ivm_agg_delta — the oracle aggregates the final
# state from scratch (key % 89 != 0); a hash match proves the
# insert/delete multiplicity algebra, including zero-group removal.
IVM_AGG_DELTA = """
SELECT o_orderpriority AS priority,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         // COUNT(*) AS avg_cents
FROM orders WHERE o_orderkey % 89 <> 0
GROUP BY 1, 2
"""


# operators/sqlsurface.py:recursive_hierarchy — same fixpoint in DuckDB
# (// mirrors Spark div on the non-negative keys).
RECURSIVE_HIERARCHY = """
WITH RECURSIVE walk AS (
  SELECT c_custkey AS node, c_custkey AS cur, CAST(0 AS BIGINT) AS depth
  FROM customer WHERE c_custkey % 50 = 0
  UNION ALL
  SELECT node, cur // 10, depth + 1 FROM walk WHERE cur > 0
)
SELECT node,
       max(depth) AS depth,
       CAST(sum(cur) AS BIGINT) AS ancestor_key_sum,
       CAST(COUNT(*) AS BIGINT) AS n_steps
FROM walk GROUP BY node
"""


# operators/profile.py:entropy_profile — the fold order is part of the
# contract: sorted histogram, explicit 0.0 seed, left fold; both engines
# then run the identical IEEE sequence.
def _entropy_col_sql(table: str, col: str, label: str) -> str:
    return f"""
SELECT '{label}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(floor(1000000.0 * (log2(CAST(sum(cnt) AS DOUBLE))
         - list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
                          list_sort(list(CAST(cnt AS DOUBLE)))),
             (acc, x) -> acc + x * log2(x))
           / CAST(sum(cnt) AS DOUBLE))) AS BIGINT) AS entropy_e6
FROM (SELECT {col} AS v, COUNT(*) AS cnt FROM {table} GROUP BY 1)
"""


ENTROPY_PROFILE = "\nUNION ALL\n".join(
    [
        _entropy_col_sql("events", "event_type", "events.event_type"),
        _entropy_col_sql("documents", "lang", "documents.lang"),
        _entropy_col_sql("documents", "source", "documents.source"),
        _entropy_col_sql("orders", "o_orderpriority", "orders.o_orderpriority"),
    ]
)


# operators/timeseries.py:seasonal_residual_anomalies — dow profile
# removal + lower-median MAD flagging, all integer; DuckDB dayofweek+1
# mirrors Spark's Sunday=1 convention.
SEASONAL_RESIDUAL_ANOMALIES = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2, 3
),
ranked_d AS (
  SELECT event_type, dow, day, y,
         row_number() OVER (PARTITION BY event_type, dow
                            ORDER BY y, day) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, dow) AS nd
  FROM daily
),
prof AS (
  SELECT event_type, dow, y AS med FROM ranked_d WHERE rn = (nd + 1) // 2
),
res AS (
  SELECT d.event_type, CAST(d.day AS VARCHAR) AS day, d.y,
         10000 * p.med AS expected_e4,
         10000 * (d.y - p.med) AS residual_e4
  FROM daily d JOIN prof p ON d.event_type = p.event_type AND d.dow = p.dow
),
ranked AS (
  SELECT event_type, abs(residual_e4) AS ar,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(residual_e4), day) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM res
),
mad AS (
  SELECT event_type, ar AS mad_e4 FROM ranked WHERE rn = (n + 1) // 2
)
SELECT r.event_type, r.day, r.y,
       CAST(r.expected_e4 AS BIGINT) AS expected_e4,
       CAST(r.residual_e4 AS BIGINT) AS residual_e4,
       CAST(m.mad_e4 AS BIGINT) AS mad_e4,
       abs(r.residual_e4) > 3 * m.mad_e4 AS flagged
FROM res r JOIN mad m ON r.event_type = m.event_type
"""


# operators/text.py:bigram_surprisal — add-one-smoothed bigram LM; each
# term floors to millibits before the per-doc integer sum.
BIGRAM_SURPRISAL = f"""
WITH toked AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
),
grams AS (
  SELECT doc_id, w[i - 1] AS a, w[i] AS b
  FROM toked, LATERAL (SELECT unnest(generate_series(2, len(w))) AS i) g
  WHERE len(w) >= 2
),
counts AS (SELECT a, b, COUNT(*) AS c_ab FROM grams GROUP BY 1, 2),
firsts AS (SELECT a, SUM(c_ab) AS c_a FROM counts GROUP BY 1),
vsize AS (
  SELECT COUNT(DISTINCT t) AS v
  FROM (SELECT unnest(w) AS t FROM toked)
),
scored AS (
  SELECT g.doc_id,
         CAST(floor(log2(CAST(f.c_a + s.v AS DOUBLE)
                         / CAST(c.c_ab + 1 AS DOUBLE)) * 1000 + 0.5)
              AS BIGINT) AS mb
  FROM grams g
  JOIN counts c ON g.a = c.a AND g.b = c.b
  JOIN firsts f ON g.a = f.a
  CROSS JOIN vsize s
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(mb) AS BIGINT) AS surprisal_mb,
       CAST(SUM(mb) // COUNT(*) AS BIGINT) AS avg_surprisal_mb
FROM scored GROUP BY doc_id
"""


# __spark_entry__.py:q_pysink_roundtrip — oracle reads the parquet
# directly; hash match proves the python-sink round-trip lossless.
PYSINK_ROUNDTRIP = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(min(c_custkey) AS BIGINT) AS min_key,
       CAST(max(c_custkey) AS BIGINT) AS max_key,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM customer GROUP BY 1
"""


# operators/profile.py:ooo_audit — arrival order = event_id; exact
# epoch-microsecond deltas.
OOO_AUDIT = """
WITH stepped AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY event_id) AS step_us
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_steps,
       CAST(sum(CASE WHEN step_us < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_backward,
       CAST(min(CASE WHEN step_us < 0 THEN step_us END) AS BIGINT)
         AS worst_regression_us,
       (10000 * CAST(sum(CASE WHEN step_us < 0 THEN 1 ELSE 0 END) AS BIGINT))
         // COUNT(*) AS backward_bp
FROM stepped WHERE step_us IS NOT NULL
GROUP BY 1
"""


# operators/analytics.py:nested_order_items — the oracle answers the
# same per-order questions relationally (max_by / count / sum); a hash
# match proves the nested build+HOF readouts lossless.
NESTED_ORDER_ITEMS = """
WITH it AS (
  SELECT l_orderkey AS okey, l_partkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
ranked AS (
  SELECT okey, l_partkey, cents,
         row_number() OVER (PARTITION BY okey
                            ORDER BY cents DESC, l_partkey) AS rn
  FROM it
),
per_order AS (
  SELECT okey, CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(sum(cents) AS BIGINT) AS total_cents
  FROM it GROUP BY 1
)
SELECT p.okey, o.o_orderpriority, p.n_items,
       CAST(r.l_partkey AS BIGINT) AS top_partkey,
       CAST(r.cents AS BIGINT) AS top_cents,
       p.total_cents
FROM per_order p
JOIN ranked r ON p.okey = r.okey AND r.rn = 1
JOIN orders o ON p.okey = o.o_orderkey
"""


# operators/governance.py:k_anonymity — class sizes then a size
# histogram; bands via non-negative floor division.
K_ANONYMITY = """
WITH cls AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000
           AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS class_size
  FROM customer GROUP BY 1, 2, 3
)
SELECT class_size,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(COUNT(*) * class_size AS BIGINT) AS n_people,
       class_size < 5 AS fails_k
FROM cls GROUP BY 1
"""


# operators/governance.py:cogroup_reconcile — full outer of two keyed
# aggregates; the cogroup contract mirrors exactly this.
COGROUP_RECONCILE = """
WITH e AS (
  SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS event_cents
  FROM events GROUP BY 1
),
o AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS order_cents
  FROM orders GROUP BY 1
)
SELECT COALESCE(e.k, o.k) AS k,
       COALESCE(e.n_events, 0) AS n_events,
       COALESCE(e.event_cents, 0) AS event_cents,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(o.order_cents, 0) AS order_cents,
       e.k IS NOT NULL AND o.k IS NOT NULL AS in_both
FROM e FULL OUTER JOIN o ON e.k = o.k
"""


# operators/similarity.py:arrow_label_stats — relational mirror of the
# Arrow-kernel per-label stats (DuckDB lists are 1-based).
ARROW_LABEL_STATS = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(sum(CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT)
         AS dim0_sum_e6,
       CAST(min(vec_id) AS BIGINT) AS min_vec_id,
       CAST(max(vec_id) AS BIGINT) AS max_vec_id
FROM embeddings GROUP BY 1
"""


# __spark_entry__.py:q_sql_ddl_roundtrip — oracle aggregates nation
# directly; hash match proves CTAS + INSERT INTO rebuilt it losslessly.
SQL_DDL_ROUNDTRIP = """
SELECT CAST(n_regionkey AS BIGINT) AS region,
       CAST(COUNT(*) AS BIGINT) AS n_nations,
       CAST(min(n_nationkey) AS BIGINT) AS min_key,
       CAST(max(n_nationkey) AS BIGINT) AS max_key
FROM nation GROUP BY 1
"""


# operators/geo.py:points_in_zones — same integer ray cast; the edge
# table regenerates from the SAME ZONES constant (no duplicated
# geometry to drift).
from .operators.geo import ZONES as _ZONES  # noqa: E402


def _zone_edges_values() -> str:
    rows = []
    for zone, verts in _ZONES.items():
        for i, (x1, y1) in enumerate(verts):
            x2, y2 = verts[(i + 1) % len(verts)]
            rows.append(f"('{zone}', {x1}, {y1}, {x2}, {y2})")
    return ",\n         ".join(rows)


POINTS_IN_ZONES = f"""
WITH points AS (
  SELECT c_custkey AS pid,
         CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS x,
         (c_custkey * 2654435761) % 1000000 AS y
  FROM customer
),
edges(zone, x1, y1, x2, y2) AS (
  VALUES {_zone_edges_values()}
),
j AS (
  SELECT pid, zone,
         CASE WHEN ((y1 > y) <> (y2 > y))
                   AND (((x1 - x) * (y2 - y) - (x2 - x) * (y1 - y) > 0)
                        = (y2 > y1))
              THEN 1 ELSE 0 END AS c
  FROM points, edges
),
par AS (SELECT pid, zone, sum(c) % 2 = 1 AS inside FROM j GROUP BY 1, 2)
SELECT zone, CAST(COUNT(*) AS BIGINT) AS n_inside,
       CAST(sum(pid) AS BIGINT) AS pid_sum,
       CAST(min(pid) AS BIGINT) AS min_pid,
       CAST(max(pid) AS BIGINT) AS max_pid
FROM par WHERE inside GROUP BY 1
"""


# operators/profile.py:bitmap_overlap — same word algebra in SQL.
BITMAP_OVERLAP = """
WITH am AS (
  SELECT user_id // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS mask
  FROM events WHERE event_type = 'click' GROUP BY 1
),
bm AS (
  SELECT user_id // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS mask
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
j AS (
  SELECT COALESCE(am.mask, 0) AS ma, COALESCE(bm.mask, 0) AS mb
  FROM am FULL OUTER JOIN bm ON am.word = bm.word
),
agg AS (
  SELECT CAST(sum(bit_count(ma)) AS BIGINT) AS n_a,
         CAST(sum(bit_count(mb)) AS BIGINT) AS n_b,
         CAST(sum(bit_count(ma & mb)) AS BIGINT) AS n_and,
         CAST(sum(bit_count(ma | mb)) AS BIGINT) AS n_or
  FROM j
)
SELECT n_a, n_b, n_and, n_or,
       n_a + n_b - n_and = n_or AS inclusion_exclusion_ok
FROM agg
"""


# operators/sqlsurface.py:null_safe_join — IS NOT DISTINCT FROM is
# DuckDB's <=>.
NULL_SAFE_JOIN = """
WITH keyed AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
  FROM customer
),
segs AS (SELECT DISTINCT seg FROM keyed),
eq AS (
  SELECT s.seg, CAST(COUNT(k.c_custkey) AS BIGINT) AS n
  FROM segs s LEFT JOIN keyed k ON s.seg = k.seg GROUP BY s.seg
),
ns AS (
  SELECT s.seg, CAST(COUNT(k.c_custkey) AS BIGINT) AS n
  FROM segs s LEFT JOIN keyed k ON s.seg IS NOT DISTINCT FROM k.seg
  GROUP BY s.seg
)
SELECT s.seg, eq.n AS n_equal_join, ns.n AS n_nullsafe_join
FROM segs s
JOIN eq ON s.seg IS NOT DISTINCT FROM eq.seg
JOIN ns ON s.seg IS NOT DISTINCT FROM ns.seg
"""


# operators/graph.py:sssp_weighted — k bounded relaxations == min cost
# over paths of <= k edges, replayed by recursive path enumeration on
# the same customer-supplier bipartite graph (min-quantity weights).
SSSP_WEIGHTED = """
WITH RECURSIVE pairs AS (
  SELECT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node,
         CAST(min(l_quantity) AS BIGINT) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
),
edges AS (
  SELECT c_node AS src, s_node AS dst, w FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst, w FROM pairs
),
walk AS (
  SELECT CAST(2 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist, 0 AS depth
  UNION ALL
  SELECT e.dst, b.dist + e.w, b.depth + 1
  FROM walk b JOIN edges e ON e.src = b.node WHERE b.depth < 3
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY 1
"""


# operators/intervals.py:interval_union_length — identical island
# algebra (strict break on start > running max of previous ends).
INTERVAL_UNION_LENGTH = """
WITH base AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + 300000000 AS e, event_id
  FROM events
),
marked AS (
  SELECT user_id, s, e, event_id,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM base
),
islanded AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
),
islands AS (
  SELECT user_id, island, min(s) AS is_s, max(e) AS is_e
  FROM islanded GROUP BY 1, 2
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(sum(is_e - is_s) AS BIGINT) AS covered_us
FROM islands GROUP BY 1
"""


# operators/behavior.py:rfm_scores — quintile cut values by histogram
# rank selection per dimension, then value-comparison buckets.
def _rfm_cuts_cte(col: str, tag: str) -> str:
    return f"""{tag} AS (
  SELECT {', '.join(
    f"min(CASE WHEN cum >= ({k} * n + 4) // 5 THEN v END) AS {tag}{k}"
    for k in (1, 2, 3, 4)
  )}
  FROM (
    SELECT v, sum(cnt) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(cnt) OVER () AS n
    FROM (SELECT {col} AS v, COUNT(*) AS cnt FROM base GROUP BY 1)
  )
)"""


RFM_SCORES = f"""
WITH per_user AS (
  SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
maxd AS (SELECT max(last_day) AS corpus_max FROM per_user),
base AS (
  SELECT user_id,
         CAST(datediff('day', last_day, corpus_max) AS BIGINT)
           AS recency_days,
         frequency, monetary_cents
  FROM per_user, maxd
),
{_rfm_cuts_cte('recency_days', 'rc')},
{_rfm_cuts_cte('frequency', 'fc')},
{_rfm_cuts_cte('monetary_cents', 'mc')},
scored AS (
  SELECT b.user_id, b.recency_days, b.frequency, b.monetary_cents,
         6 - (1 + CAST(b.recency_days > rc1 AS BIGINT)
                + CAST(b.recency_days > rc2 AS BIGINT)
                + CAST(b.recency_days > rc3 AS BIGINT)
                + CAST(b.recency_days > rc4 AS BIGINT)) AS r,
         1 + CAST(b.frequency > fc1 AS BIGINT)
           + CAST(b.frequency > fc2 AS BIGINT)
           + CAST(b.frequency > fc3 AS BIGINT)
           + CAST(b.frequency > fc4 AS BIGINT) AS f,
         1 + CAST(b.monetary_cents > mc1 AS BIGINT)
           + CAST(b.monetary_cents > mc2 AS BIGINT)
           + CAST(b.monetary_cents > mc3 AS BIGINT)
           + CAST(b.monetary_cents > mc4 AS BIGINT) AS m
  FROM base b, rc, fc, mc
)
SELECT user_id, recency_days, frequency, monetary_cents,
       CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
       CAST(m AS BIGINT) AS m,
       CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
         AS rfm_segment
FROM scored
"""


# __spark_entry__.py:q_json_corrupt_audit — every 7th line truncated to
# 15 chars cannot parse; everything else must survive byte-exact.
JSON_CORRUPT_AUDIT = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_good,
       CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corrupt,
       CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN doc_id END) AS BIGINT)
         AS good_id_sum,
       CAST(sum(CASE WHEN doc_id % 7 <> 0 THEN n_chars END) AS BIGINT)
         AS good_chars_sum
FROM documents
"""


# __spark_entry__.py:q_tz_local_daily — DuckDB: naive-UTC -> instant ->
# New York local naive, then date.
TZ_LOCAL_DAILY = """
SELECT CAST(CAST(timezone('America/New_York', timezone('UTC', ts))
            AS DATE) AS VARCHAR) AS ny_date,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
"""


# operators/analytics.py:uplift_by_segment — per-segment CATE table.
UPLIFT_BY_SEGMENT = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n_events,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY 1
),
stats AS (SELECT max(n_events) AS max_n FROM per_user),
cells AS (
  SELECT CAST(least(n_events // greatest(1, (max_n + 3) // 4), 3)
              AS BIGINT) AS segment,
         CAST(user_id % 2 AS BIGINT) AS variant,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM per_user CROSS JOIN stats GROUP BY 1, 2
),
c2 AS (
  SELECT *, (10000 * n_converted) // n_users AS conv_bp FROM cells
),
control AS (SELECT segment, conv_bp AS control_bp FROM c2 WHERE variant = 0)
SELECT c2.segment, c2.variant, c2.n_users, c2.n_converted,
       CAST(c2.conv_bp AS BIGINT) AS conv_bp,
       CAST(CASE WHEN control.control_bp > 0
                 THEN (10000 * c2.conv_bp) // control.control_bp - 10000
            END AS BIGINT) AS uplift_bp
FROM c2 JOIN control ON c2.segment = control.segment
"""


# operators/behavior.py:funnel_time_quartiles — first-click ->
# first-at-or-after purchase latency, value-at-rank quartiles.
FUNNEL_TIME_QUARTILES = """
WITH marks AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c0
  FROM events GROUP BY 1
),
j AS (
  SELECT e.user_id, max(m.c0) AS c0,
         min(CASE WHEN e.event_type = 'purchase'
                       AND epoch_us(e.ts) >= m.c0
                  THEN epoch_us(e.ts) END) AS p0
  FROM events e JOIN marks m ON e.user_id = m.user_id
  GROUP BY 1
),
lat AS (
  SELECT (p0 - c0) // 1000000 AS s
  FROM j WHERE c0 IS NOT NULL AND p0 IS NOT NULL
),
ranked AS (
  SELECT s, row_number() OVER (ORDER BY s) AS rn, COUNT(*) OVER () AS n
  FROM lat
)
SELECT CAST(max(n) AS BIGINT) AS n_converted,
       CAST(max(CASE WHEN rn = (n - 1) * 25 // 100 + 1 THEN s END)
            AS BIGINT) AS p25_seconds,
       CAST(max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN s END)
            AS BIGINT) AS p50_seconds,
       CAST(max(CASE WHEN rn = (n - 1) * 75 // 100 + 1 THEN s END)
            AS BIGINT) AS p75_seconds
FROM ranked
"""


# operators/sqlsurface.py:try_arithmetic — NULLIF mirrors NULL-on-zero;
# TRY_CAST mirrors range-checked narrowing.
TRY_ARITHMETIC = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_orderkey % 5 AS BIGINT) AS div5
  FROM orders
),
derived AS (
  SELECT k, cents,
         cents / NULLIF(div5, 0) AS per_bucket,
         TRY_CAST(cents * 1000000 AS INT) AS narrow
  FROM base
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(per_bucket) AS BIGINT) AS n_divisible,
       CAST(COUNT(*) - COUNT(per_bucket) AS BIGINT) AS n_div_null,
       CAST(COUNT(narrow) AS BIGINT) AS n_cast_ok,
       CAST(sum(CAST(floor(per_bucket) AS BIGINT)) AS BIGINT)
         AS sum_floor_per_bucket
FROM derived
"""


# operators/text.py:extract_numbers — both engines chunk digit runs
# greedily left-to-right, so the 9-digit cap is stable.
EXTRACT_NUMBERS = r"""
WITH ex AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '[0-9]{1,9}'),
                        x -> CAST(x AS BIGINT)) AS vals
  FROM documents
)
SELECT doc_id,
       CAST(len(vals) AS BIGINT) AS n_numbers,
       CAST(coalesce(list_sum(vals), 0) AS BIGINT) AS number_sum,
       CAST(list_max(vals) AS BIGINT) AS max_number
FROM ex
"""


# streaming/pipeline.py:stream_bitmap_distinct — OR-mergeable state is
# batching-invisible; the batch bitmap is the exact mirror.
STREAM_BITMAP_DISTINCT = """
WITH words AS (
  SELECT event_type, user_id // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS mask
  FROM events GROUP BY 1, 2
)
SELECT event_type, CAST(sum(bit_count(mask)) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_words
FROM words GROUP BY 1
"""


# operators/text.py:sentence_stats — same [.!?]+ split / trim / drop-
# empties pipeline; DuckDB's string_split_regex mirrors Spark's split.
SENTENCE_STATS = r"""
WITH segs AS (
  SELECT doc_id,
         list_transform(
           list_filter(
             list_transform(string_split_regex(text, '[.!?]+'),
                            x -> trim(x)),
             x -> x <> ''),
           s -> CAST(length(s) AS BIGINT)) AS lens
  FROM documents
)
SELECT doc_id,
       CAST(len(lens) AS BIGINT) AS n_sentences,
       CAST(coalesce(list_sum(lens), 0) AS BIGINT) AS total_chars,
       CAST(list_max(lens) AS BIGINT) AS max_sentence_chars,
       CAST(CASE WHEN len(lens) > 0
                 THEN (100 * coalesce(list_sum(lens), 0)) // len(lens)
                 ELSE 0 END AS BIGINT) AS mean_len_e2
FROM segs
"""


# operators/timeseries.py:crosscorr_daily — lead-lag correlation of the
# click/purchase daily series over the shared zero-filled spine.
_XCF_LEADS = "\nUNION ALL\n".join(
    f"SELECT a, CAST({k} AS BIGINT) AS lag,"
    f" lead(b, {k}) OVER (ORDER BY day) AS b2"
    " FROM wide"
    for k in range(0, 8)
)

CROSSCORR_DAILY = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2
),
span AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
spine AS (
  SELECT CAST(unnest(generate_series(
    CAST(mn AS TIMESTAMP), CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE)
    AS day
  FROM span
),
wide AS (
  SELECT s.day,
         COALESCE(max(CASE WHEN d.event_type = 'click' THEN d.y END), 0)
           AS a,
         COALESCE(max(CASE WHEN d.event_type = 'purchase' THEN d.y END), 0)
           AS b
  FROM spine s LEFT JOIN daily d ON s.day = d.day
  GROUP BY 1
),
lagged AS ({_XCF_LEADS}),
g AS (
  SELECT lag, COUNT(*) AS n_pairs,
         sum(a) AS sa, sum(b2) AS sb, sum(a * b2) AS sab,
         sum(a * a) AS saa, sum(b2 * b2) AS sbb
  FROM lagged WHERE b2 IS NOT NULL GROUP BY 1
)
SELECT lag, CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_pairs * sab - sa * sb AS BIGINT) AS cov_num,
       CAST(floor(10000.0 * CAST(n_pairs * sab - sa * sb AS DOUBLE)
            / sqrt(CAST(n_pairs * saa - sa * sa AS DOUBLE)
                   * CAST(n_pairs * sbb - sb * sb AS DOUBLE))) AS BIGINT)
         AS corr_bp
FROM g
WHERE n_pairs * saa - sa * sa > 0 AND n_pairs * sbb - sb * sb > 0
"""


# operators/behavior.py:burst_max — same RANGE frame over epoch micros.
BURST_MAX = """
WITH counted AS (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 299999999 PRECEDING AND CURRENT ROW) AS trail_n
  FROM events
)
SELECT user_id, CAST(max(trail_n) AS BIGINT) AS max_burst,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM counted GROUP BY 1
"""


# operators/analytics.py:business_lead_time — same closed form; DuckDB
# dayofweek is already 0-based Sunday=0.
BUSINESS_LEAD_TIME = """
WITH first_ship AS (
  SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS ship_day
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d1, ship_day
  FROM orders JOIN first_ship ON o_orderkey = l_orderkey
),
per AS (
  SELECT o_orderpriority,
         (datediff('day', d1, ship_day) // 7) * 5
         + len(list_filter(
             CASE WHEN datediff('day', d1, ship_day) % 7 = 0
                  THEN CAST([] AS BIGINT[])
                  ELSE range(1, datediff('day', d1, ship_day) % 7 + 1) END,
             i -> ((dayofweek(d1) + i) % 7) NOT IN (0, 6))) AS bdays
  FROM j WHERE datediff('day', d1, ship_day) >= 0
)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(sum(bdays) AS BIGINT) AS total_bdays,
       (100 * CAST(sum(bdays) AS BIGINT)) // COUNT(*) AS mean_bdays_e2
FROM per GROUP BY 1
"""


# operators/profile.py:ks_test — D candidates live at distinct values;
# cross-multiplied BIGINT max, one final double division.
KS_TEST = """
WITH base AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('click', 'purchase')
),
hist AS (
  SELECT cents, sum(is_a) AS na, sum(1 - is_a) AS nb FROM base GROUP BY 1
),
cum AS (
  SELECT sum(na) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         sum(nb) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
         sum(na) OVER () AS n1, sum(nb) OVER () AS n2
  FROM hist
)
SELECT CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
       CAST(max(abs(ca * n2 - cb * n1)) AS BIGINT) AS d_num,
       CAST(floor(1000000.0 * CAST(max(abs(ca * n2 - cb * n1)) AS DOUBLE)
            / (CAST(max(n1) AS DOUBLE) * CAST(max(n2) AS DOUBLE)))
         AS BIGINT) AS d_e6
FROM cum
"""


# operators/profile.py:gini_spend — tie-corrected rank formula with
# doubled average ranks over the spend histogram.
GINI_SPEND = """
WITH spend AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
hist AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM spend GROUP BY 1),
ranked AS (
  SELECT cents, cnt,
         sum(cnt) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
           AS before
  FROM hist
),
agg AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(cnt * cents) AS BIGINT) AS s,
         CAST(sum((2 * before + cnt + 1) * cents * cnt) AS BIGINT) AS r2x
  FROM ranked
)
SELECT n, s,
       CAST(r2x - (n + 1) * s AS BIGINT) AS gini_num,
       CAST(floor(1000000.0 * CAST(r2x - (n + 1) * s AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))) AS BIGINT)
         AS gini_e6
FROM agg
"""


# operators/profile.py:cramers_v — integer chi2_e6 sum from the same
# cell expression, one double sqrt at the end.
CRAMERS_V = f"""
WITH cells AS ({CHISQ_INDEPENDENCE}),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT dow) AS BIGINT) AS c,
         CAST(max(n_total) AS BIGINT) AS n_total,
         CAST(sum(contrib_e6) AS BIGINT) AS chi2_e6
  FROM cells
)
SELECT n_cells, r, c, n_total, chi2_e6,
       CAST(floor(1000000.0 * sqrt((CAST(chi2_e6 AS DOUBLE) / 1000000.0)
            / (CAST(n_total AS DOUBLE)
               * CAST(least(r - 1, c - 1) AS DOUBLE)))) AS BIGINT) AS v_e6
FROM agg
"""


# operators/profile.py:psi_value_drift — identical decile cuts, halves
# split at the midpoint epoch, Laplace-smoothed per-bin contributions.
_PSI_CUTS = ", ".join(
    f"min(CASE WHEN cum >= ({k} * n + 9) // 10 THEN cents END) AS t{k}"
    for k in range(1, 10)
)
_PSI_BIN = " + ".join(
    f"CAST(cents > t{k} AS BIGINT)" for k in range(1, 10)
)

PSI_VALUE_DRIFT = f"""
WITH mid AS (
  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS BIGINT)
    AS mid_us
  FROM events
),
base AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN epoch_us(ts) <= mid_us THEN 1 ELSE 0 END AS is_a
  FROM events, mid
),
hist AS (SELECT cents, COUNT(*) AS cnt FROM base GROUP BY 1),
cum AS (
  SELECT cents,
         sum(cnt) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER () AS n
  FROM hist
),
cuts AS (SELECT {_PSI_CUTS} FROM cum),
binned AS (
  SELECT event_type, is_a, {_PSI_BIN} AS bin FROM base, cuts
),
cells AS (
  SELECT event_type, bin, sum(is_a) AS na, sum(1 - is_a) AS nb
  FROM binned GROUP BY 1, 2
),
tots AS (
  SELECT event_type, sum(na) AS ta, sum(nb) AS tb, COUNT(*) AS k
  FROM cells GROUP BY 1
)
SELECT c.event_type, CAST(c.bin AS BIGINT) AS bin,
       CAST(c.na AS BIGINT) AS n_first,
       CAST(c.nb AS BIGINT) AS n_second,
       CAST(floor(1000000.0
         * (CAST(c.na + 1 AS DOUBLE) / CAST(t.ta + t.k AS DOUBLE)
            - CAST(c.nb + 1 AS DOUBLE) / CAST(t.tb + t.k AS DOUBLE))
         * ln((CAST(c.na + 1 AS DOUBLE) / CAST(t.ta + t.k AS DOUBLE))
              / (CAST(c.nb + 1 AS DOUBLE) / CAST(t.tb + t.k AS DOUBLE))))
         AS BIGINT) AS psi_contrib_e6
FROM cells c JOIN tots t ON c.event_type = t.event_type
"""


# operators/behavior.py:path_trigrams — same leads, same total order.
PATH_TRIGRAMS = """
WITH led AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM led WHERE t3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, t1, t2, t3
LIMIT 20
"""


# operators/analytics.py:prorate_order_total — Hamilton largest-remainder
# allocation replayed window-for-window; all-integer so the hash is exact.
PRORATE_ORDER_TOTAL = """
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS w
  FROM lineitem
),
tot AS (
  SELECT o_orderkey AS l_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS t
  FROM orders
),
j AS (
  SELECT li.l_orderkey, li.l_linenumber, li.w, tot.t,
         sum(li.w) OVER (PARTITION BY li.l_orderkey) AS wsum
  FROM li JOIN tot USING (l_orderkey)
),
k AS (
  SELECT *, (t * w) // wsum AS base, (t * w) % wsum AS rem FROM j
),
m AS (
  SELECT *,
         t - sum(base) OVER (PARTITION BY l_orderkey) AS deficit,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY rem DESC, l_linenumber) AS rn
  FROM k
)
SELECT l_orderkey, l_linenumber,
       w AS line_cents, t AS order_cents,
       CAST(base + CASE WHEN rn <= deficit THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_cents
FROM m
"""


# operators/behavior.py:position_attribution — U-shaped credit replay;
# DuckDB dayofweek is Spark's minus one (the calendar-extract rule).
POSITION_ATTRIBUTION = """
WITH p0 AS (
  SELECT user_id, min(ts) AS p0
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
touches AS (
  SELECT e.user_id, e.ts, e.event_id
  FROM events e JOIN p0 ON e.user_id = p0.user_id
  WHERE e.event_type = 'click' AND e.ts <= p0.p0
),
ranked AS (
  SELECT user_id, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM touches
)
SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS click_dow,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(sum(CASE WHEN n = 1 THEN 10000
                     WHEN n = 2 THEN 5000
                     WHEN rn = 1 OR rn = n THEN 4000
                     ELSE 2000 // (n - 2)
                          + CASE WHEN rn = 2 THEN 2000 % (n - 2)
                                 ELSE 0 END END) AS BIGINT)
         AS credit_bp_total
FROM ranked GROUP BY 1
"""


# operators/profile.py:bootstrap_mean_ci — the Poisson(1) weights are a
# pure function of md5(orderkey:rep), so the whole resampling procedure
# replays cell-for-cell; thresholds are the identical hardcoded 2^-32
# integers.
BOOTSTRAP_MEAN_CI = """
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
point AS (SELECT sum(cents) // COUNT(*) AS point_cents FROM base),
reps AS (
  SELECT b.b, base.cents,
         CAST('0x' || substr(md5(CAST(base.k AS VARCHAR) || ':'
                                 || CAST(b.b AS VARCHAR)), 1, 8)
              AS BIGINT) AS u
  FROM base CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b
),
weighted AS (
  SELECT b, cents,
         CASE WHEN u < 1580030168 THEN 0
              WHEN u < 3160060337 THEN 1
              WHEN u < 3950075421 THEN 2
              WHEN u < 4213413783 THEN 3
              WHEN u < 4279248373 THEN 4
              WHEN u < 4292415291 THEN 5
              ELSE 6 END AS w
  FROM reps
),
m AS (
  SELECT b, sum(w * cents) // sum(w) AS mean_cents
  FROM weighted GROUP BY b HAVING sum(w) > 0
),
ranked AS (
  SELECT b, mean_cents,
         row_number() OVER (ORDER BY mean_cents, b) AS rn,
         COUNT(*) OVER () AS nb
  FROM m
)
SELECT CAST(max(nb) AS BIGINT) AS n_reps,
       CAST(max(point_cents) AS BIGINT) AS point_cents,
       CAST(max(CASE WHEN rn = (nb - 1) * 5 // 100 + 1
                     THEN mean_cents END) AS BIGINT) AS lo_cents,
       CAST(max(CASE WHEN rn = (nb - 1) * 50 // 100 + 1
                     THEN mean_cents END) AS BIGINT) AS mid_cents,
       CAST(max(CASE WHEN rn = (nb - 1) * 95 // 100 + 1
                     THEN mean_cents END) AS BIGINT) AS hi_cents
FROM ranked CROSS JOIN point
"""


# operators/timeseries.py:mann_kendall_trend — S, n, tie term, and the
# var numerator are exact BIGINTs; z is the one shared IEEE expression.
MANN_KENDALL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS x,
         sum(CAST(round(value * 100) AS BIGINT)) AS v
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
s AS (
  SELECT a.event_type,
         CAST(sum(sign(b.v - a.v)) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.x < b.x
  GROUP BY 1
),
n AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1
),
ties AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, v, COUNT(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
)
SELECT s.event_type, n.n_days, s.s_stat,
       CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
            AS BIGINT) AS var18,
       CAST(floor(1000000.0
         * (CASE WHEN s_stat > 0 THEN s_stat - 1
                 WHEN s_stat < 0 THEN s_stat + 1
                 ELSE 0 END
            / sqrt(CAST(n_days * (n_days - 1) * (2 * n_days + 5)
                        - tie_term AS DOUBLE) / 18.0)))
         AS BIGINT) AS z_e6
FROM s JOIN n USING (event_type) JOIN ties USING (event_type)
WHERE n_days * (n_days - 1) * (2 * n_days + 5) - tie_term > 0
"""


# operators/profile.py:weighted_median_price — histogram + cumulative
# weight replay; lower-median convention (first cell with 2*cum >= tot).
WEIGHTED_MEDIAN_PRICE = """
WITH hist AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wt
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, cents,
         sum(wt) OVER (PARTITION BY l_returnflag ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_wt,
         sum(wt) OVER (PARTITION BY l_returnflag) AS total_wt
  FROM hist
)
SELECT l_returnflag,
       CAST(min(cents) AS BIGINT) AS wmedian_cents,
       CAST(max(total_wt) AS BIGINT) AS total_units
FROM cum WHERE 2 * cum_wt >= total_wt
GROUP BY 1
"""


# operators/profile.py:mutual_information — per-cell contribution is
# floored to e9 BEFORE the integer sum; margins are exact BIGINTs.
# DuckDB dayofweek = Spark's minus one; only relative grouping matters
# here so the +1 shift is applied for cell identity consistency only.
MUTUAL_INFORMATION = """
WITH base AS (
  SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow FROM events
),
cells AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS nij
  FROM base GROUP BY 1, 2
),
mt AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ni FROM base GROUP BY 1
),
md AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS nj FROM base GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base)
SELECT CAST(max(n.n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(sum(CAST(floor(1000000000.0
         * (CAST(nij AS DOUBLE) / n.n)
         * log2(CAST(nij AS DOUBLE) * n.n
                / (CAST(ni AS DOUBLE) * nj))) AS BIGINT)) AS BIGINT)
         AS mi_e9
FROM cells
JOIN mt USING (event_type)
JOIN md USING (dow)
CROSS JOIN n
"""


# operators/governance.py:l_diversity — distinct sensitive values per
# (nation, balance-band) class; histogram over l.
L_DIVERSITY = """
WITH cls AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 10000
           AS bal_band,
         CAST(COUNT(*) AS BIGINT) AS class_size,
         CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div
  FROM customer GROUP BY 1, 2
)
SELECT l_div,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_people,
       CAST(min(class_size) AS BIGINT) AS min_class_size,
       l_div < 2 AS fails_l
FROM cls GROUP BY 1
"""


# operators/behavior.py:ltv_cohort — first-seen month cohorts, purchase
# cents by age, running cumulative down the age axis.
LTV_COHORT = """
WITH first AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1970-01-01', CAST(min(ts) AS DATE))
              // 7 AS BIGINT) AS cohort_w
  FROM events GROUP BY 1
),
weekly AS (
  SELECT f.cohort_w,
         CAST(date_diff('day', DATE '1970-01-01', CAST(e.ts AS DATE))
              // 7 AS BIGINT) - f.cohort_w AS age_weeks,
         CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents,
         CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_buyers
  FROM events e JOIN first f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT cohort_w, age_weeks, n_buyers, rev_cents,
       CAST(sum(rev_cents) OVER (PARTITION BY cohort_w ORDER BY age_weeks
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_rev_cents
FROM weekly
"""


# operators/sqlsurface.py:bag_setops — INTERSECT ALL keeps min(mult),
# EXCEPT ALL keeps the multiplicity difference; re-aggregated so the
# bag semantics land in the hash.
BAG_SETOPS = """
WITH a AS (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
),
b AS (
  SELECT o_custkey AS custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
),
tagged AS (
  SELECT 'intersect_all' AS op, custkey
  FROM (SELECT custkey FROM a INTERSECT ALL SELECT custkey FROM b)
  UNION ALL
  SELECT 'except_all' AS op, custkey
  FROM (SELECT custkey FROM a EXCEPT ALL SELECT custkey FROM b)
)
SELECT op, custkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
FROM tagged GROUP BY 1, 2
"""


# operators/text.py:readability_lix — HOF word/sentence splits replayed
# with DuckDB list functions; integer LIX per doc, truncating mean.
READABILITY_LIX = r"""
WITH per AS (
  SELECT source,
         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS BIGINT) AS n_words,
         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '' AND length(x) > 6))
              AS BIGINT) AS n_long,
         CAST(len(list_filter(
               list_transform(string_split_regex(text, '[.!?]+'),
                              x -> trim(x)), x -> x <> ''))
              AS BIGINT) AS n_sentences
  FROM documents
),
lix AS (
  SELECT source,
         (100 * n_words) // n_sentences + (10000 * n_long) // n_words
           AS lix_e2
  FROM per WHERE n_words > 0 AND n_sentences > 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(sum(lix_e2) // COUNT(*) AS BIGINT) AS mean_lix_e2,
       CAST(max(lix_e2) AS BIGINT) AS max_lix_e2
FROM lix GROUP BY 1
"""


# operators/behavior.py:new_vs_returning — first-day split of daily
# actives.
NEW_VS_RETURNING = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY 1
),
active AS (
  SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS day, f.first_day
  FROM events e JOIN first f ON e.user_id = f.user_id
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(COUNT(*) - sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returning,
       (10000 * CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                     AS BIGINT)) // COUNT(*) AS new_share_bp
FROM active GROUP BY 1
"""


# operators/behavior.py:inactivity_profile — days-since-last-event
# histogram against the corpus max day, cumulative share in bp.
INACTIVITY_PROFILE = """
WITH last AS (
  SELECT user_id, max(CAST(ts AS DATE)) AS last_day
  FROM events GROUP BY 1
),
horizon AS (SELECT max(CAST(ts AS DATE)) AS max_day FROM events),
hist AS (
  SELECT CAST(date_diff('day', last_day, max_day) AS BIGINT)
           AS days_inactive,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM last CROSS JOIN horizon GROUP BY 1
)
SELECT days_inactive, n_users,
       CAST(10000 * sum(n_users) OVER (ORDER BY days_inactive
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         // sum(n_users) OVER () AS BIGINT) AS cum_share_bp
FROM hist
"""


# operators/graph.py:label_propagation — three synchronous min-label
# rounds unrolled CTE-for-CTE (the kcore_peel replay stance) over the
# same every-4th-order co-part graph.
LABEL_PROPAGATION = """
WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 4 = 0),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
verts AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
sym AS (
  SELECT src, dst FROM e
  UNION ALL SELECT dst AS src, src AS dst FROM e
  UNION ALL SELECT v AS src, v AS dst FROM verts
),
l0 AS (SELECT v, v AS label FROM verts),
l1 AS (SELECT s.dst AS v, min(l.label) AS label
       FROM sym s JOIN l0 l ON s.src = l.v GROUP BY 1),
l2 AS (SELECT s.dst AS v, min(l.label) AS label
       FROM sym s JOIN l1 l ON s.src = l.v GROUP BY 1),
l3 AS (SELECT s.dst AS v, min(l.label) AS label
       FROM sym s JOIN l2 l ON s.src = l.v GROUP BY 1)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members
FROM l3 GROUP BY 1
"""


# operators/analytics.py:melt_event_counts — the melted long form must
# equal the direct (day, type) aggregate; metric carries the pivot
# column name.
MELT_EVENT_COUNTS = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       'cnt_' || event_type AS metric,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE event_type IN ('click', 'view', 'purchase', 'signup', 'error')
GROUP BY 1, 2
"""


# operators/text.py:zipf_slope — top-N term counts, millibit log2
# points, closed-form OLS from exact integer sums.
ZIPF_SLOPE = r"""
WITH counts AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS term
    FROM documents
  )
  GROUP BY 1 ORDER BY cnt DESC, term LIMIT 256
),
pts AS (
  SELECT CAST(floor(1000.0 * log2(CAST(row_number() OVER
                (ORDER BY cnt DESC, term) AS DOUBLE))) AS BIGINT) AS x,
         CAST(floor(1000.0 * log2(CAST(cnt AS DOUBLE))) AS BIGINT) AS y
  FROM counts
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pts
)
SELECT n AS n_terms,
       CAST(floor(1000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
         AS slope_e3
FROM agg WHERE n * sxx - sx * sx > 0
"""


# operators/graph.py:frequent_triples — triple support counted direct;
# the three frequent-pair joins reproduce Apriori's candidate rule
# (a triple survives only if all three pairs pass min_pair).
FREQUENT_TRIPLES = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey % 100 AS p FROM lineitem
),
n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM baskets),
pairs AS (
  SELECT a.p AS a, b.p AS b
  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.p < b.p
  GROUP BY 1, 2
  HAVING 10000 * COUNT(*) >= (SELECT n_orders FROM n)
     AND COUNT(*) >= 2
),
trip AS (
  SELECT a.p AS a, b.p AS b, c.p AS c,
         CAST(COUNT(*) AS BIGINT) AS n_baskets
  FROM baskets a
  JOIN baskets b ON a.ok = b.ok AND a.p < b.p
  JOIN baskets c ON b.ok = c.ok AND b.p < c.p
  GROUP BY 1, 2, 3
),
pruned AS (
  SELECT t.a, t.b, t.c, t.n_baskets
  FROM trip t
  JOIN pairs p1 ON t.a = p1.a AND t.b = p1.b
  JOIN pairs p2 ON t.b = p2.a AND t.c = p2.b
  JOIN pairs p3 ON t.a = p3.a AND t.c = p3.b
)
SELECT a AS cat_a, b AS cat_b, c AS cat_c, n_baskets
FROM pruned
ORDER BY n_baskets DESC, a, b, c
LIMIT 50
"""

# operators/corpus.py:feature_hash_encode — md5-uniform bucket replay
# over 'name:value' strings; collision visibility per bucket.
FEATURE_HASH_ENCODE = """
WITH feats AS (
  SELECT 'nation:' || CAST(c_nationkey AS VARCHAR) AS fv FROM customer
  UNION ALL
  SELECT 'segment:' || c_mktsegment AS fv FROM customer
)
SELECT CAST('0x' || substr(md5(fv), 1, 8) AS BIGINT) % 64 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT fv) AS BIGINT) AS n_distinct_values,
       CAST(sum(CASE WHEN fv LIKE 'nation:%' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nation,
       CAST(sum(CASE WHEN fv LIKE 'segment:%' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_segment
FROM feats GROUP BY 1
"""


# operators/corpus.py:target_encode_loo — (S - y) / (n - 1) in exact
# e2; singleton categories excluded.
TARGET_ENCODE_LOO = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
),
stats AS (
  SELECT o_orderpriority, CAST(sum(y) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM base GROUP BY 1
)
SELECT b.o_orderkey, b.o_orderpriority, b.y AS y_cents,
       (100 * (s.s - b.y)) // (s.n - 1) AS loo_e2
FROM base b JOIN stats s ON b.o_orderpriority = s.o_orderpriority
WHERE s.n > 1
"""


# operators/analytics.py:pivot_native — the pivot compiles to the same
# conditional aggregates; mirrored directly.
PIVOT_NATIVE = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
         AS click_n,
       CAST(sum(CASE WHEN event_type = 'click'
                THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
         AS click_cents,
       CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
         AS view_n,
       CAST(sum(CASE WHEN event_type = 'view'
                THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
         AS view_cents,
       CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
         AS purchase_n,
       CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
         AS purchase_cents,
       CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT)
         AS signup_n,
       CAST(sum(CASE WHEN event_type = 'signup'
                THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
         AS signup_cents,
       CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
         AS error_n,
       CAST(sum(CASE WHEN event_type = 'error'
                THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
         AS error_cents
FROM events GROUP BY 1
"""


# operators/analytics.py:map_rollup — the relational content the map
# round trip must preserve; n_keys from a per-day window.
MAP_ROLLUP = """
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT day, event_type, n,
       CAST(COUNT(*) OVER (PARTITION BY day) AS BIGINT) AS n_keys
FROM daily
"""


# operators/text.py:langid_confusion / langid_kappa — predictions
# replayed through the module's argmax machinery; margins, per-class
# metrics, and the exact-rational kappa.
_LANGID_PRED_CTE = f"""
toks AS (SELECT doc_id, lang, list_distinct({_TOKS}) AS dw FROM documents),
scored AS (SELECT doc_id, lang,
  {_RAW_SCORES}
  FROM toks),
pred AS (SELECT lang AS labeled_lang, {_ARGMAX} AS pred_lang FROM scored)
"""

LANGID_CONFUSION = f"""
WITH {_LANGID_PRED_CTE},
bp AS (
  SELECT pred_lang AS cls, CAST(COUNT(*) AS BIGINT) AS n_pred,
         CAST(sum(CASE WHEN labeled_lang = pred_lang THEN 1 ELSE 0 END)
              AS BIGINT) AS tp_p
  FROM pred GROUP BY 1
),
bl AS (
  SELECT labeled_lang AS cls, CAST(COUNT(*) AS BIGINT) AS n_labeled,
         CAST(sum(CASE WHEN labeled_lang = pred_lang THEN 1 ELSE 0 END)
              AS BIGINT) AS tp_l
  FROM pred GROUP BY 1
),
j AS (
  SELECT coalesce(bp.cls, bl.cls) AS cls,
         coalesce(n_pred, 0) AS n_pred,
         coalesce(n_labeled, 0) AS n_labeled,
         greatest(coalesce(tp_p, 0), coalesce(tp_l, 0)) AS tp
  FROM bp FULL OUTER JOIN bl ON bp.cls = bl.cls
),
m AS (
  SELECT cls, n_labeled, n_pred, tp,
         n_pred - tp AS fp, n_labeled - tp AS fn,
         CASE WHEN n_pred > 0 THEN (10000 * tp) // n_pred END AS prec_bp,
         CASE WHEN n_labeled > 0 THEN (10000 * tp) // n_labeled END
           AS rec_bp
  FROM j
)
SELECT cls, n_labeled, n_pred, tp, fp, fn, prec_bp, rec_bp,
       CAST(CASE WHEN prec_bp IS NOT NULL AND rec_bp IS NOT NULL
                      AND prec_bp + rec_bp > 0
                 THEN (2 * prec_bp * rec_bp) // (prec_bp + rec_bp) END
            AS BIGINT) AS f1_bp
FROM m
"""

LANGID_KAPPA = f"""
WITH {_LANGID_PRED_CTE},
bp AS (SELECT pred_lang AS cls, CAST(COUNT(*) AS BIGINT) AS n_pred
       FROM pred GROUP BY 1),
bl AS (SELECT labeled_lang AS cls, CAST(COUNT(*) AS BIGINT) AS n_labeled
       FROM pred GROUP BY 1),
margins AS (
  SELECT coalesce(n_pred, 0) AS n_pred, coalesce(n_labeled, 0) AS n_labeled
  FROM bp FULL OUTER JOIN bl ON bp.cls = bl.cls
),
s AS (SELECT CAST(sum(n_pred * n_labeled) AS BIGINT) AS s FROM margins),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN labeled_lang = pred_lang THEN 1 ELSE 0 END)
              AS BIGINT) AS sum_tp
  FROM pred
)
SELECT n AS n_docs, sum_tp AS n_agree, s AS chance_term,
       CAST(floor(1000000.0 * CAST(n * sum_tp - s AS DOUBLE)
                  / CAST(n * n - s AS DOUBLE)) AS BIGINT) AS kappa_e6
FROM totals CROSS JOIN s
WHERE n * n > s
"""


# operators/profile.py:spearman_daily — doubled tie-averaged ranks via
# per-metric value histograms; Pearson over exact integer rank sums.
SPEARMAN_DAILY = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS c,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS p
  FROM events GROUP BY 1
),
hc AS (
  SELECT c, COUNT(*) AS t,
         2 * (sum(COUNT(*)) OVER (ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - COUNT(*)) + COUNT(*) + 1 AS r2_c
  FROM daily GROUP BY c
),
hp AS (
  SELECT p, COUNT(*) AS t,
         2 * (sum(COUNT(*)) OVER (ORDER BY p
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - COUNT(*)) + COUNT(*) + 1 AS r2_p
  FROM daily GROUP BY p
),
j AS (
  SELECT d.day, hc.r2_c, hp.r2_p
  FROM daily d JOIN hc ON d.c = hc.c JOIN hp ON d.p = hp.p
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(r2_c) AS BIGINT) AS sx, CAST(sum(r2_p) AS BIGINT) AS sy,
         CAST(sum(r2_c * r2_c) AS BIGINT) AS sxx,
         CAST(sum(r2_p * r2_p) AS BIGINT) AS syy,
         CAST(sum(r2_c * r2_p) AS BIGINT) AS sxy
  FROM j
)
SELECT n AS n_days,
       CAST(floor(1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                   * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
         AS rho_e6
FROM agg
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
"""


# operators/corpus.py:negative_samples — md5-uniform draws replayed,
# positives removed by NOT EXISTS.
NEGATIVE_SAMPLES = """
WITH positives AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
cat AS (SELECT CAST(max(p_partkey) AS BIGINT) AS max_pk FROM part),
draws AS (
  SELECT o.ok, s.slot,
         CAST('0x' || substr(md5('negsamp-v1:' || CAST(o.ok AS VARCHAR)
              || ':' || CAST(s.slot AS VARCHAR)), 1, 8) AS BIGINT)
           % max_pk + 1 AS neg_pk
  FROM (SELECT DISTINCT ok FROM positives) o
  CROSS JOIN cat
  CROSS JOIN (SELECT unnest(range(0, 3)) AS slot) s
)
SELECT d.ok, CAST(d.slot AS BIGINT) AS slot, d.neg_pk
FROM draws d
WHERE NOT EXISTS (
  SELECT 1 FROM positives p WHERE p.ok = d.ok AND p.pk = d.neg_pk
)
"""


# operators/corpus.py:quantile_normalize — value-at-rank decile cut
# points per source vs pooled, identical rank conventions.
QUANTILE_NORMALIZE = """
WITH base AS (
  SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
),
ph AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM base GROUP BY 1),
pr AS (
  SELECT v,
         sum(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t + 1
           AS lo,
         sum(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
         sum(t) OVER () AS n
  FROM ph
),
pooled AS (
  SELECT d.decile, v AS pooled_cut
  FROM pr CROSS JOIN (SELECT unnest(range(1, 10)) AS decile) d
  WHERE (n - 1) * d.decile * 10 // 100 + 1 BETWEEN lo AND hi
),
sh AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS t
       FROM base GROUP BY 1, 2),
sr AS (
  SELECT source, v,
         sum(t) OVER (PARTITION BY source ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t + 1
           AS lo,
         sum(t) OVER (PARTITION BY source ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
         sum(t) OVER (PARTITION BY source) AS n
  FROM sh
),
sc AS (
  SELECT source, d.decile, v AS source_cut
  FROM sr CROSS JOIN (SELECT unnest(range(1, 10)) AS decile) d
  WHERE (n - 1) * d.decile * 10 // 100 + 1 BETWEEN lo AND hi
)
SELECT sc.source, CAST(sc.decile AS BIGINT) AS decile,
       sc.source_cut, pooled.pooled_cut,
       CAST(sc.source_cut - pooled.pooled_cut AS BIGINT) AS gap
FROM sc JOIN pooled ON sc.decile = pooled.decile
"""


# operators/analytics.py:diff_in_diff — 2x2 parity-group x midpoint
# period cells, integer DiD.
DIFF_IN_DIFF = """
WITH mid AS (
  SELECT min(CAST(ts AS DATE))
         + CAST(date_diff('day', min(CAST(ts AS DATE)),
                          max(CAST(ts AS DATE))) // 2 AS INTEGER)
           AS mid_day
  FROM events
),
per AS (
  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
         CASE WHEN CAST(ts AS DATE) > mid_day THEN 1 ELSE 0 END AS post,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events CROSS JOIN mid GROUP BY 1, 2, 3
),
cells AS (
  SELECT variant, post, COUNT(*) AS n_users,
         sum(converted) AS n_conv
  FROM per GROUP BY 1, 2
),
c2 AS (
  SELECT variant, post, (10000 * n_conv) // n_users AS conv_bp
  FROM cells
)
SELECT CAST(max(CASE WHEN variant = 0 AND post = 0 THEN conv_bp END)
            AS BIGINT) AS control_pre_bp,
       CAST(max(CASE WHEN variant = 0 AND post = 1 THEN conv_bp END)
            AS BIGINT) AS control_post_bp,
       CAST(max(CASE WHEN variant = 1 AND post = 0 THEN conv_bp END)
            AS BIGINT) AS treated_pre_bp,
       CAST(max(CASE WHEN variant = 1 AND post = 1 THEN conv_bp END)
            AS BIGINT) AS treated_post_bp,
       CAST((max(CASE WHEN variant = 1 AND post = 1 THEN conv_bp END)
             - max(CASE WHEN variant = 1 AND post = 0 THEN conv_bp END))
            - (max(CASE WHEN variant = 0 AND post = 1 THEN conv_bp END)
               - max(CASE WHEN variant = 0 AND post = 0 THEN conv_bp END))
            AS BIGINT) AS did_bp
FROM c2
"""


# operators/analytics.py:date_dim — the generated spine; DuckDB
# dayofweek is Spark's minus one, weekend is {0,6} there.
DATE_DIM = """
WITH span AS (
  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
  FROM events
),
days AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS day
  FROM span
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT)
         AS epoch_day,
       CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
       CAST(date_diff('day', DATE '1970-01-01', day) // 7 AS BIGINT)
         AS epoch_week,
       CAST(month(day) AS BIGINT) AS month,
       dayofweek(day) IN (0, 6) AS is_weekend
FROM days
"""


# operators/timeseries.py:kaplan_meier — risk table + millibit-log
# survival replayed step for step.
KAPLAN_MEIER = """
WITH per_user AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS entry,
         min(CASE WHEN event_type = 'purchase'
                  THEN CAST(ts AS DATE) END) AS conv
  FROM events GROUP BY 1
),
horizon AS (SELECT max(CAST(ts AS DATE)) AS max_day FROM events),
durations AS (
  SELECT CASE WHEN conv IS NOT NULL
              THEN date_diff('day', entry, conv)
              ELSE date_diff('day', entry, max_day) END AS t,
         CASE WHEN conv IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM per_user CROSS JOIN horizon
),
tab AS (
  SELECT CAST(t AS BIGINT) AS t, COUNT(*) AS n_exit,
         CAST(sum(observed) AS BIGINT) AS d
  FROM durations GROUP BY 1
),
risk AS (
  SELECT t, d,
         sum(n_exit) OVER ()
         - (sum(n_exit) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - n_exit) AS n_at_risk
  FROM tab
),
steps AS (
  SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk, d AS n_events,
         CAST(CASE WHEN d > 0
              THEN floor(1000.0 * log2(CAST(n_at_risk - d AS DOUBLE)
                                       / CAST(n_at_risk AS DOUBLE)))
              ELSE 0 END AS BIGINT) AS step_log2_mb
  FROM risk WHERE n_at_risk > d
)
SELECT t, n_at_risk, n_events, step_log2_mb,
       CAST(sum(step_log2_mb) OVER (ORDER BY t
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS surv_log2_mb
FROM steps
"""


# operators/analytics.py:pareto_8020 — ranked cumulative revenue
# share, cross-multiplied thresholds.
PARETO_8020 = """
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk,
         sum(cents) OVER (ORDER BY cents DESC, o_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
         sum(cents) OVER () AS total_cents,
         COUNT(*) OVER () AS n_cust
  FROM per
)
SELECT CAST(max(n_cust) AS BIGINT) AS n_customers,
       CAST(max(total_cents) AS BIGINT) AS total_cents,
       CAST(min(CASE WHEN 5 * cum_cents >= 4 * total_cents THEN rk END)
            AS BIGINT) AS customers_for_80pct,
       CAST(10000 * max(CASE WHEN 5 * rk <= n_cust THEN cum_cents END)
            // max(total_cents) AS BIGINT) AS top20_share_bp
FROM ranked
"""


# operators/analytics.py:abc_classification — A to 80%, B to 95%, C
# tail; class decided on the PRE-row cumulative (cum - cents).
ABC_CLASSIFICATION = """
WITH per AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT cents,
         sum(cents) OVER (ORDER BY cents DESC, l_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cents) OVER () AS total
  FROM per
),
cls AS (
  SELECT cents, total,
         CASE WHEN 5 * (cum - cents) < 4 * total THEN 'A'
              WHEN 20 * (cum - cents) < 19 * total THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked
)
SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS class_cents,
       CAST(10000 * sum(cents) // max(total) AS BIGINT) AS share_bp
FROM cls GROUP BY 1
"""


# operators/analytics.py:price_index_laspeyres — per-part truncated
# rational terms, exact sums, one e4 division.
PRICE_INDEX_LASPEYRES = """
WITH mid AS (
  SELECT min(CAST(l_shipdate AS DATE))
         + CAST(date_diff('day', min(CAST(l_shipdate AS DATE)),
                          max(CAST(l_shipdate AS DATE))) // 2 AS INTEGER)
           AS mid_day
  FROM lineitem
),
halves AS (
  SELECT l_partkey,
         CASE WHEN CAST(l_shipdate AS DATE) > mid_day THEN 1 ELSE 0 END
           AS h,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS c,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem CROSS JOIN mid GROUP BY 1, 2
),
j AS (
  SELECT h0.l_partkey, h0.c AS c0, h0.q AS q0, h1.c AS c1, h1.q AS q1
  FROM (SELECT * FROM halves WHERE h = 0) h0
  JOIN (SELECT * FROM halves WHERE h = 1) h1
    ON h0.l_partkey = h1.l_partkey
  WHERE h0.q > 0 AND h1.q > 0
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(sum((c1 * q0) // q1) AS BIGINT) AS num,
         CAST(sum(c0) AS BIGINT) AS den
  FROM j
)
SELECT n_parts, num, den,
       CAST(floor(10000.0 * CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
            AS BIGINT) AS index_e4
FROM agg WHERE den > 0
"""


# operators/graph.py:personalized_pagerank — three unrolled PPR steps
# with the seed/TOTAL scalars from subqueries; top-100 readout.
PPR_FROM_SEED = """
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
),
nodes AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
st AS (SELECT min(id) AS seed, COUNT(*) AS n_nodes FROM nodes),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
ce AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON e.src = d.src),
r0 AS (SELECT id, CAST(CASE WHEN id = st.seed
                       THEN 1000000 * st.n_nodes ELSE 0 END AS BIGINT)
           AS rank_e6
       FROM nodes CROSS JOIN st),
c1 AS (SELECT ce.dst, SUM(r.rank_e6 // ce.outdeg) AS contrib
       FROM ce JOIN r0 r ON r.id = ce.src GROUP BY ce.dst),
r1 AS (SELECT n.id,
              CAST(CASE WHEN n.id = st.seed
                   THEN (15 * 1000000 * st.n_nodes) // 100 ELSE 0 END
                   + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT)
                  AS rank_e6
       FROM nodes n CROSS JOIN st LEFT JOIN c1 c ON n.id = c.dst),
c2 AS (SELECT ce.dst, SUM(r.rank_e6 // ce.outdeg) AS contrib
       FROM ce JOIN r1 r ON r.id = ce.src GROUP BY ce.dst),
r2 AS (SELECT n.id,
              CAST(CASE WHEN n.id = st.seed
                   THEN (15 * 1000000 * st.n_nodes) // 100 ELSE 0 END
                   + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT)
                  AS rank_e6
       FROM nodes n CROSS JOIN st LEFT JOIN c2 c ON n.id = c.dst),
c3 AS (SELECT ce.dst, SUM(r.rank_e6 // ce.outdeg) AS contrib
       FROM ce JOIN r2 r ON r.id = ce.src GROUP BY ce.dst),
r3 AS (SELECT n.id,
              CAST(CASE WHEN n.id = st.seed
                   THEN (15 * 1000000 * st.n_nodes) // 100 ELSE 0 END
                   + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT)
                  AS rank_e6
       FROM nodes n CROSS JOIN st LEFT JOIN c3 c ON n.id = c.dst)
SELECT id, rank_e6 FROM r3 WHERE rank_e6 > 0
ORDER BY rank_e6 DESC, id LIMIT 100
"""


# operators/behavior.py:decay_attribution — exact power-of-two decay
# weights, per-user integer shares, dow rollup.
DECAY_ATTRIBUTION = """
WITH p0 AS (
  SELECT user_id, min(ts) AS p0
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
touches AS (
  SELECT e.user_id, e.ts,
         CAST(1 AS BIGINT) << (30 - least(
           date_diff('day', CAST(e.ts AS DATE), CAST(p0.p0 AS DATE)),
           30)) AS w
  FROM events e JOIN p0 ON e.user_id = p0.user_id
  WHERE e.event_type = 'click' AND e.ts <= p0.p0
),
sums AS (SELECT user_id, sum(w) AS sw FROM touches GROUP BY 1)
SELECT CAST(dayofweek(t.ts) + 1 AS BIGINT) AS click_dow,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(sum((10000 * t.w) // s.sw) AS BIGINT) AS credit_bp_total
FROM touches t JOIN sums s ON t.user_id = s.user_id
GROUP BY 1
"""


# operators/text.py:doc_keywords — millibit idf, BIGINT tf*idf
# ranking, per-doc top-k.
DOC_KEYWORDS = r"""
WITH postings AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS term
    FROM documents
  ) GROUP BY 1, 2
),
df_tab AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
  FROM postings GROUP BY 1 HAVING COUNT(*) >= 2
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT p.doc_id, p.term,
         p.tf * CAST(floor(1000.0 * log2(CAST(n_docs AS DOUBLE) / df))
                     AS BIGINT) AS score_mb
  FROM postings p JOIN df_tab d ON p.term = d.term CROSS JOIN nd
),
ranked AS (
  SELECT doc_id, term, score_mb,
         CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY score_mb DESC, term) AS BIGINT) AS rk
  FROM scored WHERE score_mb > 0
)
SELECT doc_id, rk, term, score_mb FROM ranked WHERE rk <= 3
"""


# operators/sqlsurface.py:days_of_supply — partsupp derived inline (the
# oracle-side convention for the materialized table), shared floor
# division for the final metric.
DAYS_OF_SUPPLY = """
WITH partsupp AS (
    SELECT l_partkey AS ps_partkey,
           l_suppkey AS ps_suppkey,
           CAST((l_partkey * 7 + l_suppkey * 13) % 1000 + 1 AS BIGINT)
               AS ps_availqty
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
),
stock AS (
  SELECT ps_partkey, CAST(sum(ps_availqty) AS BIGINT) AS stock_qty
  FROM partsupp GROUP BY ps_partkey
),
span AS (
  SELECT CAST(count(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT)
           AS n_ship_days
  FROM lineitem
),
demand AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_quantity) AS BIGINT))
                         AS BIGINT) AS demand_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT s.ps_partkey AS partkey, s.stock_qty, d.demand_qty,
       sp.n_ship_days,
       CAST(floor(100.0 * s.stock_qty * sp.n_ship_days / d.demand_qty)
            AS BIGINT) AS dos_e2
FROM stock s JOIN demand d ON s.ps_partkey = d.l_partkey
CROSS JOIN span sp
WHERE d.demand_qty > 0
ORDER BY dos_e2 ASC, partkey
LIMIT 100
"""


# operators/behavior.py:conversion_by_session_ordinal — the 30-minute
# session walk replayed window-for-window; ordinal = running
# new-session sum.
CONVERSION_BY_SESSION_ORDINAL = """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
  FROM events
),
flagged AS (
  SELECT user_id, ts_us, event_id, p,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS ns
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, p,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ordinal
  FROM flagged
),
per AS (
  SELECT user_id, CAST(ordinal AS BIGINT) AS ordinal,
         max(p) AS converted
  FROM sess GROUP BY 1, 2
)
SELECT ordinal, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       (10000 * CAST(sum(converted) AS BIGINT)) // COUNT(*) AS conv_bp
FROM per GROUP BY 1
"""


# operators/behavior.py:segment_migration — per-half spend tertiles by
# value-at-rank cuts, full-outer user join, 4x4 matrix.
SEGMENT_MIGRATION = """
WITH mid AS (
  SELECT min(CAST(ts AS DATE))
         + CAST(date_diff('day', min(CAST(ts AS DATE)),
                          max(CAST(ts AS DATE))) // 2 AS INTEGER)
           AS mid_day
  FROM events
),
spend AS (
  SELECT user_id,
         CASE WHEN CAST(ts AS DATE) > mid_day THEN 1 ELSE 0 END AS h,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS spend
  FROM events CROSS JOIN mid
  WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
hist AS (
  SELECT h, spend AS v, COUNT(*) AS t FROM spend GROUP BY 1, 2
),
ranked AS (
  SELECT h, v,
         sum(t) OVER (PARTITION BY h ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t + 1
           AS lo,
         sum(t) OVER (PARTITION BY h ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
         sum(t) OVER (PARTITION BY h) AS n
  FROM hist
),
cuts AS (
  SELECT h,
         min(CASE WHEN q = 33 AND (n - 1) * q // 100 + 1 BETWEEN lo AND hi
                  THEN v END) AS c1,
         min(CASE WHEN q = 66 AND (n - 1) * q // 100 + 1 BETWEEN lo AND hi
                  THEN v END) AS c2
  FROM ranked CROSS JOIN (SELECT unnest([33, 66]) AS q)
  GROUP BY h
),
seg AS (
  SELECT s.user_id, s.h,
         CAST(CASE WHEN s.spend > c.c1 THEN 1 ELSE 0 END
              + CASE WHEN s.spend > c.c2 THEN 1 ELSE 0 END AS BIGINT)
           AS seg
  FROM spend s JOIN cuts c ON s.h = c.h
),
j AS (
  SELECT coalesce(a.user_id, b.user_id) AS user_id,
         coalesce(a.seg, -1) AS seg_pre,
         coalesce(b.seg, -1) AS seg_post
  FROM (SELECT user_id, seg FROM seg WHERE h = 0) a
  FULL OUTER JOIN (SELECT user_id, seg FROM seg WHERE h = 1) b
    ON a.user_id = b.user_id
)
SELECT CAST(seg_pre AS BIGINT) AS seg_pre,
       CAST(seg_post AS BIGINT) AS seg_post,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM j GROUP BY 1, 2
"""


# operators/behavior.py:stickiness_ratio — WAU via merged presence
# spans (entry/exit prefix sums); DAU/WAU in bp.
STICKINESS_RATIO = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM pairs GROUP BY 1),
flagged AS (
  SELECT user_id, day,
         lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
         lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
  FROM pairs
),
starts AS (
  SELECT day AS d, CAST(COUNT(*) AS BIGINT) AS delta
  FROM flagged
  WHERE prev_day IS NULL OR date_diff('day', prev_day, day) > 6
  GROUP BY 1
),
ends AS (
  SELECT day + 7 AS d, CAST(-COUNT(*) AS BIGINT) AS delta
  FROM flagged
  WHERE next_day IS NULL OR date_diff('day', day, next_day) > 6
  GROUP BY 1
),
delta AS (
  SELECT d, sum(delta) AS delta FROM (
    SELECT * FROM starts
    UNION ALL SELECT * FROM ends
    UNION ALL SELECT day AS d, 0 AS delta FROM dau
  ) GROUP BY 1
),
wau AS (
  SELECT d AS day,
         CAST(sum(delta) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS wau
  FROM delta
)
SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, wau.wau,
       (10000 * dau.dau) // wau.wau AS stickiness_bp
FROM dau JOIN wau ON dau.day = wau.day
WHERE wau.wau > 0
"""


# operators/profile.py:mode_per_type — histogram + smallest-value tie
# break via (count, -cents) struct max.
MODE_PER_TYPE = """
WITH hist AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
best AS (
  SELECT event_type, cents AS mode_cents, n AS mode_count,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, cents ASC) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n_distinct_values
  FROM hist
)
SELECT event_type, mode_cents, mode_count,
       CAST(n_distinct_values AS BIGINT) AS n_distinct_values
FROM best WHERE rk = 1
"""


# operators/profile.py:log_histogram — floor(log2(cents)) bins with
# exact power-of-two bounds and bp shares.
LOG_HISTOGRAM = """
WITH base AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value > 0
),
binned AS (
  SELECT event_type,
         CAST(floor(log2(CAST(cents AS DOUBLE))) AS BIGINT) AS bin
  FROM base
),
hist AS (
  SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n
  FROM binned GROUP BY 1, 2
),
totals AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS total
  FROM binned GROUP BY 1
)
SELECT h.event_type, h.bin,
       CAST(1 AS BIGINT) << CAST(h.bin AS INTEGER) AS lo_cents,
       (CAST(1 AS BIGINT) << (CAST(h.bin AS INTEGER) + 1)) - 1
         AS hi_cents,
       h.n, (10000 * h.n) // t.total AS share_bp
FROM hist h JOIN totals t ON h.event_type = t.event_type
"""


# operators/graph.py:edge_churn — per-half distinct co-part edges,
# full-outer reconciliation, Jaccard stability.
EDGE_CHURN = """
WITH mid AS (
  SELECT min(CAST(l_shipdate AS DATE))
         + CAST(date_diff('day', min(CAST(l_shipdate AS DATE)),
                          max(CAST(l_shipdate AS DATE))) // 2 AS INTEGER)
           AS mid_day
  FROM lineitem
),
li AS (
  SELECT l_orderkey AS ok, l_partkey AS p,
         CASE WHEN CAST(l_shipdate AS DATE) > mid_day THEN 1 ELSE 0 END
           AS h
  FROM lineitem CROSS JOIN mid
),
pre AS (
  SELECT DISTINCT a.p AS src, b.p AS dst
  FROM (SELECT DISTINCT ok, p FROM li WHERE h = 0) a
  JOIN (SELECT DISTINCT ok, p FROM li WHERE h = 0) b
    ON a.ok = b.ok AND a.p < b.p
),
post AS (
  SELECT DISTINCT a.p AS src, b.p AS dst
  FROM (SELECT DISTINCT ok, p FROM li WHERE h = 1) a
  JOIN (SELECT DISTINCT ok, p FROM li WHERE h = 1) b
    ON a.ok = b.ok AND a.p < b.p
),
j AS (
  SELECT CASE WHEN pre.src IS NOT NULL THEN 1 ELSE 0 END AS in_pre,
         CASE WHEN post.src IS NOT NULL THEN 1 ELSE 0 END AS in_post
  FROM pre FULL OUTER JOIN post
    ON pre.src = post.src AND pre.dst = post.dst
)
SELECT CAST(sum(in_pre * in_post) AS BIGINT) AS stable_edges,
       CAST(sum(in_pre * (1 - in_post)) AS BIGINT) AS dropped_edges,
       CAST(sum((1 - in_pre) * in_post) AS BIGINT) AS new_edges,
       CAST(COUNT(*) AS BIGINT) AS union_edges,
       (10000 * CAST(sum(in_pre * in_post) AS BIGINT)) // COUNT(*)
         AS jaccard_bp
FROM j
"""


# operators/timeseries.py:cv_slope_stability — per-user-fold integer
# OLS slopes + cross-fold spread.
CV_SLOPE_STABILITY = """
WITH daily AS (
  SELECT CAST(user_id % 5 AS BIGINT) AS fold, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
d0 AS (SELECT fold, min(day) AS d0 FROM daily GROUP BY 1),
base AS (
  SELECT d.fold,
         CAST(date_diff('day', z.d0, d.day) AS BIGINT) AS x, d.y
  FROM daily d JOIN d0 z ON d.fold = z.fold
),
g AS (
  SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM base GROUP BY 1
),
slopes AS (
  SELECT fold, n AS n_days,
         CAST(floor(1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
           AS slope_e6
  FROM g WHERE n * sxx - sx * sx > 0
)
SELECT fold, n_days, slope_e6,
       CAST(max(slope_e6) OVER () - min(slope_e6) OVER () AS BIGINT)
         AS spread_e6
FROM slopes
"""


# operators/timeseries.py:isotonic_daily_fit — the minimax identity
# replayed cell-for-cell; the unique PAVA solution without a stack.
ISOTONIC_DAILY_FIT = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, day, c, n,
         row_number() OVER w AS i,
         sum(c) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS pc,
         sum(n) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS pn
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
pairs AS (
  SELECT a.event_type, a.i AS j, b.i AS k,
         CAST(b.pc - (a.pc - a.c) AS DOUBLE)
           / CAST(b.pn - (a.pn - a.n) AS DOUBLE) AS avg
  FROM idx a JOIN idx b
    ON a.event_type = b.event_type AND a.i <= b.i
),
inner_min AS (
  SELECT c.event_type, c.i, c.day, p.j, min(p.avg) AS mavg
  FROM idx c JOIN pairs p
    ON c.event_type = p.event_type AND p.j <= c.i AND p.k >= c.i
  GROUP BY 1, 2, 3, 4
),
fit AS (
  SELECT event_type, i, day, max(mavg) AS fit
  FROM inner_min GROUP BY 1, 2, 3
)
SELECT f.event_type, CAST(f.day AS VARCHAR) AS day,
       CAST(x.c // x.n AS BIGINT) AS mean_cents,
       CAST(floor(100.0 * f.fit) AS BIGINT) AS fit_e2
FROM fit f JOIN idx x ON f.event_type = x.event_type AND f.i = x.i
"""


# operators/text.py:hapax_rate — per-source vocab/hapax/TTR.
HAPAX_RATE = r"""
WITH counts AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT source,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS term
    FROM documents
  ) GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hapax,
       CAST(sum(tf) AS BIGINT) AS n_tokens,
       (10000 * CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT))
         // COUNT(*) AS hapax_bp,
       (10000 * CAST(COUNT(*) AS BIGINT)) // CAST(sum(tf) AS BIGINT)
         AS ttr_bp
FROM counts GROUP BY 1
"""


# operators/text.py:term_burstiness — cf/df clumping, top-50.
TERM_BURSTINESS = r"""
WITH td AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS term
    FROM documents
  ) GROUP BY 1, 2
),
stats AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS cf,
         CAST(COUNT(*) AS BIGINT) AS df
  FROM td GROUP BY 1 HAVING COUNT(*) >= 3
)
SELECT term, cf, df, (100 * cf) // df AS burst_e2
FROM stats
ORDER BY burst_e2 DESC, cf DESC, term
LIMIT 50
"""


# operators/graph.py:hits_scores — two unrolled HITS rounds over the
# directed customer->supplier graph; top-100 by authority.
HITS_SCORES = """
WITH e AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
a1 AS (SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS auth
       FROM e GROUP BY 1),
h1 AS (SELECT e.src AS id, CAST(sum(a1.auth) AS BIGINT) AS hub
       FROM e JOIN a1 ON e.dst = a1.id GROUP BY 1),
a2 AS (SELECT e.dst AS id, CAST(sum(h1.hub) AS BIGINT) AS auth
       FROM e JOIN h1 ON e.src = h1.id GROUP BY 1),
h2 AS (SELECT e.src AS id, CAST(sum(a2.auth) AS BIGINT) AS hub
       FROM e JOIN a2 ON e.dst = a2.id GROUP BY 1)
SELECT n.id,
       CAST(COALESCE(a2.auth, 0) AS BIGINT) AS auth,
       CAST(COALESCE(h2.hub, 0) AS BIGINT) AS hub
FROM nodes n
LEFT JOIN a2 ON n.id = a2.id
LEFT JOIN h2 ON n.id = h2.id
ORDER BY auth DESC, hub DESC, n.id
LIMIT 100
"""


# operators/analytics.py:rapid_reorders — custkey equi key, bounded
# date residual, canonical pair order, relative amount delta.
RAPID_REORDERS = """
WITH base AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS day
  FROM orders
)
SELECT a.o_custkey, a.o_orderkey AS k1, b.o_orderkey AS k2,
       CAST(abs(date_diff('day', a.day, b.day)) AS BIGINT) AS gap_days,
       CAST((10000 * abs(a.cents - b.cents))
            // greatest(least(a.cents, b.cents), 1) AS BIGINT)
         AS amount_delta_bp
FROM base a JOIN base b ON a.o_custkey = b.o_custkey
WHERE a.o_orderkey < b.o_orderkey
  AND abs(date_diff('day', a.day, b.day)) <= 3
"""


# operators/analytics.py:return_rate_by_discount — integer percent
# bands, bp return share, cross-multiplied lift.
RETURN_RATE_BY_DISCOUNT = """
WITH base AS (
  SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem
),
bands AS (
  SELECT disc_pct, CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(sum(ret) AS BIGINT) AS n_returned
  FROM base GROUP BY 1
),
overall AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS tn, CAST(sum(ret) AS BIGINT) AS tr
  FROM base
)
SELECT disc_pct, n_lines, n_returned,
       (10000 * n_returned) // n_lines AS return_bp,
       CAST((10000 * n_returned * tn) // (n_lines * tr) AS BIGINT)
         AS lift_bp
FROM bands CROSS JOIN overall
WHERE tr > 0
"""


# operators/analytics.py:basket_entropy — per-order millibit entropy
# terms summed as integers, size-grain rollup.
BASKET_ENTROPY = """
WITH oc AS (
  SELECT l_orderkey AS ok, l_partkey % 25 AS cat,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
terms AS (
  SELECT ok, sum(c) OVER (PARTITION BY ok) AS t,
         CAST(floor(-1000.0
           * (CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY ok))
           * log2(CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY ok)))
           AS BIGINT) AS mb
  FROM oc
),
per_order AS (
  SELECT ok, CAST(max(t) AS BIGINT) AS n_items,
         CAST(COUNT(*) AS BIGINT) AS n_cats,
         CAST(sum(mb) AS BIGINT) AS entropy_mb
  FROM terms GROUP BY 1
)
SELECT n_items, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(sum(entropy_mb) // COUNT(*) AS BIGINT) AS mean_entropy_mb,
       CAST(sum(n_cats) * 100 // COUNT(*) AS BIGINT) AS mean_cats_e2
FROM per_order GROUP BY 1
"""


# operators/similarity.py:label_silhouette — member cosine to own vs
# best other centroid; the LABEL_CENTROIDS machinery with a label
# cross join.
LABEL_SILHOUETTE = """
WITH qv AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
),
elems AS (
  SELECT label, i, q[i] AS v
  FROM (SELECT label, q, unnest(generate_series(1, len(q))) AS i FROM qv)
),
cent AS (
  SELECT label AS clabel, list(s ORDER BY i) AS c
  FROM (SELECT label, i, CAST(sum(v) AS BIGINT) AS s
        FROM elems GROUP BY 1, 2)
  GROUP BY 1
),
scored AS (
  SELECT q.vec_id, q.label, c.clabel,
         CAST(floor(1000000.0 * CAST(list_sum(
                list_transform(list_zip(q.q, c.c), z -> z[1] * z[2])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(q.q, x -> x * x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(c.c, x -> x * x)) AS DOUBLE))))
          AS BIGINT) AS cos_e6
  FROM qv q CROSS JOIN cent c
),
own AS (
  SELECT vec_id, label, cos_e6 AS own_e6 FROM scored
  WHERE label = clabel
),
other AS (
  SELECT vec_id, label, max(cos_e6) AS other_e6 FROM scored
  WHERE label <> clabel GROUP BY 1, 2
),
per AS (
  SELECT o.label, o.own_e6, t.other_e6
  FROM own o JOIN other t ON o.vec_id = t.vec_id AND o.label = t.label
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(sum(own_e6 + 2000000) // COUNT(*) - 2000000 AS BIGINT)
         AS mean_own_e6,
       CAST(sum(other_e6 + 2000000) // COUNT(*) - 2000000 AS BIGINT)
         AS mean_other_e6,
       CAST((sum(own_e6 + 2000000) // COUNT(*))
            - (sum(other_e6 + 2000000) // COUNT(*)) AS BIGINT)
         AS separation_e6
FROM per GROUP BY 1
"""


# operators/profile.py:median_of_means — md5 buckets, exact bucket
# means, lower-median value-at-rank, gap vs the plain mean.
MEDIAN_OF_MEANS = """
WITH base AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
              AS BIGINT) % 32 AS b
  FROM orders
),
means AS (
  SELECT b, CAST(sum(cents) // COUNT(*) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM base GROUP BY 1
),
ranked AS (
  SELECT m, row_number() OVER (ORDER BY m, b) AS rk,
         COUNT(*) OVER () AS nb
  FROM means
),
mom AS (
  SELECT CAST(nb AS BIGINT) AS n_buckets, m AS mom_cents
  FROM ranked WHERE rk = (nb + 1) // 2
),
mean_all AS (
  SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              // COUNT(*) AS BIGINT) AS mean_cents
  FROM orders
)
SELECT n_buckets, mom_cents, mean_cents,
       CAST(mom_cents - mean_cents AS BIGINT) AS gap_cents
FROM mom CROSS JOIN mean_all
"""


# operators/profile.py:prop_ztest — pooled-variance two-proportion z,
# one shared double expression over exact counts.
PROP_ZTEST = """
WITH pu AS (
  SELECT user_id,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS np
  FROM events GROUP BY 1
),
hist AS (SELECT np, COUNT(*) AS t FROM pu GROUP BY 1),
med AS (
  SELECT min(np) AS med FROM (
    SELECT np,
           sum(t) OVER (ORDER BY np
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(t) OVER () AS tot
    FROM hist
  ) WHERE 2 * cum >= tot
),
per AS (
  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
         CASE WHEN np > med THEN 1 ELSE 0 END AS converted
  FROM pu CROSS JOIN med
),
cells AS (
  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(converted) AS BIGINT) AS k
  FROM per GROUP BY 1
),
wide AS (
  SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
         max(CASE WHEN variant = 0 THEN k END) AS k0,
         max(CASE WHEN variant = 1 THEN n END) AS n1,
         max(CASE WHEN variant = 1 THEN k END) AS k1
  FROM cells
)
SELECT n0, k0, n1, k1,
       (10000 * k0) // n0 AS conv0_bp,
       (10000 * k1) // n1 AS conv1_bp,
       CAST(floor(1000000.0 *
         ((CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0)
          / sqrt((CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                 * (1 - CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                 * (1.0 / n0 + 1.0 / n1)))) AS BIGINT) AS z_e6
FROM wide
WHERE n0 > 0 AND n1 > 0 AND k0 + k1 > 0 AND k0 + k1 < n0 + n1
"""


# operators/profile.py:neyman_allocation — N_h*S_h weights from exact
# sums (variance term in shared doubles — int64 overflow guard),
# Hamilton rounding to the exact budget.
NEYMAN_ALLOCATION = """
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2
  FROM events GROUP BY 1
),
base AS (
  SELECT event_type, n,
         CAST(floor(sqrt(greatest(0.0,
           CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))) AS BIGINT) AS w
  FROM g
),
k AS (
  SELECT event_type, n, w,
         sum(w) OVER () AS wsum
  FROM base WHERE w > 0
),
m AS (
  SELECT event_type, n, w,
         (1000 * w) // wsum AS base_alloc,
         (1000 * w) % wsum AS rem,
         1000 - sum((1000 * w) // wsum) OVER () AS deficit,
         row_number() OVER (ORDER BY (1000 * w) % wsum DESC, event_type)
           AS rk
  FROM k
)
SELECT event_type, n AS n_rows, w AS weight,
       CAST(base_alloc + CASE WHEN rk <= deficit THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM m
"""


# operators/profile.py:capture_recapture — Chapman estimator over the
# corpus halves, exact integers.
CAPTURE_RECAPTURE = """
WITH mid AS (
  SELECT min(CAST(ts AS DATE))
         + CAST(date_diff('day', min(CAST(ts AS DATE)),
                          max(CAST(ts AS DATE))) // 2 AS INTEGER)
           AS mid_day
  FROM events
),
seen AS (
  SELECT user_id,
         max(CASE WHEN CAST(ts AS DATE) <= mid_day THEN 1 ELSE 0 END)
           AS pre,
         max(CASE WHEN CAST(ts AS DATE) > mid_day THEN 1 ELSE 0 END)
           AS post
  FROM events CROSS JOIN mid GROUP BY 1
)
SELECT CAST(sum(pre) AS BIGINT) AS n1,
       CAST(sum(post) AS BIGINT) AS n2,
       CAST(sum(pre * post) AS BIGINT) AS m,
       CAST(COUNT(*) AS BIGINT) AS observed,
       CAST(((sum(pre) + 1) * (sum(post) + 1)) // (sum(pre * post) + 1)
            - 1 AS BIGINT) AS estimated
FROM seen
"""


# operators/text.py:unseen_mass — Good-Turing P0 with the
# frequency-of-frequencies head.
UNSEEN_MASS = r"""
WITH counts AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT source,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS term
    FROM documents
  ) GROUP BY 1, 2
)
SELECT source,
       CAST(sum(tf) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       CAST(sum(CASE WHEN tf = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
       CAST(sum(CASE WHEN tf = 3 THEN 1 ELSE 0 END) AS BIGINT) AS f3,
       (10000 * CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT))
         // CAST(sum(tf) AS BIGINT) AS unseen_bp
FROM counts GROUP BY 1
"""


# operators/analytics.py:mix_rate_decomposition — truncating-term
# shift-share with the interaction as the exact residual.
MIX_RATE_DECOMPOSITION = """
WITH mid AS (
  SELECT min(CAST(o_orderdate AS DATE))
         + CAST(date_diff('day', min(CAST(o_orderdate AS DATE)),
                          max(CAST(o_orderdate AS DATE))) // 2
                AS INTEGER) AS mid_day
  FROM orders
),
halves AS (
  SELECT o_orderpriority,
         CASE WHEN CAST(o_orderdate AS DATE) > mid_day THEN 1 ELSE 0 END
           AS h,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS c
  FROM orders CROSS JOIN mid GROUP BY 1, 2
),
j AS (
  SELECT h0.o_orderpriority, h0.n AS n0, h0.c AS c0,
         h1.n AS n1, h1.c AS c1
  FROM (SELECT * FROM halves WHERE h = 0) h0
  JOIN (SELECT * FROM halves WHERE h = 1) h1
    ON h0.o_orderpriority = h1.o_orderpriority
  WHERE h0.n > 0
)
SELECT o_orderpriority, n0, n1, c0, c1,
       ((n1 - n0) * c0) // n0 AS mix_cents,
       (c1 * n0 - c0 * n1) // n0 AS rate_cents,
       (c1 - c0) - (((n1 - n0) * c0) // n0)
         - ((c1 * n0 - c0 * n1) // n0) AS interaction_cents
FROM j
"""


# operators/analytics.py:repeat_purchase_curve — bounded survivor
# explode, adjacent-ratio retention.
REPEAT_PURCHASE_CURVE = """
WITH pu AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS np
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
survivors AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS users_at_n
  FROM (SELECT unnest(range(1, CAST(least(np, 10) AS INTEGER) + 1)) AS n
        FROM pu)
  GROUP BY 1
),
curve AS (
  SELECT CAST(n AS BIGINT) AS n, users_at_n,
         lead(users_at_n) OVER (ORDER BY n) AS users_at_next
  FROM survivors
)
SELECT n, users_at_n, CAST(users_at_next AS BIGINT) AS users_at_next,
       CAST(CASE WHEN users_at_next IS NOT NULL
                 THEN (10000 * users_at_next) // users_at_n END
            AS BIGINT) AS repeat_bp
FROM curve
"""


# operators/sqlsurface.py:gmroi — partsupp derived inline; margin per
# cent of inventory, bottom-100 kill list.
GMROI = """
WITH partsupp AS (
    SELECT l_partkey AS ps_partkey,
           l_suppkey AS ps_suppkey,
           CAST((l_partkey * 7 + l_suppkey * 13) % 1000 + 1 AS BIGINT)
               AS ps_availqty,
           CAST((l_partkey * 31 + l_suppkey * 17) % 90000 + 100 AS BIGINT)
               AS ps_supplycost_cents
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
),
line_cost AS (
  SELECT l.l_partkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS revenue_cents,
         CAST(sum(ps.ps_supplycost_cents
                  * CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
           AS cogs_cents
  FROM lineitem l
  JOIN partsupp ps
    ON l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
  GROUP BY 1
),
stock AS (
  SELECT ps_partkey,
         CAST(sum(ps_availqty * ps_supplycost_cents) AS BIGINT)
           AS inventory_cents
  FROM partsupp GROUP BY 1
)
SELECT lc.l_partkey AS partkey, lc.revenue_cents, lc.cogs_cents,
       s.inventory_cents,
       CAST(floor(100.0 * (lc.revenue_cents - lc.cogs_cents)
                  / s.inventory_cents) AS BIGINT) AS gmroi_e2
FROM line_cost lc JOIN stock s ON lc.l_partkey = s.ps_partkey
WHERE s.inventory_cents > 0
ORDER BY gmroi_e2 ASC, partkey
LIMIT 100
"""


# operators/analytics.py:lorenz_deciles — ascending-rank cumulative
# shares at population deciles.
LORENZ_DECILES = """
WITH per AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT row_number() OVER (ORDER BY cents ASC, o_custkey ASC) AS rk,
         sum(cents) OVER (ORDER BY cents ASC, o_custkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cents) OVER () AS total,
         COUNT(*) OVER () AS n
  FROM per
),
deciles AS (
  SELECT d.d, r.rk, r.cum, r.total
  FROM ranked r CROSS JOIN (SELECT unnest(range(1, 11)) AS d) d
  WHERE 10 * r.rk <= d.d * r.n
)
SELECT CAST(d AS BIGINT) AS decile,
       CAST(max(rk) AS BIGINT) AS n_customers,
       CAST((10000 * max(cum)) // max(total) AS BIGINT) AS cum_share_bp
FROM deciles GROUP BY 1
"""


# operators/analytics.py:open_order_aging — 90-day bands vs the
# corpus's latest order date.
OPEN_ORDER_AGING = """
WITH horizon AS (
  SELECT max(CAST(o_orderdate AS DATE)) AS max_day FROM orders
)
SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE), max_day) // 90
            AS BIGINT) AS age_band_90d,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS open_cents
FROM orders CROSS JOIN horizon
WHERE o_orderstatus = 'O'
GROUP BY 1
"""


# operators/text.py:style_profile — char-class shares via identical
# regexp_replace lengths.
STYLE_PROFILE = r"""
WITH per AS (
  SELECT source, CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text)
              - length(regexp_replace(text, '[A-Z]', '', 'g'))
              AS BIGINT) AS n_upper,
         CAST(length(text)
              - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS n_digit,
         CAST(length(text)
              - length(regexp_replace(text, '[.,;:!?''"()-]', '', 'g'))
              AS BIGINT) AS n_punct,
         CAST(length(text)
              - length(regexp_replace(text, '\s', '', 'g'))
              AS BIGINT) AS n_space
  FROM documents
)
SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars,
       (10000 * CAST(sum(n_upper) AS BIGINT))
         // CAST(sum(n_chars) AS BIGINT) AS upper_bp,
       (10000 * CAST(sum(n_digit) AS BIGINT))
         // CAST(sum(n_chars) AS BIGINT) AS digit_bp,
       (10000 * CAST(sum(n_punct) AS BIGINT))
         // CAST(sum(n_chars) AS BIGINT) AS punct_bp,
       (10000 * CAST(sum(n_space) AS BIGINT))
         // CAST(sum(n_chars) AS BIGINT) AS space_bp
FROM per GROUP BY 1
"""


# operators/analytics.py:hhi_by_nation — bp shares, integer HHI,
# effective supplier count.
HHI_BY_NATION = """
WITH rev AS (
  SELECT n.n_name, s.s_suppkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
shares AS (
  SELECT n_name,
         (10000 * cents) // sum(cents) OVER (PARTITION BY n_name)
           AS share_bp
  FROM rev
),
h AS (
  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(sum(share_bp * share_bp) // 10000 AS BIGINT) AS hhi_e4
  FROM shares GROUP BY 1
)
SELECT n_name, n_suppliers, hhi_e4,
       CAST(floor(1000000.0 / hhi_e4) AS BIGINT) AS effective_e2
FROM h WHERE hhi_e4 > 0
"""


# streaming/pipeline.py:windowed_minmax — batch tumbling mirror.
STREAM_MINMAX = """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS max_cents
FROM events GROUP BY 1, 2
"""


# operators/timeseries.py:fano_factor — dispersion of daily counts.
FANO_FACTOR = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s1,
         CAST(sum(y * y) AS BIGINT) AS s2
  FROM daily GROUP BY 1
)
SELECT event_type, n AS n_days, s1 AS n_events,
       CAST(floor(10000.0 * CAST(n * s2 - s1 * s1 AS DOUBLE)
                  / CAST(n * s1 AS DOUBLE)) AS BIGINT) AS fano_e4
FROM g WHERE s1 > 0
"""


# operators/profile.py:srm_check — 50/50 chi-square guardrail.
SRM_CHECK = """
WITH cells AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS variant,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1
),
wide AS (
  SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
         max(CASE WHEN variant = 1 THEN n END) AS n1
  FROM cells
)
SELECT n0, n1,
       CAST(floor(1000000.0 * CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                  / CAST(n0 + n1 AS DOUBLE)) AS BIGINT) AS chi2_e6,
       100 * (n0 - n1) * (n0 - n1) > 384 * (n0 + n1) AS srm_flag
FROM wide WHERE n0 + n1 > 0
"""


# operators/setops.py:order_total_reconciliation — header-detail gap
# bands by cross-multiplication.
ORDER_TOTAL_RECONCILIATION = """
WITH line_sum AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS line_cents
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS hdr,
         ls.line_cents
  FROM orders o LEFT JOIN line_sum ls ON o.o_orderkey = ls.o_orderkey
)
SELECT CASE WHEN line_cents IS NULL THEN 'no_lines'
            WHEN abs(hdr - line_cents) = 0 THEN 'exact'
            WHEN 10000 * abs(hdr - line_cents) <= 100 * hdr
              THEN 'within_1pct'
            WHEN 10000 * abs(hdr - line_cents) <= 1000 * hdr
              THEN 'within_10pct'
            ELSE 'divergent' END AS band,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(max(abs(hdr - line_cents)) AS BIGINT) AS max_gap_cents
FROM j GROUP BY 1
"""


# operators/setops.py:linenumber_integrity — 1..n contiguity classes.
LINENUMBER_INTEGRITY = """
WITH per AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS nd,
         CAST(min(l_linenumber) AS BIGINT) AS mn,
         CAST(max(l_linenumber) AS BIGINT) AS mx
  FROM lineitem GROUP BY 1
)
SELECT CASE WHEN nd < n THEN 'duplicate_linenumbers'
            WHEN mn <> 1 OR mx <> n THEN 'broken_span'
            ELSE 'ok' END AS "check",
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(sum(n) AS BIGINT) AS n_lines
FROM per GROUP BY 1
"""


# operators/timeseries.py:circadian_profile — e6-quantized unit
# vectors summed exactly; atan2/sqrt once per type.
CIRCADIAN_PROFILE = """
WITH base AS (
  SELECT event_type,
         CAST(floor(cos(CAST(epoch(ts) AS BIGINT) % 86400
                        * (2.0 * 3.141592653589793 / 86400.0))
                    * 1000000) AS BIGINT) AS cx,
         CAST(floor(sin(CAST(epoch(ts) AS BIGINT) % 86400
                        * (2.0 * 3.141592653589793 / 86400.0))
                    * 1000000) AS BIGINT) AS cy
  FROM events
),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(cx) AS BIGINT) AS sx, CAST(sum(cy) AS BIGINT) AS sy
  FROM base GROUP BY 1
)
SELECT event_type, n AS n_events,
       CAST(floor(10000.0 * sqrt(CAST(sx AS DOUBLE) * sx
                                 + CAST(sy AS DOUBLE) * sy)
                  / (1000000.0 * n)) AS BIGINT) AS r_e4,
       CAST((CAST(floor(atan2(CAST(sy AS DOUBLE), CAST(sx AS DOUBLE))
                        * (86400.0 / (2.0 * 3.141592653589793))
                        / 36.0) AS BIGINT) + 2400) % 2400
            AS BIGINT) AS mean_hour_e2
FROM g
"""


# operators/behavior.py:markov_entropy_rate — millibit conditional
# terms over bounded transition cells, exact pi weighting.
MARKOV_ENTROPY_RATE = """
WITH pairs AS (
  SELECT a, b FROM (
    SELECT event_type AS a,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS b
    FROM events
  ) WHERE b IS NOT NULL
),
cells AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS nij FROM pairs GROUP BY 1, 2
),
rows_tot AS (SELECT a, CAST(sum(nij) AS BIGINT) AS ni FROM cells GROUP BY 1),
total AS (SELECT CAST(sum(nij) AS BIGINT) AS t FROM cells)
SELECT CAST(max(t) AS BIGINT) AS n_transitions,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(sum(nij * CAST(floor(1000.0 * log2(CAST(ni AS DOUBLE)
                                / CAST(nij AS DOUBLE))) AS BIGINT))
            // max(t) AS BIGINT) AS entropy_rate_mb
FROM cells JOIN rows_tot USING (a) CROSS JOIN total
"""


# operators/timeseries.py:runs_test — sign-change walk over the daily
# move sequence, exact run counts, one shared z.
RUNS_TEST = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
moves AS (
  SELECT event_type, day, s FROM (
    SELECT event_type, day,
           CAST(sign(v - lag(v) OVER (PARTITION BY event_type
                                      ORDER BY day)) AS BIGINT) AS s
    FROM daily
  ) WHERE s IS NOT NULL AND s <> 0
),
runs AS (
  SELECT event_type, s,
         CASE WHEN s <> lag(s) OVER (PARTITION BY event_type
                                     ORDER BY day)
              THEN 1 ELSE 0 END AS chg
  FROM moves
),
g AS (
  SELECT event_type,
         CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_down,
         CAST(sum(coalesce(chg, 0)) + 1 AS BIGINT) AS r_runs
  FROM runs GROUP BY 1
)
SELECT event_type, n_up, n_down, r_runs,
       CAST(floor(1000000.0
         * (CAST(r_runs AS DOUBLE)
            - (2.0 * n_up * n_down / (n_up + n_down) + 1.0))
         / sqrt(2.0 * n_up * n_down * (2.0 * n_up * n_down
                                       - n_up - n_down)
                / ((n_up + n_down) * (n_up + n_down)
                   * (n_up + n_down - 1.0)))) AS BIGINT) AS z_e6
FROM g WHERE n_up > 0 AND n_down > 0
"""


# operators/timeseries.py:durbin_watson — scaled integral residuals,
# exact BIGINT sums, one double ratio.
DURBIN_WATSON = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy
  FROM daily GROUP BY 1
),
e AS (
  SELECT d.event_type, d.day, g.n * d.y - g.sy AS e
  FROM daily d JOIN g ON d.event_type = g.event_type
),
terms AS (
  SELECT event_type, e * e AS e2,
         CASE WHEN lag(e) OVER w IS NOT NULL
              THEN (e - lag(e) OVER w) * (e - lag(e) OVER w) END AS d2
  FROM e
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(sum(e2) AS BIGINT) AS den, CAST(sum(d2) AS BIGINT) AS num
  FROM terms GROUP BY 1
)
SELECT event_type, n_days,
       CAST(floor(10000.0 * CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
            AS BIGINT) AS dw_e4
FROM agg WHERE den > 0
"""


# operators/timeseries.py:dow_eta_squared — e6-quantized between
# terms, exact totals, one double ratio.
DOW_ETA_SQUARED = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT)
           AS y
  FROM events GROUP BY 1, 2
),
d2 AS (
  SELECT event_type, day, dayofweek(day) + 1 AS dow, y FROM daily
),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM d2 GROUP BY 1
),
grp AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(sum(y) AS BIGINT) AS sg
  FROM d2 GROUP BY 1, 2
),
agg AS (
  SELECT g.event_type, max(t.n) AS n, max(t.sy) AS sy,
         max(t.syy) AS syy,
         CAST(sum(CAST(floor(1000000.0 * CAST(g.sg AS DOUBLE) * g.sg
                             / g.ng) AS BIGINT)) AS BIGINT) AS sb_e6
  FROM grp g JOIN tot t ON g.event_type = t.event_type
  GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(floor(10000.0
         * (CAST(n AS DOUBLE) * sb_e6 / 1000000.0
            - CAST(sy AS DOUBLE) * sy)
         / (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
         AS BIGINT) AS eta2_e4
FROM agg
WHERE CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
"""


# operators/similarity.py:centroid_matrix — upper-triangle label
# centroid cosines, the silhouette family's full structure.
CENTROID_MATRIX = """
WITH qv AS (
  SELECT CAST(label AS BIGINT) AS label,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
),
elems AS (
  SELECT label, i, q[i] AS v
  FROM (SELECT label, q, unnest(generate_series(1, len(q))) AS i FROM qv)
),
cent AS (
  SELECT label, list(s ORDER BY i) AS c
  FROM (SELECT label, i, CAST(sum(v) AS BIGINT) AS s
        FROM elems GROUP BY 1, 2)
  GROUP BY 1
)
SELECT a.label AS la, b.label AS lb,
       CAST(floor(1000000.0 * CAST(list_sum(
              list_transform(list_zip(a.c, b.c), z -> z[1] * z[2]))
              AS DOUBLE)
         / (sqrt(CAST(list_sum(list_transform(a.c, x -> x * x)) AS DOUBLE))
            * sqrt(CAST(list_sum(list_transform(b.c, x -> x * x)) AS DOUBLE))))
        AS BIGINT) AS cos_e6
FROM cent a CROSS JOIN cent b
WHERE a.label < b.label
"""


# operators/sqlsurface.py:single_source_parts — supplier-count
# histogram with revenue exposure off the derived partsupp.
SINGLE_SOURCE_PARTS = """
WITH partsupp AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
),
srcs AS (
  SELECT ps_partkey, CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT)
           AS n_suppliers
  FROM partsupp GROUP BY ps_partkey
),
rev AS (
  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice * 100)
                                  AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey
)
SELECT s.n_suppliers,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(sum(coalesce(r.cents, 0)) AS BIGINT) AS revenue_cents,
       s.n_suppliers = 1 AS single_source
FROM srcs s LEFT JOIN rev r ON s.ps_partkey = r.l_partkey
GROUP BY s.n_suppliers
"""


# operators/graph.py:degree_powerlaw — Hill estimator over top-k
# degrees of the co-part graph, millibit log terms.
DEGREE_POWERLAW = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e
  ) GROUP BY 1
),
topk AS (
  SELECT v, d FROM deg ORDER BY d DESC, v LIMIT 100
),
dk AS (SELECT min(d) AS dk, CAST(COUNT(*) AS BIGINT) AS k FROM topk),
terms AS (
  SELECT dk.k,
         CAST(floor(1000.0 * log2(CAST(t.d AS DOUBLE) / dk.dk)
                    * 0.6931471805599453) AS BIGINT) AS t_mb
  FROM topk t CROSS JOIN dk
),
agg AS (SELECT k, CAST(sum(t_mb) AS BIGINT) AS s_mb FROM terms GROUP BY 1)
SELECT k,
       CAST(floor(1000.0 * (1.0 + CAST(k AS DOUBLE) * 1000.0 / s_mb))
            AS BIGINT) AS alpha_e3
FROM agg WHERE s_mb > 0
"""


# operators/analytics.py:alsobought_hitrate — first-half top-k
# training, second-half replay, deterministic ranking.
ALSOBOUGHT_HITRATE = """
WITH mid AS (
  SELECT min(CAST(l_shipdate AS DATE))
         + CAST(date_diff('day', min(CAST(l_shipdate AS DATE)),
                          max(CAST(l_shipdate AS DATE))) // 2
                AS INTEGER) AS mid_day
  FROM lineitem
),
li AS (
  SELECT l_orderkey AS ok, l_partkey AS p,
         CASE WHEN CAST(l_shipdate AS DATE) > mid_day THEN 1 ELSE 0 END
           AS h
  FROM lineitem CROSS JOIN mid
),
train_pairs AS (
  SELECT a.p, b.p AS q, COUNT(*) AS votes
  FROM (SELECT DISTINCT ok, p FROM li WHERE h = 0) a
  JOIN (SELECT DISTINCT ok, p FROM li WHERE h = 0) b
    ON a.ok = b.ok AND a.p <> b.p
  GROUP BY 1, 2
),
top AS (
  SELECT p, q FROM (
    SELECT p, q, row_number() OVER (PARTITION BY p
                                    ORDER BY votes DESC, q) AS rk
    FROM train_pairs
  ) WHERE rk <= 3
),
test AS (
  SELECT DISTINCT a.p, b.p AS q
  FROM (SELECT DISTINCT ok, p FROM li WHERE h = 1) a
  JOIN (SELECT DISTINCT ok, p FROM li WHERE h = 1) b
    ON a.ok = b.ok AND a.p <> b.p
),
counts AS (
  SELECT (SELECT CAST(COUNT(DISTINCT p) AS BIGINT) FROM top)
           AS n_trained_parts,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM test) AS n_test_pairs,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM test t
          WHERE EXISTS (SELECT 1 FROM top
                        WHERE top.p = t.p AND top.q = t.q)) AS n_hits
)
SELECT n_trained_parts, n_test_pairs, n_hits,
       (10000 * n_hits) // n_test_pairs AS hitrate_bp
FROM counts WHERE n_test_pairs > 0
"""


# operators/behavior.py:transition_latency — per-transition gap
# histogram, lower median.
TRANSITION_LATENCY = """
WITH gaps AS (
  SELECT a, b, gap_s FROM (
    SELECT event_type AS a,
           lead(event_type) OVER w AS b,
           (epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 1000000
             AS gap_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ) WHERE b IS NOT NULL
),
hist AS (
  SELECT a, b, CAST(gap_s AS BIGINT) AS gap_s,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM gaps GROUP BY 1, 2, 3
),
ranked AS (
  SELECT a, b, gap_s,
         sum(t) OVER (PARTITION BY a, b ORDER BY gap_s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(t) OVER (PARTITION BY a, b) AS n
  FROM hist
)
SELECT a, b, CAST(min(gap_s) AS BIGINT) AS median_gap_s,
       CAST(max(n) AS BIGINT) AS n_transitions
FROM ranked WHERE 2 * cum >= n
GROUP BY 1, 2
"""


# operators/profile.py:price_endings — cents-digit distribution with
# deterministic argmax.
PRICE_ENDINGS = """
WITH base AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) % 100 AS e
  FROM events
),
hist AS (
  SELECT event_type, e, CAST(COUNT(*) AS BIGINT) AS n
  FROM base GROUP BY 1, 2
),
best AS (
  SELECT event_type, e, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, e ASC) AS rk
  FROM hist
)
SELECT h.event_type,
       CAST(sum(h.n) AS BIGINT) AS n_values,
       (10000 * CAST(sum(CASE WHEN h.e = 0 THEN h.n ELSE 0 END)
                     AS BIGINT)) // CAST(sum(h.n) AS BIGINT)
         AS whole_dollar_bp,
       (10000 * CAST(sum(CASE WHEN h.e = 99 THEN h.n ELSE 0 END)
                     AS BIGINT)) // CAST(sum(h.n) AS BIGINT)
         AS charm_99_bp,
       CAST(max(CASE WHEN b.rk = 1 THEN b.n END) AS BIGINT)
         AS top_count,
       CAST(max(CASE WHEN b.rk = 1 THEN b.e END) AS BIGINT)
         AS top_ending
FROM hist h JOIN best b
  ON h.event_type = b.event_type AND h.e = b.e
GROUP BY 1
"""


# operators/analytics.py:coldstart_share — test-half parts unseen in
# training, part and revenue shares.
COLDSTART_SHARE = """
WITH mid AS (
  SELECT min(CAST(l_shipdate AS DATE))
         + CAST(date_diff('day', min(CAST(l_shipdate AS DATE)),
                          max(CAST(l_shipdate AS DATE))) // 2
                AS INTEGER) AS mid_day
  FROM lineitem
),
li AS (
  SELECT l_partkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
         CASE WHEN CAST(l_shipdate AS DATE) > mid_day THEN 1 ELSE 0 END
           AS h
  FROM lineitem CROSS JOIN mid
),
train_parts AS (SELECT DISTINCT l_partkey FROM li WHERE h = 0),
test AS (
  SELECT l_partkey, CAST(sum(c) AS BIGINT) AS cents
  FROM li WHERE h = 1 GROUP BY 1
),
flagged AS (
  SELECT CASE WHEN tp.l_partkey IS NOT NULL THEN 1 ELSE 0 END AS warm,
         t.cents
  FROM test t LEFT JOIN train_parts tp ON t.l_partkey = tp.l_partkey
)
SELECT CAST(sum(warm) AS BIGINT) AS n_warm_parts,
       CAST(sum(1 - warm) AS BIGINT) AS n_cold_parts,
       (10000 * CAST(sum(1 - warm) AS BIGINT)) // COUNT(*)
         AS cold_part_bp,
       CAST((10000 * sum(CASE WHEN warm = 0 THEN cents ELSE 0 END))
            // sum(cents) AS BIGINT) AS cold_revenue_bp
FROM flagged
"""


# operators/analytics.py:nation_assortment_overlap — Jaccard of
# purchased part sets per nation pair, top-20.
NATION_ASSORTMENT_OVERLAP = """
WITH np AS (
  SELECT DISTINCT n.n_name AS nat, l.l_partkey
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
sizes AS (SELECT nat, CAST(COUNT(*) AS BIGINT) AS sz FROM np GROUP BY 1),
inter AS (
  SELECT a.nat, b.nat AS nat2, CAST(COUNT(*) AS BIGINT) AS both
  FROM np a JOIN np b
    ON a.l_partkey = b.l_partkey AND a.nat < b.nat
  GROUP BY 1, 2
)
SELECT i.nat, i.nat2, i.both AS n_shared,
       (10000 * i.both) // (s1.sz + s2.sz - i.both) AS jaccard_bp
FROM inter i
JOIN sizes s1 ON i.nat = s1.nat
JOIN sizes s2 ON i.nat2 = s2.nat
ORDER BY jaccard_bp DESC, i.nat, i.nat2
LIMIT 20
"""


# operators/behavior.py:bounce_rate — single-event-session share per
# day, sessions dated by first event.
BOUNCE_RATE = """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, ts_us, event_id,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS ns
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, ts_us,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
per AS (
  SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events,
         min(ts_us) AS start_us
  FROM sess GROUP BY 1, 2
)
SELECT CAST(CAST(make_timestamp(start_us) AS DATE) AS VARCHAR) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounced,
       (10000 * CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                     AS BIGINT)) // COUNT(*) AS bounce_bp
FROM per GROUP BY 1
"""


# operators/analytics.py:nation_rank_shift — per-half revenue league
# table with deterministic ranks and the shift.
NATION_RANK_SHIFT = """
WITH mid AS (
  SELECT min(CAST(o_orderdate AS DATE))
         + CAST(date_diff('day', min(CAST(o_orderdate AS DATE)),
                          max(CAST(o_orderdate AS DATE))) // 2
                AS INTEGER) AS mid_day
  FROM orders
),
rev AS (
  SELECT n.n_name,
         CASE WHEN CAST(o.o_orderdate AS DATE) > mid_day THEN 1
              ELSE 0 END AS h,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders o
  CROSS JOIN mid
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
names AS (SELECT DISTINCT n_name FROM rev),
filled AS (
  SELECT nm.n_name, hs.h, coalesce(r.cents, 0) AS cents
  FROM names nm
  CROSS JOIN (SELECT unnest([0, 1]) AS h) hs
  LEFT JOIN rev r ON nm.n_name = r.n_name AND hs.h = r.h
),
ranked AS (
  SELECT n_name, h, cents,
         row_number() OVER (PARTITION BY h
                            ORDER BY cents DESC, n_name) AS rk
  FROM filled
)
SELECT a.n_name,
       CAST(a.rk AS BIGINT) AS rank_pre,
       CAST(b.rk AS BIGINT) AS rank_post,
       CAST(a.rk - b.rk AS BIGINT) AS rank_gain,
       CAST(a.cents AS BIGINT) AS cents_pre,
       CAST(b.cents AS BIGINT) AS cents_post
FROM (SELECT * FROM ranked WHERE h = 0) a
JOIN (SELECT * FROM ranked WHERE h = 1) b ON a.n_name = b.n_name
"""


# operators/text.py:quality_by_lang — quality_score rolled up by the
# label with integral e2 scores.
QUALITY_BY_LANG = f"""
WITH base AS (
  SELECT doc_id, lang, text, {_TOKS} AS w, list_distinct({_TOKS}) AS dw
  FROM documents
),
feats AS (
  SELECT doc_id, lang,
    CAST(len(w) AS BIGINT) AS n_tokens,
    CAST(length(text) AS DOUBLE)
      / CAST(greatest(len(w), 1) AS DOUBLE) AS mean_word_len,
    {_hit_ratio(_LANG_STOPWORDS["en"])} AS stopword_ratio,
    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
      / CAST(greatest(length(text), 1) AS DOUBLE) AS alpha_ratio
  FROM base
),
scored AS (
  SELECT lang,
    CAST(round(100 * (
      (CASE WHEN n_tokens >= 50 AND n_tokens <= 100000
            THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 12.0
              THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN stopword_ratio >= 0.05 THEN 0.25 ELSE 0.0 END)
      + (CASE WHEN alpha_ratio >= 0.6 THEN 0.25 ELSE 0.0 END)))
      AS BIGINT) AS q_e2
  FROM feats
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(sum(q_e2) // COUNT(*) AS BIGINT) AS mean_quality_e2,
       (10000 * CAST(sum(CASE WHEN q_e2 >= 75 THEN 1 ELSE 0 END)
                     AS BIGINT)) // COUNT(*) AS pass_bp
FROM scored GROUP BY 1
"""


# operators/timeseries.py:revenue_var — p95 of day-over-day losses by
# value-at-rank over the loss histogram.
REVENUE_VAR = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
losses AS (
  SELECT event_type, loss FROM (
    SELECT event_type,
           lag(v) OVER (PARTITION BY event_type ORDER BY day) - v
             AS loss
    FROM daily
  ) WHERE loss IS NOT NULL AND loss > 0
),
hist AS (
  SELECT event_type, CAST(loss AS BIGINT) AS loss,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM losses GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, loss,
         sum(t) OVER (PARTITION BY event_type ORDER BY loss
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t + 1
           AS lo,
         sum(t) OVER (PARTITION BY event_type ORDER BY loss
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
         sum(t) OVER (PARTITION BY event_type) AS n
  FROM hist
)
SELECT event_type, CAST(n AS BIGINT) AS n_down_days,
       loss AS var95_cents
FROM ranked
WHERE (n - 1) * 95 // 100 + 1 BETWEEN lo AND hi
"""


# operators/profile.py:brand_type_association — chi-square + Cramér's
# V over the catalog grid, zero cells added analytically.
BRAND_TYPE_ASSOCIATION = """
WITH base AS (SELECT p_brand, p_type FROM part),
cells AS (
  SELECT p_brand, p_type, CAST(COUNT(*) AS BIGINT) AS nij
  FROM base GROUP BY 1, 2
),
mb AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS ni
       FROM base GROUP BY 1),
mt AS (SELECT p_type, CAST(COUNT(*) AS BIGINT) AS nj
       FROM base GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
agg AS (
  SELECT max(n.n) AS n_parts,
         CAST(COUNT(DISTINCT c.p_brand) AS BIGINT) AS n_brands,
         CAST(COUNT(DISTINCT c.p_type) AS BIGINT) AS n_types,
         CAST(sum(CAST(floor(1000000.0
             * (CAST(nij AS DOUBLE)
                - CAST(ni AS DOUBLE) * nj / n.n)
             * (CAST(nij AS DOUBLE)
                - CAST(ni AS DOUBLE) * nj / n.n)
             / (CAST(ni AS DOUBLE) * nj / n.n)) AS BIGINT))
           + max(n.n) * 1000000
           - sum(CAST(floor(1000000.0 * CAST(ni AS DOUBLE) * nj / n.n)
                      AS BIGINT)) AS BIGINT) AS chi2_e6
  FROM cells c
  JOIN mb ON c.p_brand = mb.p_brand
  JOIN mt ON c.p_type = mt.p_type
  CROSS JOIN n
)
SELECT CAST(n_parts AS BIGINT) AS n_parts, n_brands, n_types, chi2_e6,
       CAST(floor(10000.0 * sqrt(CAST(chi2_e6 AS DOUBLE) / 1000000.0
            / (CAST(n_parts AS DOUBLE)
               * least(n_brands - 1, n_types - 1)))) AS BIGINT)
         AS cramers_v_e4
FROM agg
"""


# operators/analytics.py:customer_momentum — per-customer integer OLS
# slope signs, portfolio shares.
CUSTOMER_MOMENTUM = """
WITH base AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
),
d0 AS (SELECT o_custkey, min(day) AS d0 FROM base GROUP BY 1),
xy AS (
  SELECT b.o_custkey,
         CAST(date_diff('day', z.d0, b.day) AS BIGINT) AS x, b.y
  FROM base b JOIN d0 z ON b.o_custkey = z.o_custkey
),
g AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM xy GROUP BY 1
),
fit AS (
  SELECT CAST(sign(n * sxy - sx * sy) AS BIGINT) AS s
  FROM g WHERE n >= 3 AND n * sxx - sx * sx > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_fit,
       CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_down,
       (10000 * CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT))
         // COUNT(*) AS rising_bp,
       (10000 * CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT))
         // COUNT(*) AS falling_bp
FROM fit
"""


# operators/sqlsurface.py:group_by_all_surface — identical GROUP BY
# ALL on both engines.
GROUP_BY_ALL_SURFACE = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
GROUP BY ALL
"""


# operators/sqlsurface.py:cost_spread — partsupp derived inline,
# max/min supplier cost ratio.
COST_SPREAD = """
WITH partsupp AS (
    SELECT l_partkey AS ps_partkey,
           CAST((l_partkey * 31 + l_suppkey * 17) % 90000 + 100
                AS BIGINT) AS ps_supplycost_cents
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
),
s AS (
  SELECT ps_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(min(ps_supplycost_cents) AS BIGINT) AS min_cost,
         CAST(max(ps_supplycost_cents) AS BIGINT) AS max_cost
  FROM partsupp GROUP BY ps_partkey
  HAVING COUNT(*) >= 2
)
SELECT ps_partkey AS partkey, n_suppliers, min_cost, max_cost,
       (100 * max_cost) // min_cost AS spread_e2
FROM s
ORDER BY spread_e2 DESC, partkey
LIMIT 50
"""


# operators/behavior.py:retention_by_acquisition_dow — week-1 return
# flag by first-day weekday.
RETENTION_BY_ACQ_DOW = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
),
flagged AS (
  SELECT e.user_id, f.d0,
         max(CASE WHEN date_diff('day', f.d0, CAST(e.ts AS DATE))
                       BETWEEN 1 AND 7
                  THEN 1 ELSE 0 END) AS retained
  FROM events e JOIN first f ON e.user_id = f.user_id
  GROUP BY 1, 2
)
SELECT CAST(dayofweek(d0) + 1 AS BIGINT) AS acq_dow,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(sum(retained) AS BIGINT) AS n_retained,
       (10000 * CAST(sum(retained) AS BIGINT)) // COUNT(*)
         AS retention_bp
FROM flagged GROUP BY 1
"""


# operators/dedup.py:cross_source_dups — hash groups spanning
# sources, per source pair.
CROSS_SOURCE_DUPS = """
WITH groups AS (
  SELECT md5(substr(text, 1, 64)) AS h,
         list_sort(list_distinct(list(source))) AS srcs,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY md5(substr(text, 1, 64))
  HAVING len(list_distinct(list(source))) > 1
),
pairs AS (
  SELECT g.h, g.n_docs, a.sa, b.sb
  FROM groups g,
       LATERAL (SELECT unnest(g.srcs) AS sa) a,
       LATERAL (SELECT unnest(g.srcs) AS sb) b
  WHERE a.sa < b.sb
)
SELECT sa AS source_a, sb AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(sum(n_docs) AS BIGINT) AS n_docs_involved
FROM pairs GROUP BY 1, 2
"""


# operators/behavior.py:weekly_intensity — active-days-per-user-week
# histogram with shares.
WEEKLY_INTENSITY = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
per_week AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', day) // 7 AS wk,
         CAST(COUNT(*) AS BIGINT) AS n_active_days
  FROM days GROUP BY 1, 2
),
hist AS (
  SELECT n_active_days, CAST(COUNT(*) AS BIGINT) AS n_user_weeks
  FROM per_week GROUP BY 1
)
SELECT n_active_days, n_user_weeks,
       CAST((10000 * n_user_weeks) // sum(n_user_weeks) OVER ()
            AS BIGINT) AS share_bp
FROM hist
"""


# operators/behavior.py:reorder_latency — first-to-second order gap
# quartiles by value-at-rank.
REORDER_LATENCY = """
WITH ranked AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rk
  FROM orders
),
gaps AS (
  SELECT CAST(date_diff('day', min(day), max(day)) AS BIGINT) AS g
  FROM ranked WHERE rk <= 2
  GROUP BY o_custkey HAVING COUNT(*) = 2
),
hist AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS t FROM gaps GROUP BY 1),
r2 AS (
  SELECT g,
         sum(t) OVER (ORDER BY g
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t + 1
           AS lo,
         sum(t) OVER (ORDER BY g
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
         sum(t) OVER () AS n
  FROM hist
),
qs AS (
  SELECT g, q.q, n FROM r2
  CROSS JOIN (SELECT unnest([25, 50, 75]) AS q) q
  WHERE (n - 1) * q.q // 100 + 1 BETWEEN lo AND hi
)
SELECT CAST(max(n) AS BIGINT) AS n_repeat_customers,
       CAST(min(CASE WHEN q = 25 THEN g END) AS BIGINT) AS p25_days,
       CAST(min(CASE WHEN q = 50 THEN g END) AS BIGINT) AS p50_days,
       CAST(min(CASE WHEN q = 75 THEN g END) AS BIGINT) AS p75_days
FROM qs
"""


# operators/analytics.py:quarterly_growth — QoQ deltas with the
# sign-guarded truncating percent form.
QUARTERLY_GROWTH = """
WITH q AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(quarter(o_orderdate) AS BIGINT) AS q,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
l AS (
  SELECT y, q, n_orders, cents,
         lag(cents) OVER (ORDER BY y, q) AS prev_cents
  FROM q
)
SELECT y, q, n_orders, cents,
       CAST(prev_cents AS BIGINT) AS prev_cents,
       CAST(CASE WHEN prev_cents > 0 THEN
            CASE WHEN cents >= prev_cents
                 THEN (10000 * (cents - prev_cents)) // prev_cents
                 ELSE -((10000 * (prev_cents - cents)) // prev_cents)
            END END AS BIGINT) AS qoq_bp
FROM l
"""


# operators/analytics.py:month_seasonality — month index against the
# uniform 1/12, exact cross-multiplication.
MONTH_SEASONALITY = """
WITH m AS (
  SELECT CAST(month(o_orderdate) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
)
SELECT m, n_orders, cents,
       CAST((120000 * cents) // sum(cents) OVER () AS BIGINT)
         AS index_bp
FROM m
"""


# operators/analytics.py:yoy_monthly_growth — same-month YoY via a
# year-shifted self-join.
YOY_MONTHLY_GROWTH = """
WITH m AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
)
SELECT a.y, a.m, a.cents, b.cents AS prev_cents,
       CAST(CASE WHEN a.cents >= b.cents
            THEN (10000 * (a.cents - b.cents)) // b.cents
            ELSE -((10000 * (b.cents - a.cents)) // b.cents)
            END AS BIGINT) AS yoy_bp
FROM m a JOIN m b ON a.m = b.m AND a.y = b.y + 1
WHERE b.cents > 0
"""


# operators/analytics.py:customer_lifespan — whole-year active spans
# with shares.
CUSTOMER_LIFESPAN = """
WITH per AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(date_diff('day', min(CAST(o_orderdate AS DATE)),
                        max(CAST(o_orderdate AS DATE))) // 365
              AS BIGINT) AS span_years
  FROM orders GROUP BY 1
),
hist AS (
  SELECT span_years, CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(sum(n_orders) AS BIGINT) AS n_orders
  FROM per GROUP BY 1
)
SELECT span_years, n_customers, n_orders,
       CAST((10000 * n_customers) // sum(n_customers) OVER ()
            AS BIGINT) AS share_bp
FROM hist
"""


# operators/behavior.py:activation_depth — first-session depth bands
# vs global conversion.
ACTIVATION_DEPTH = """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
  FROM events
),
flagged AS (
  SELECT user_id, ts_us, event_id, p,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS ns
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT user_id, p,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
per_user AS (
  SELECT user_id,
         sum(CASE WHEN sid = 1 THEN 1 ELSE 0 END) AS first_depth,
         max(p) AS converted
  FROM sess GROUP BY 1
)
SELECT CASE WHEN first_depth <= 1 THEN '1'
            WHEN first_depth <= 3 THEN '2-3'
            WHEN first_depth <= 7 THEN '4-7'
            ELSE '8+' END AS depth_band,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       (10000 * CAST(sum(converted) AS BIGINT)) // COUNT(*) AS conv_bp
FROM per_user GROUP BY 1
"""


# operators/profile.py:spend_consistency — per-customer CV bands from
# exact sums (double products — overflow guard).
SPEND_CONSISTENCY = """
WITH g AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS s1,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
                  * CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS s2
  FROM orders GROUP BY 1
  HAVING COUNT(*) >= 2
     AND sum(CAST(round(o_totalprice * 100) AS BIGINT)) > 0
),
cv AS (
  SELECT CAST(floor(100.0 * sqrt(greatest(0.0,
           CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
           / CAST(s1 AS DOUBLE)) AS BIGINT) AS cv_e2
  FROM g
),
banded AS (
  SELECT CASE WHEN cv_e2 < 25 THEN 'steady'
              WHEN cv_e2 < 50 THEN 'moderate'
              WHEN cv_e2 < 100 THEN 'variable'
              ELSE 'spiky' END AS band
  FROM cv
)
SELECT band, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST((10000 * COUNT(*)) // sum(COUNT(*)) OVER () AS BIGINT)
         AS share_bp
FROM banded GROUP BY 1
"""


# operators/analytics.py:discount_by_basket_size — promo depth per
# basket band.
DISCOUNT_BY_BASKET_SIZE = """
WITH size_t AS (
  SELECT l_orderkey AS ok, CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT l.l_orderkey AS ok,
         CAST(round(l.l_discount * 10000) AS BIGINT) AS d_bp,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents,
         s.n_lines
  FROM lineitem l JOIN size_t s ON l.l_orderkey = s.ok
)
SELECT CASE WHEN n_lines <= 2 THEN '1-2'
            WHEN n_lines <= 4 THEN '3-4'
            WHEN n_lines <= 6 THEN '5-6'
            ELSE '7+' END AS basket_band,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(sum(d_bp) // COUNT(*) AS BIGINT) AS mean_discount_bp,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM j GROUP BY 1
"""


# operators/analytics.py:size_demand — units per SKU by part size.
SIZE_DEMAND = """
SELECT CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_skus,
       CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
         AS units,
       CAST((100 * sum(CAST(round(l.l_quantity) AS BIGINT)))
            // COUNT(DISTINCT l.l_partkey) AS BIGINT)
         AS units_per_sku_e2
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
"""


# operators/analytics.py:open_share_by_year — status burn-down per
# vintage.
OPEN_SHARE_BY_YEAR = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_open,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_filled,
       (10000 * CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0
                         END) AS BIGINT)) // COUNT(*) AS open_bp
FROM orders GROUP BY 1
"""


# operators/analytics.py:reorder_gap_by_cohort — per-cohort lower-
# median first-to-second gap.
REORDER_GAP_BY_COHORT = """
WITH ranked AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rk
  FROM orders
),
gaps AS (
  SELECT CAST(year(min(day)) AS BIGINT) AS cohort_y,
         CAST(date_diff('day', min(day), max(day)) AS BIGINT) AS g
  FROM ranked WHERE rk <= 2
  GROUP BY o_custkey HAVING COUNT(*) = 2
),
hist AS (
  SELECT cohort_y, g, CAST(COUNT(*) AS BIGINT) AS t
  FROM gaps GROUP BY 1, 2
),
r AS (
  SELECT cohort_y, g,
         sum(t) OVER (PARTITION BY cohort_y ORDER BY g
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(t) OVER (PARTITION BY cohort_y) AS n
  FROM hist
)
SELECT cohort_y, CAST(min(g) AS BIGINT) AS median_gap_days,
       CAST(max(n) AS BIGINT) AS n_repeat_customers
FROM r WHERE 2 * cum >= n
GROUP BY 1
"""


# operators/profile.py:error_rate_daily — per-mille rate with a
# 2x-median data-derived breach flag.
ERROR_RATE_DAILY = """
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY 1
),
d2 AS (
  SELECT *, (1000 * n_errors) // n_events AS rate_pm FROM daily
),
hist AS (SELECT rate_pm, COUNT(*) AS t FROM d2 GROUP BY 1),
med AS (
  SELECT min(rate_pm) AS med_pm FROM (
    SELECT rate_pm,
           sum(t) OVER (ORDER BY rate_pm
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(t) OVER () AS tot
    FROM hist
  ) WHERE 2 * cum >= tot
)
SELECT day, n_events, n_errors, CAST(rate_pm AS BIGINT) AS rate_pm,
       rate_pm > 2 * med_pm AS breach
FROM d2 CROSS JOIN med
"""


# operators/profile.py:segment_mix_drift — per-type revenue shares
# pre/post with the delta.
SEGMENT_MIX_DRIFT = """
WITH mid AS (
  SELECT min(CAST(ts AS DATE))
         + CAST(date_diff('day', min(CAST(ts AS DATE)),
                          max(CAST(ts AS DATE))) // 2 AS INTEGER)
           AS mid_day
  FROM events
),
rev AS (
  SELECT event_type,
         CASE WHEN CAST(ts AS DATE) > mid_day THEN 1 ELSE 0 END AS h,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events CROSS JOIN mid GROUP BY 1, 2
),
shares AS (
  SELECT event_type, h,
         CAST((10000 * cents)
              // sum(cents) OVER (PARTITION BY h) AS BIGINT)
           AS share_bp
  FROM rev
)
SELECT coalesce(a.event_type, b.event_type) AS event_type,
       CAST(coalesce(a.share_bp, 0) AS BIGINT) AS share_pre_bp,
       CAST(coalesce(b.share_bp, 0) AS BIGINT) AS share_post_bp,
       CAST(coalesce(b.share_bp, 0) - coalesce(a.share_bp, 0)
            AS BIGINT) AS drift_bp
FROM (SELECT * FROM shares WHERE h = 0) a
FULL OUTER JOIN (SELECT * FROM shares WHERE h = 1) b
  ON a.event_type = b.event_type
"""


# operators/analytics.py:lineposition_value — per-line-number means.
LINEPOSITION_VALUE = """
SELECT CAST(l_linenumber AS BIGINT) AS line_no,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
            // COUNT(*) AS BIGINT) AS mean_cents,
       CAST((100 * sum(CAST(round(l_quantity) AS BIGINT)))
            // COUNT(*) AS BIGINT) AS mean_qty_e2
FROM lineitem GROUP BY 1
"""


# operators/text.py:lang_source_matrix — contingency with within-
# source shares.
LANG_SOURCE_MATRIX = """
WITH cells AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1, 2
)
SELECT source, lang, n_docs,
       CAST((10000 * n_docs)
            // sum(n_docs) OVER (PARTITION BY source) AS BIGINT)
         AS share_bp
FROM cells
"""


# operators/analytics.py:dom_billing_cycle — day-of-month index
# against its calendar occurrence share.
DOM_BILLING_CYCLE = """
WITH per_day AS (
  SELECT CAST(day(o_orderdate) AS BIGINT) AS dom,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
span AS (
  SELECT min(CAST(o_orderdate AS DATE)) AS d0,
         max(CAST(o_orderdate AS DATE)) AS d1
  FROM orders
),
spine AS (
  SELECT CAST(day(CAST(d AS DATE)) AS BIGINT) AS dom,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
        FROM span)
  GROUP BY 1
)
SELECT p.dom, p.n_orders, s.n_days,
       CAST((10000 * p.n_orders * (SELECT sum(n_days) FROM spine))
            // ((SELECT sum(n_orders) FROM per_day) * s.n_days)
            AS BIGINT) AS index_bp
FROM per_day p JOIN spine s ON p.dom = s.dom
"""


# operators/setops.py:chars_integrity — declared-vs-measured doc
# length bands.
CHARS_INTEGRITY = """
WITH j AS (
  SELECT CAST(n_chars AS BIGINT) AS decl,
         CAST(length(text) AS BIGINT) AS meas
  FROM documents
)
SELECT CASE WHEN abs(decl - meas) = 0 THEN 'exact'
            WHEN 100 * abs(decl - meas) <= meas THEN 'within_1pct'
            WHEN 10 * abs(decl - meas) <= meas THEN 'within_10pct'
            ELSE 'divergent' END AS band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(max(abs(decl - meas)) AS BIGINT) AS max_gap_chars
FROM j GROUP BY 1
"""


# operators/text.py:token_p90_by_lang — per-language token-count
# quantiles by value-at-rank.
TOKEN_P90_BY_LANG = r"""
WITH counts AS (
  SELECT lang,
         CAST(len(list_filter(string_split_regex(text, '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
),
hist AS (
  SELECT lang, n_tok, CAST(COUNT(*) AS BIGINT) AS t
  FROM counts GROUP BY 1, 2
),
r AS (
  SELECT lang, n_tok,
         sum(t) OVER (PARTITION BY lang ORDER BY n_tok
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t + 1
           AS lo,
         sum(t) OVER (PARTITION BY lang ORDER BY n_tok
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
         sum(t) OVER (PARTITION BY lang) AS n
  FROM hist
),
qs AS (
  SELECT lang, n_tok, q.q, n FROM r
  CROSS JOIN (SELECT unnest([50, 90]) AS q) q
  WHERE (n - 1) * q.q // 100 + 1 BETWEEN lo AND hi
)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
       CAST(min(CASE WHEN q = 50 THEN n_tok END) AS BIGINT)
         AS p50_tokens,
       CAST(min(CASE WHEN q = 90 THEN n_tok END) AS BIGINT)
         AS p90_tokens
FROM qs GROUP BY 1
"""


# operators/analytics.py:weekend_uplift — value-weighted weekly
# rhythm, cross-multiplied uplift.
WEEKEND_UPLIFT = """
WITH base AS (
  SELECT event_type,
         CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6) THEN 1
              ELSE 0 END AS we,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
g AS (
  SELECT event_type,
         CAST(sum(CASE WHEN we = 1 THEN cents END) AS BIGINT) AS we_sum,
         CAST(COUNT(CASE WHEN we = 1 THEN 1 END) AS BIGINT) AS we_cnt,
         CAST(sum(CASE WHEN we = 0 THEN cents END) AS BIGINT) AS wd_sum,
         CAST(COUNT(CASE WHEN we = 0 THEN 1 END) AS BIGINT) AS wd_cnt
  FROM base GROUP BY 1
)
SELECT event_type, we_cnt AS weekend_n, wd_cnt AS weekday_n,
       we_sum // we_cnt AS weekend_mean_cents,
       wd_sum // wd_cnt AS weekday_mean_cents,
       CAST((10000 * we_sum * wd_cnt) // (wd_sum * we_cnt) - 10000
            AS BIGINT) AS uplift_bp
FROM g WHERE we_cnt > 0 AND wd_cnt > 0 AND wd_sum > 0
"""


# operators/analytics.py:supplier_dependency — top supplier share per
# nation with deterministic argmax.
SUPPLIER_DEPENDENCY = """
WITH rev AS (
  SELECT n.n_name, s.s_suppkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
shares AS (
  SELECT n_name, s_suppkey,
         CAST((10000 * cents)
              // sum(cents) OVER (PARTITION BY n_name) AS BIGINT)
           AS share_bp
  FROM rev
),
best AS (
  SELECT n_name, s_suppkey, share_bp,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY share_bp DESC, s_suppkey ASC)
           AS rk,
         COUNT(*) OVER (PARTITION BY n_name) AS n_suppliers
  FROM shares
)
SELECT n_name, CAST(n_suppliers AS BIGINT) AS n_suppliers,
       share_bp AS top_share_bp,
       CAST(s_suppkey AS BIGINT) AS top_suppkey
FROM best WHERE rk = 1
"""


# operators/analytics.py:hour_entropy — 24-cell millibit entropy per
# type.
HOUR_ENTROPY = """
WITH cells AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS nh
  FROM events GROUP BY 1, 2
),
totals AS (
  SELECT event_type, CAST(sum(nh) AS BIGINT) AS nt
  FROM cells GROUP BY 1
)
SELECT c.event_type, CAST(max(t.nt) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(sum(c.nh * CAST(floor(1000.0 * log2(CAST(t.nt AS DOUBLE)
                            / CAST(c.nh AS DOUBLE))) AS BIGINT))
            // max(t.nt) AS BIGINT) AS entropy_mb
FROM cells c JOIN totals t ON c.event_type = t.event_type
GROUP BY 1
"""


# operators/profile.py:brand_price_dispersion — per-brand price CV
# with double-product overflow guard.
BRAND_PRICE_DISPERSION = """
WITH g AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
              AS BIGINT) AS s1,
         CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)
                  * CAST(round(p_retailprice * 100) AS BIGINT))
              AS BIGINT) AS s2,
         CAST(min(CAST(round(p_retailprice * 100) AS BIGINT))
              AS BIGINT) AS min_cents,
         CAST(max(CAST(round(p_retailprice * 100) AS BIGINT))
              AS BIGINT) AS max_cents
  FROM part GROUP BY 1
  HAVING COUNT(*) >= 2
     AND sum(CAST(round(p_retailprice * 100) AS BIGINT)) > 0
)
SELECT p_brand, n AS n_parts, min_cents, max_cents,
       CAST(floor(100.0 * sqrt(greatest(0.0,
            CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
            / CAST(s1 AS DOUBLE)) AS BIGINT) AS cv_e2
FROM g
"""


# operators/behavior.py:visit_cadence — per-user median inter-session
# gap, corpus histogram.
VISIT_CADENCE = """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS ns
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
starts AS (SELECT user_id, ts_us FROM flagged WHERE ns = 1),
igaps AS (
  SELECT user_id,
         (ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                   ORDER BY ts_us)) // 3600000000
           AS gap_h
  FROM starts
),
hist AS (
  SELECT user_id, CAST(gap_h AS BIGINT) AS gap_h,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM igaps WHERE gap_h IS NOT NULL GROUP BY 1, 2
),
med AS (
  SELECT user_id, min(gap_h) AS med_h FROM (
    SELECT user_id, gap_h,
           sum(t) OVER (PARTITION BY user_id ORDER BY gap_h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(t) OVER (PARTITION BY user_id) AS n
    FROM hist
  ) WHERE 2 * cum >= n
  GROUP BY 1
)
SELECT CAST(med_h AS BIGINT) AS median_gap_hours,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST((10000 * COUNT(*)) // sum(COUNT(*)) OVER () AS BIGINT)
         AS share_bp
FROM med GROUP BY 1
"""


# operators/analytics.py:priority_value_profile — per-priority mean
# and histogram lower-median.
PRIORITY_VALUE_PROFILE = """
WITH base AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
hist AS (
  SELECT o_orderpriority, cents, CAST(COUNT(*) AS BIGINT) AS t
  FROM base GROUP BY 1, 2
),
r AS (
  SELECT o_orderpriority, cents, t,
         sum(t) OVER (PARTITION BY o_orderpriority ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(t) OVER (PARTITION BY o_orderpriority) AS n,
         sum(cents * t) OVER (PARTITION BY o_orderpriority) AS s
  FROM hist
)
SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_orders,
       CAST(max(s) // max(n) AS BIGINT) AS mean_cents,
       CAST(min(cents) AS BIGINT) AS median_cents
FROM r WHERE 2 * cum >= n
GROUP BY 1
"""
