"""SQL-entry operators — the ``spark.sql`` surface of the engine.

The reference drives everything through SQL strings over temp views
(spark_elt_emr.py:62-185); this module keeps that entry path first-class
and extends it with the SQL shapes the reference never needed: ROLLUP /
CUBE grouping sets, INTERSECT / EXCEPT, correlated EXISTS, scalar
subqueries, and multi-CTE pipelines. Catalyst plans these identically to
the DataFrame API — partial aggregates, broadcast joins, subquery
decorrelation — so there is no penalty for the SQL form.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table


def _views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals: (year, status), (year), () — one pass, partial
    aggregation per grouping set."""
    _views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
               o_orderstatus,
               CAST(grouping_id() AS BIGINT) AS gid,
               COUNT(*) AS order_cnt,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
        """
    )


def cube_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets."""
    _views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id() AS BIGINT) AS gid,
               COUNT(*) AS order_cnt
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """
    )


def intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection: users active in both halves of the event window."""
    _views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT user_id FROM events WHERE day(ts) <= 15
        INTERSECT
        SELECT user_id FROM events WHERE day(ts) > 15
        """
    )


def except_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: parts never shipped at near-max quantity with a
    deep discount (a slow-mover report)."""
    _views(spark, sf_dir, ["part", "lineitem"])
    return spark.sql(
        """
        SELECT p_partkey FROM part
        EXCEPT
        SELECT l_partkey FROM lineitem
        WHERE l_quantity >= 49 AND l_discount >= 0.08
        """
    )


def exists_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: customers holding at least one order over 400k.
    Catalyst decorrelates this into a left-semi join."""
    _views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        """
    )


def above_average_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery threshold: orders priced over 2x the global mean.
    The comparison value is rounded so both engines agree at the boundary."""
    _views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT 1.5 * round(avg(o_totalprice), 2) FROM orders)
        """
    )


def cte_monthly_top_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE pipeline (C1 parity): monthly revenue per segment, then
    each month's top segment by window rank."""
    _views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
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
    )


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (beyond ROLLUP/CUBE): per-status,
    per-priority, and grand-total aggregates in ONE pass with
    grouping_id disambiguation."""
    _views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id() AS BIGINT) AS gid,
               COUNT(*) AS order_cnt,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): 3-way join with per-side date
    filters pushed into the scans, grouped revenue, top 10. Catalyst
    broadcast-joins the filtered customer segment and keeps the final
    top-10 as TakeOrderedAndProject (no global sort)."""
    _views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(o_orderdate AS STRING) AS o_orderdate,
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
    )


def tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority order counts where a correlated
    EXISTS finds at least one line shipped after the order date (the
    slim schema's stand-in for commit<receipt). Decorrelates to a
    left-semi hash join on o_orderkey — no per-row subquery execution."""
    _views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(
        """
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
    )


def tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the 6-table join cycle
    customer-orders-lineitem-supplier-nation-region with the extra
    equi-constraint c_nationkey = s_nationkey closing the cycle.
    Catalyst broadcast-joins region/nation/supplier (tiny sides) so the
    only shuffle is the orders-lineitem hash join + the final 1-row-per-
    nation aggregate; the region/date filters prune before any join."""
    _views(spark, sf_dir, ["customer", "orders", "lineitem", "supplier",
                           "nation", "region"])
    return spark.sql(
        """
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
    )


def tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade between two
    nations — supplier nation x customer nation pairs by ship year. The
    nation dimension is joined TWICE under different roles; the
    symmetric OR predicate keeps only the two directed pairs."""
    _views(spark, sf_dir, ["supplier", "lineitem", "orders", "customer",
                           "nation"])
    return spark.sql(
        """
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
    )


def tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): revenue lost to
    returns per customer in a quarter, top 20. The lineitem returnflag
    filter and the order-date window both push into the scans; the
    final top-20 plans as TakeOrderedAndProject."""
    _views(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    return spark.sql(
        """
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
    )


def tpch_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode split, adapted: the slim schema
    has no l_shipmode so the two-class CASE pivot splits on order
    priority instead): per returnflag, how many lines belong to
    critical- vs normal-priority orders. One join + conditional
    aggregation — the canonical CASE-WHEN-inside-SUM pattern."""
    _views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1997-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


def tpch_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): share of monthly revenue from
    PROMO-type parts. The share is emitted in basis points via floor()
    (identical in both engines, unlike round-half ties) alongside the
    two rounded revenue components."""
    _views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(
        """
        SELECT round(sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END), 2) AS promo_revenue,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue,
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
    )


def tpch_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total line
    quantity clears a threshold, with the customer attached. The IN
    subquery over a grouped HAVING plans as an aggregate + left-semi
    join, NOT a per-row subquery; quantities are integral so the sum is
    emitted as an exact BIGINT."""
    _views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        """
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS STRING) AS o_orderdate,
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
    )


def tpch_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): disjunction of conjunctive
    brand/size/quantity bands. The join key is shared across all three
    arms so Catalyst runs ONE hash join on p_partkey and evaluates the
    residual OR-of-ANDs post-join; per-side prunable conjuncts
    (quantity floor, size floor) are extracted and pushed into the
    scans."""
    _views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(
        """
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
    )


def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN / NOT EXISTS null trap, pinned as a contract query:
    when the subquery column contains even one NULL, ``NOT IN`` is
    three-valued-logic false-or-unknown for EVERY outer row (count 0),
    while ``NOT EXISTS`` keeps its anti-join meaning. Spark plans the
    former as a null-aware anti join — a distinct physical operator —
    and both engines must agree on the standard's semantics."""
    _views(spark, sf_dir, ["part", "lineitem"])
    return spark.sql(
        """
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
    )


def lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:2016 / Spark 4): per nation, the
    top-3 customers by balance. Catalyst rewrites the correlated
    limit-per-row into a ranked window join — same physical plan as the
    hand-written row_number() form, so the LATERAL sugar costs nothing;
    ties break on c_custkey for engine-stable selection."""
    _views(spark, sf_dir, ["nation", "customer"])
    return spark.sql(
        """
        SELECT n_name, c_custkey, c_name, c_acctbal
        FROM nation,
        LATERAL (
          SELECT c_custkey, c_name, c_acctbal
          FROM customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 3
        )
        ORDER BY n_name, c_acctbal DESC, c_custkey
        """
    )


def tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): of all STANDARD-part
    revenue bought by EUROPE customers, what share came from NATION_5
    suppliers, per order year. Nation joins twice under different
    roles (supplier nationality vs customer region path); the share is
    floor() basis points — engine-exact at the boundary."""
    _views(spark, sf_dir, ["part", "lineitem", "orders", "customer",
                           "supplier", "nation", "region"])
    return spark.sql(
        """
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
    )


def tpch_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT join so
    customers with zero qualifying orders stay (the original filters on
    comment; the slim schema filters on urgent priority), count per
    customer, then a histogram of those counts. Two aggregations, the
    second over an already-tiny domain."""
    _views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
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
    )


def tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    keep the max-revenue supplier(s). Revenue is floored to integer
    cents BEFORE the max-comparison so the winner is decided on exact
    integers (double ulp noise cannot flip a tie cross-engine); the
    global max is a window over the 1-row-per-supplier aggregate, not
    over lineitem."""
    _views(spark, sf_dir, ["supplier", "lineitem"])
    return spark.sql(
        """
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
    )


def tpch_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lines of one
    brand whose quantity is under 20% of that part's average quantity.
    The correlated AVG subquery becomes a per-part aggregate joined
    back; the threshold test is the integer cross-multiply
    5*qty*cnt < sum(qty) (quantities are integral), so both engines
    agree exactly at the boundary."""
    _views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(
        """
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
    )


def tpch_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales opportunity): above-average-balance
    customers with NO recent orders (the slim schema has no phone, so
    the country code is a custkey residue class). Anti-join via NOT
    EXISTS (decorrelated to left-anti); the balance threshold is a
    scalar subquery rounded to cents so both engines cut identically."""
    _views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
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
    )


def tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: one tight scan — every predicate (year, discount
    band, quantity cap) pushes into the parquet scan, then a single
    global sum. The what-if revenue-change query."""
    _views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


# ---------------------------------------------------------------------------
# partsupp stand-in + the four TPC-H shapes that need it (Q2/Q11/Q16/Q20)
# and Q21 (needs commit/receipt dates). The driver's slim schema has no
# partsupp table and no l_commitdate/l_receiptdate, so both are DERIVED
# deterministically from lineitem with pure integer arithmetic — identical
# in Spark and the DuckDB oracle, and exact (no float summation-order
# hazards: costs are integer cents, quantities are integer-valued doubles
# whose sums stay exact in ieee754).
#
# Scale note: the Spark side materializes partsupp ONCE per
# (application, sf_dir) as a parquet table bucketed on ps_partkey
# (``ensure_partsupp`` below) — the deployment shape: derive once, pay
# the DISTINCT shuffle once, and every Q2/Q9/Q11/Q16/Q20 run scans the
# table (bucketed, so partkey joins against other ps_partkey-bucketed
# relations need no exchange on this side). The DuckDB oracle keeps the
# inline CTE derivation — same relation, derived per query, which is
# fine single-node at oracle scale.

PARTSUPP_CTE = """
WITH partsupp AS (
    SELECT l_partkey AS ps_partkey,
           l_suppkey AS ps_suppkey,
           CAST((l_partkey * 7 + l_suppkey * 13) % 1000 + 1 AS BIGINT)
               AS ps_availqty,
           CAST((l_partkey * 31 + l_suppkey * 17) % 90000 + 100 AS BIGINT)
               AS ps_supplycost_cents
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
)
"""

# Spark-side prefix: the same relation name, backed by the materialized
# bucketed table (registered as temp view ``partsupp_mat`` by
# ``_partsupp_view``). Bodies compose with either prefix unchanged, so
# the Spark query and the DuckDB oracle can never diverge semantically.
_PARTSUPP_MAT_CTE = """
WITH partsupp AS (SELECT * FROM partsupp_mat)
"""

_PARTSUPP_TABLES: dict[tuple[str, str], str] = {}

# Bump when the derivation formula / schema / bucket layout changes: the
# version is part of the canonical directory name, so a new code version
# never reinterprets (or deletes) files published by an old one.
_PARTSUPP_VERSION = 2


def _warehouse_path(spark: SparkSession) -> str:
    from urllib.parse import urlparse

    return urlparse(spark.conf.get("spark.sql.warehouse.dir")).path


def ensure_partsupp(
    spark: SparkSession, sf_dir: str, buckets: int = 8
) -> str:
    """Materialize the derived partsupp relation as a parquet table
    bucketed (and sorted) on ps_partkey, once per (warehouse, sf_dir,
    version); returns the catalog table name.

    This is the deployment shape PLANS.md called for: the
    DISTINCT-over-lineitem derivation runs exactly once, and the
    Q2/Q9/Q11/Q16/Q20 family scans the result. Bucketing by ps_partkey
    means a join against any other relation bucketed the same way (or a
    repartitioned build side) skips the exchange on partsupp. 8 buckets
    suit test scale; a 100 TB deployment would size buckets to
    ~executor-memory-sized splits of the distinct (partkey, suppkey)
    domain.

    Concurrency contract (the round-9 bench crash was a cross-process
    race on this path): the canonical table directory is IMMUTABLE once
    published. A process that finds it present registers an external
    bucketed table over it and never writes; a process that finds it
    absent builds the relation under an applicationId-unique scratch
    table (a path no other process can touch) and publishes it with one
    atomic ``os.rename``. Rename either installs a fully-written
    directory or fails because a concurrent builder already did — the
    loser drops its scratch copy and reuses the winner's. No shared path
    is ever deleted or rewritten, so a scan planned by any process at
    any time can always execute."""
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, buckets)
    if key in _PARTSUPP_TABLES:
        return _PARTSUPP_TABLES[key]
    for stale in [k for k in _PARTSUPP_TABLES if k[0] != app_id]:
        del _PARTSUPP_TABLES[stale]
    tag = "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))
    tbl = f"partsupp_b{buckets}_v{_PARTSUPP_VERSION}_{tag}"
    wh = _warehouse_path(spark)
    canon_dir = os.path.join(wh, tbl)
    if not os.path.isdir(canon_dir):
        _build_and_publish_partsupp(spark, sf_dir, buckets, tbl, canon_dir)
    # Register (process-local catalog) an external table over the
    # published directory, declaring the bucket spec the files were
    # written with so joins on ps_partkey skip the exchange. External:
    # DROP TABLE removes only this process's catalog row, never the
    # shared files.
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {tbl} (
            ps_partkey BIGINT, ps_suppkey BIGINT,
            ps_availqty BIGINT, ps_supplycost_cents BIGINT
        ) USING parquet
        CLUSTERED BY (ps_partkey) SORTED BY (ps_partkey)
        INTO {buckets} BUCKETS
        LOCATION '{canon_dir}'
        """
    )
    _PARTSUPP_TABLES[key] = tbl
    return tbl


def _build_and_publish_partsupp(
    spark: SparkSession,
    sf_dir: str,
    buckets: int,
    tbl: str,
    canon_dir: str,
) -> None:
    """Derive partsupp into an applicationId-scoped scratch table, then
    atomically rename its directory to the canonical location."""
    import shutil

    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .selectExpr(
            "l_partkey AS ps_partkey",
            "l_suppkey AS ps_suppkey",
            "CAST((l_partkey * 7 + l_suppkey * 13) % 1000 + 1 AS BIGINT)"
            " AS ps_availqty",
            "CAST((l_partkey * 31 + l_suppkey * 17) % 90000 + 100 AS BIGINT)"
            " AS ps_supplycost_cents",
        )
    )
    app_tag = "".join(
        c if c.isalnum() else "_" for c in spark.sparkContext.applicationId
    )
    scratch = f"{tbl}__{app_tag}"
    scratch_dir = os.path.join(_warehouse_path(spark), scratch)
    # applicationIds are process-unique, so scratch is ours alone; a
    # leftover can only be our own earlier partial write.
    spark.sql(f"DROP TABLE IF EXISTS {scratch}")
    if os.path.isdir(scratch_dir):
        shutil.rmtree(scratch_dir)
    (
        ps.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, "ps_partkey")
        .sortBy("ps_partkey")
        .saveAsTable(scratch)
    )
    try:
        os.rename(scratch_dir, canon_dir)
    except OSError as exc:
        # Expected loss mode: a concurrent process published first.
        # rename is atomic, so canon_dir is then complete; keep it,
        # discard our duplicate. But ONLY swallow the error when the
        # canonical directory actually materialized — any other rename
        # failure (EACCES, a mis-resolved warehouse path on a
        # non-file:// URI) would otherwise let ensure_partsupp register
        # an external table over a missing directory and every
        # partsupp-family query silently return zero rows (ADVICE r10).
        if not os.path.isdir(canon_dir):
            raise exc
    # Remove the scratch catalog row. If we won the rename the managed
    # location is already gone (nothing to delete); if we lost, dropping
    # the managed table cleans up our duplicate files — still a path
    # only we own.
    spark.sql(f"DROP TABLE IF EXISTS {scratch}")
    if os.path.isdir(scratch_dir):
        shutil.rmtree(scratch_dir)


def _partsupp_view(spark: SparkSession, sf_dir: str) -> None:
    """Point the ``partsupp_mat`` temp view at this sf_dir's table."""
    spark.table(ensure_partsupp(spark, sf_dir)).createOrReplaceTempView(
        "partsupp_mat"
    )

_TPCH_MIN_COST_SUPPLIER_BODY = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost_cents
FROM partsupp, supplier, nation, region, part
WHERE p_partkey = ps_partkey
  AND s_suppkey = ps_suppkey
  AND p_type = 'ECONOMY'
  AND p_size <= 25
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost_cents = (
      SELECT min(ps2.ps_supplycost_cents)
      FROM partsupp ps2, supplier s2, nation n2, region r2
      WHERE ps2.ps_partkey = part.p_partkey
        AND s2.s_suppkey = ps2.ps_suppkey
        AND s2.s_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r2.r_regionkey
        AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

TPCH_MIN_COST_SUPPLIER_SQL = PARTSUPP_CTE + _TPCH_MIN_COST_SUPPLIER_BODY


def tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): five-way join with a
    CORRELATED SCALAR SUBQUERY over an aggregate — the min supply cost
    for the part within the region. Catalyst decorrelates it into a
    per-part min aggregate joined back on (partkey, min_cost); the
    ORDER BY chain is total (supplier names are unique per row) so the
    LIMIT is deterministic."""
    _views(spark, sf_dir, ["supplier", "nation", "region", "part"])
    _partsupp_view(spark, sf_dir)
    return spark.sql(_PARTSUPP_MAT_CTE + _TPCH_MIN_COST_SUPPLIER_BODY)


_TPCH_IMPORTANT_STOCK_BODY = """
, national AS (
    SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS v
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_7', 'NATION_11', 'NATION_19')
)
SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS stock_value_cents
FROM national
GROUP BY ps_partkey
HAVING sum(v) * (SELECT count(DISTINCT ps_partkey) FROM national)
       > 3 * (SELECT sum(v) FROM national)
ORDER BY stock_value_cents DESC, ps_partkey
"""

TPCH_IMPORTANT_STOCK_SQL = PARTSUPP_CTE + _TPCH_IMPORTANT_STOCK_BODY


def tpch_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part stock value within a
    nation group, HAVING-filtered against TWO UNCORRELATED SCALAR
    SUBQUERIES over the same two-level aggregate. The threshold is
    MEAN-RELATIVE (part value > 3x the mean per-part value), so the
    selected fraction (~2.5% of parts) is scale-invariant — a fixed
    fraction-of-total cutoff (Q11's literal) selects zero rows once the
    part count outgrows the fraction's reciprocal. All-integer
    arithmetic; the cross-product sum(v)*count stays under int64 up to
    ~sf 1e4."""
    _views(spark, sf_dir, ["supplier", "nation"])
    _partsupp_view(spark, sf_dir)
    return spark.sql(_PARTSUPP_MAT_CTE + _TPCH_IMPORTANT_STOCK_BODY)


_TPCH_SUPPLIER_RELATION_BODY = """
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp, part
WHERE p_partkey = ps_partkey
  AND p_brand <> 'Brand#1'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

TPCH_SUPPLIER_RELATION_SQL = PARTSUPP_CTE + _TPCH_SUPPLIER_RELATION_BODY


def tpch_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): NOT IN over a
    subquery of excluded suppliers (null-free key, so the anti join is
    plain), brand/type/size exclusion filters, and count(DISTINCT) per
    group. The slim schema has no s_comment, so the 'customer
    complaints' exclusion stands in as low account balance."""
    _views(spark, sf_dir, ["part", "supplier"])
    _partsupp_view(spark, sf_dir)
    return spark.sql(_PARTSUPP_MAT_CTE + _TPCH_SUPPLIER_RELATION_BODY)


_TPCH_PROMO_STOCK_SUPPLIERS_BODY = """
SELECT s_name, s_acctbal
FROM supplier, nation, region
WHERE s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND s_suppkey IN (
      SELECT ps_suppkey
      FROM partsupp
      WHERE ps_partkey IN (SELECT p_partkey FROM part
                           WHERE p_name LIKE 'red%')
        AND ps_availqty > (
            SELECT 0.5 * sum(l_quantity)
            FROM lineitem
            WHERE l_partkey = ps_partkey
              AND l_suppkey = ps_suppkey))
ORDER BY s_name
"""

TPCH_PROMO_STOCK_SUPPLIERS_SQL = PARTSUPP_CTE + _TPCH_PROMO_STOCK_SUPPLIERS_BODY


def tpch_promo_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): IN-subquery nesting
    three deep — suppliers whose stock of any 'red' part exceeds half
    of what they actually shipped, where the inner threshold is a
    CORRELATED scalar aggregate on two keys. Suppliers with no
    shipments of the part compare against NULL and drop (3VL), same in
    both engines."""
    _views(spark, sf_dir, ["lineitem", "supplier", "nation", "region", "part"])
    _partsupp_view(spark, sf_dir)
    return spark.sql(_PARTSUPP_MAT_CTE + _TPCH_PROMO_STOCK_SUPPLIERS_BODY)


TPCH_WAITING_SUPPLIERS_SQL = """
WITH li AS (
    SELECT l_orderkey, l_suppkey,
           CAST((l_orderkey * 7 + l_linenumber * 3) % 20 AS BIGINT)
               AS receipt_delay,
           CAST((l_orderkey * 5 + l_linenumber * 11) % 20 AS BIGINT)
               AS commit_delay
    FROM lineitem
)
SELECT s_name, count(*) AS numwait
FROM supplier, li l1, orders, nation, region
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.receipt_delay > l1.commit_delay
  AND EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.receipt_delay > l3.commit_delay)
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'AFRICA'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def tpch_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    double-correlated EXISTS + NOT EXISTS self-join — another supplier
    contributed to the order, but no OTHER supplier was late. The slim
    schema has no commit/receipt dates, so 'late' is derived as integer
    delay offsets from the line keys (deterministic, identical in both
    engines); the comparison semantics and the semi/anti join shapes
    are exactly Q21's."""
    _views(spark, sf_dir, ["lineitem", "supplier", "orders", "nation", "region"])
    return spark.sql(TPCH_WAITING_SUPPLIERS_SQL)


_TPCH_PRODUCT_PROFIT_BODY = """
SELECT nation, o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue_r2,
       CAST(sum(ps_supplycost_cents * CAST(l_quantity AS BIGINT))
            AS BIGINT) AS supply_cost_cents
FROM (
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           l_extendedprice, l_discount, l_quantity, ps_supplycost_cents
    FROM partsupp, lineitem, supplier, part, orders, nation
    WHERE s_suppkey = l_suppkey
      AND ps_suppkey = l_suppkey
      AND ps_partkey = l_partkey
      AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey
      AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

TPCH_PRODUCT_PROFIT_SQL = PARTSUPP_CTE + _TPCH_PRODUCT_PROFIT_BODY


def tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): the six-table star with
    partsupp joined on its COMPOUND key (l_partkey, l_suppkey) — the one
    join shape the other partsupp queries don't exercise. Revenue and
    supply cost are emitted as separate columns (rounded float sum and
    exact integer cents) instead of a mixed per-row difference, keeping
    the cross-engine float discipline of oracles.py."""
    _views(spark, sf_dir, ["lineitem", "supplier", "part", "orders", "nation"])
    _partsupp_view(spark, sf_dir)
    return spark.sql(_PARTSUPP_MAT_CTE + _TPCH_PRODUCT_PROFIT_BODY)


def recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE recursive CTE (Spark 4's WITH RECURSIVE): walk the
    implicit decimal hierarchy parent(k) = k div 10 from a bounded seed
    set up to the root, emitting per node its depth and the sum of
    ancestor keys — the org-chart / BOM-explosion query shape, executed
    by the engine's own fixpoint operator instead of the driver-side
    iteration graph_bfs uses (both belong on the surface: the CTE form
    is concise and engine-planned; the iterative form gives checkpoint
    control for deep graphs).

    Recursion depth is log10(max key) — bounded by key width, not
    corpus size. The DuckDB oracle runs the same recursion (// for
    Spark's div; both floor on non-negative keys)."""
    _views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
          SELECT c_custkey AS node, c_custkey AS cur,
                 CAST(0 AS BIGINT) AS depth
          FROM customer WHERE c_custkey % 50 = 0
          UNION ALL
          SELECT node, cur div 10, depth + 1 FROM walk WHERE cur > 0
        )
        SELECT node,
               max(depth) AS depth,
               CAST(sum(cur) AS BIGINT) AS ancestor_key_sum,
               CAST(COUNT(*) AS BIGINT) AS n_steps
        FROM walk GROUP BY node
        """
    )


def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality (<=>) join semantics on the surface: ordinary
    `=` drops NULL keys silently (NULL = NULL is NULL), while <=>
    treats NULL as a joinable value — the difference between losing
    every unattributed row and reconciling them. Keys here: customers'
    segment, nulled for a deterministic slice, joined both ways against
    a distinct key list; emits per-key row counts under each semantic
    so the NULL row's fate is visible in the data.

    Catalyst plans <=> as a hash join on a null-safe key — same
    shuffle shape as `=`, no penalty. DuckDB mirrors with IS NOT
    DISTINCT FROM."""
    _views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        WITH keyed AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 7 = 0 THEN NULL
                      ELSE c_mktsegment END AS seg
          FROM customer
        ),
        segs AS (SELECT DISTINCT seg FROM keyed),
        eq AS (
          SELECT s.seg, CAST(COUNT(k.c_custkey) AS BIGINT) AS n
          FROM segs s LEFT JOIN keyed k ON s.seg = k.seg GROUP BY s.seg
        ),
        ns AS (
          SELECT s.seg, CAST(COUNT(k.c_custkey) AS BIGINT) AS n
          FROM segs s LEFT JOIN keyed k ON s.seg <=> k.seg GROUP BY s.seg
        )
        SELECT s.seg, eq.n AS n_equal_join, ns.n AS n_nullsafe_join
        FROM segs s
        JOIN eq ON s.seg <=> eq.seg
        JOIN ns ON s.seg <=> ns.seg
        """
    )


def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe expression tier: try_divide / try_cast return NULL on
    divide-by-zero and range-overflow instead of failing the job or
    silently wrapping — the semantics batch pipelines want for dirty
    numeric columns. Derives a zero-divisor and an overflowing-cast
    slice deterministically from orders and counts each NULL class.

    DuckDB mirrors NULL-on-zero with NULLIF and range checks with
    TRY_CAST; all outputs are exact counts."""
    _views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        WITH base AS (
          SELECT o_orderkey AS k,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                 CAST(o_orderkey % 5 AS BIGINT) AS div5
          FROM orders
        ),
        derived AS (
          SELECT k, cents,
                 try_divide(cents, div5) AS per_bucket,
                 try_cast(cents * 1000000 AS INT) AS narrow
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
    )


def bag_setops(orders: DataFrame) -> DataFrame:
    """Multiset INTERSECT ALL / EXCEPT ALL — the bag-semantics half of
    the set-operator surface (the DISTINCT forms elsewhere in this
    module collapse duplicates; billing-style reconciliations need
    multiplicities kept). Bag A = custkeys of open orders, bag B =
    custkeys of urgent orders; ``intersectAll`` keeps min(multA,
    multB) copies per key, ``exceptAll`` keeps multA - multB. Both
    results are tagged, unioned, and re-aggregated to (op, custkey,
    multiplicity) so the duplicate-preserving semantics are directly
    visible in the hash.

    Scale: Spark plans both as a single aggregate computing per-key
    counts on each side then replicating rows — one shuffle per
    operator on the key, no row explosion beyond the surviving
    multiplicities."""
    a = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    both = a.intersectAll(b).withColumn("op", F.lit("intersect_all"))
    only_a = a.exceptAll(b).withColumn("op", F.lit("except_all"))
    return (
        both.unionByName(only_a)
        .groupBy("op", "custkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )


def days_of_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days-of-supply per part: on-hand stock (summed ps_availqty over
    suppliers, from the bucketed materialized partsupp) against the
    part's observed daily shipment rate — the inventory-planning
    number ("at current demand, stock lasts N days"). Demand rate =
    shipped quantity / observed ship-day count (corpus-derived, so
    the metric scales with the data).

    dos_e2 = floor(100 * stock * n_ship_days / demand_qty) — one
    shared IEEE floor-division at the end, everything else exact
    BIGINT. Two part-keyed aggregates (stock side is exchange-free on
    the bucketed table), one 1-row ship-day stat, top-100 readout by
    scarcity (ascending days of supply — the reorder list).
    """
    _views(spark, sf_dir, ["lineitem"])
    _partsupp_view(spark, sf_dir)
    return spark.sql(
        _PARTSUPP_MAT_CTE
        + """
, stock AS (
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
    )


def gmroi(spark: SparkSession, sf_dir: str, top_k: int = 100) -> DataFrame:
    """GMROI per part — gross margin return on inventory investment,
    the merchandising yes/no for keeping a SKU: margin earned per
    cent tied up in stock. Margin = revenue minus cost of goods
    (supply cost x shipped quantity, from the bucketed materialized
    partsupp's per-supplier costs joined at line grain); inventory
    investment = stock x mean supply cost. gmroi_e2 = one shared
    floor-division at the end; every sum is exact BIGINT cents.

    Line-grain join is (partkey, suppkey)-keyed against the bucketed
    table (exchange-free on the partsupp side); two part-grain
    aggregates; bottom-k by GMROI is the kill list
    (TakeOrderedAndProject).
    """
    _views(spark, sf_dir, ["lineitem"])
    _partsupp_view(spark, sf_dir)
    return spark.sql(
        _PARTSUPP_MAT_CTE
        + f"""
, line_cost AS (
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
LIMIT {top_k}
"""
    )


def single_source_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source supply risk: parts bucketed by how many distinct
    suppliers actually stock them (from the materialized partsupp) —
    the procurement risk register's first column (a one-supplier part
    is a production stoppage waiting for a strike). Emits the
    supplier-count histogram with revenue exposure (the single-source
    bucket's revenue is the number that makes the meeting).

    Exchange-free scan of the bucketed partsupp + one revenue join.
    """
    _views(spark, sf_dir, ["lineitem"])
    _partsupp_view(spark, sf_dir)
    return spark.sql(
        _PARTSUPP_MAT_CTE
        + """
, srcs AS (
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
    )


def group_by_all_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the modern SQL ergonomic both engines support:
    every non-aggregate select item becomes a grouping key, so the
    query can't silently drift when a column is added to the
    projection (the classic copy-paste GROUP BY bug). Semantically
    identical to listing the keys; Catalyst plans the same
    aggregate."""
    _views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        GROUP BY ALL
        """
    )


def cost_spread(spark: SparkSession, sf_dir: str, top_k: int = 50) -> DataFrame:
    """Supplier cost dispersion per part off the bucketed partsupp:
    max/min supply-cost ratio in e2 — the negotiation-opportunity
    list (a part whose suppliers quote 5x apart has a procurement
    problem or an arbitrage). Exchange-free scan; top-k by spread
    with a total order."""
    _partsupp_view(spark, sf_dir)
    return spark.sql(
        _PARTSUPP_MAT_CTE
        + f"""
, s AS (
  SELECT ps_partkey,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(min(ps_supplycost_cents) AS BIGINT) AS min_cost,
         CAST(max(ps_supplycost_cents) AS BIGINT) AS max_cost
  FROM partsupp GROUP BY ps_partkey
  HAVING COUNT(*) >= 2
)
SELECT ps_partkey AS partkey, n_suppliers, min_cost, max_cost,
       (100 * max_cost) div min_cost AS spread_e2
FROM s
ORDER BY spread_e2 DESC, partkey
LIMIT {top_k}
"""
    )
