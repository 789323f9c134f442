"""Extended TPC-H-shaped SQL suite (SURVEY.md §2.1 S10 widened).

The reference's SQL surface (generate-asset.scala:333,338) is a string
entry point into the same engine as the DSL; this module stresses the
Catalyst plan shapes a migrating analytics user relies on beyond the
shapes in ``sql_interface.py``: join reordering over 6 tables, nation
self-join pair disjunction, conditional market-share ratios, HAVING over
a scalar subquery, IN-list conditional aggregation, outer-join histogram
(double aggregation), CTE + MAX scalar subquery, correlated scalar MAX,
disjunctive multi-column pushdown, NOT-EXISTS anti join with a scalar
average threshold, and a combined EXISTS + NOT-EXISTS (semi + anti).

Every query is written once in dialect-portable form under the repo's
fixed-point money discipline (functions/fixedpoint.py): sums are exact
BIGINT totals of 1e-4-scaled units, ratios/averages are HALF_UP integer
cross-multiplications, so the DuckDB oracle is the identical text modulo
the integer-division operator and DuckDB's HUGEINT→BIGINT casts.

At 100 TB: these are pure Catalyst plans — no UDFs, no collects. The
dimension sides (nation/region/part/supplier) broadcast; fact-fact
correlations (EXISTS/NOT EXISTS on lineitem) plan as sort-merge
semi/anti joins on l_orderkey; disjunctive predicates stay in the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.functions.fixedpoint import round_div_expr
from demo_etl_spark.io import read_star_table

# exact 1e-4-unit revenue per line: extendedprice/discount are 2-dec
# exact, so price*(1-disc) is an exact multiple of 1e-4 and ROUND(x*1e4)
# recovers the exact integer in both engines.
_FX = "TRY_CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000, 0) AS BIGINT)"


def _sum_fx(dialect: str, expr: str = _FX) -> str:
    s = f"SUM({expr})"
    return f"CAST({s} AS BIGINT)" if dialect == "duckdb" else s


# --- Q5-shaped: regional supplier volume -------------------------------
# Six-table join where the customer and supplier must share a nation —
# the canonical join-reordering test. region/nation broadcast; Catalyst
# pushes r_name into the region scan and prunes everything but the keys.
def _regional_supplier_volume_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    return f"""
SELECT n_name,
       {rd(_sum_fx(dialect), "10000", 2)} AS revenue,
       COUNT(*) AS line_count
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
GROUP BY n_name
"""


# --- Q7-shaped: trade volume between a nation pair ---------------------
# nation joined twice (supplier side and customer side) with a
# symmetric pair disjunction; per-year rollup of an exact revenue sum.
def _nation_trade_volume_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    total = "SUM(fx_rev)"
    if dialect == "duckdb":
        total = f"CAST({total} AS BIGINT)"
    return f"""
SELECT supp_nation, cust_nation, ship_year,
       {rd(total, "10000", 2)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ship_year,
         {_FX} AS fx_rev
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, ship_year
"""


# --- Q8-shaped: one nation's market share inside a region --------------
# Conditional-share ratio per year: numerator and denominator are exact
# fixed-point sums, the share an exact HALF_UP fraction at scale 6.
def _nation_market_share_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    part = "SUM(CASE WHEN supp_nation = 'NATION_3' THEN fx_rev ELSE 0 END)"
    total = "SUM(fx_rev)"
    if dialect == "duckdb":
        part = f"CAST({part} AS BIGINT)"
        total = f"CAST({total} AS BIGINT)"
    return f"""
SELECT order_year,
       {rd(part, total, 6)} AS market_share,
       {rd(total, "10000", 2)} AS region_revenue
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
         n2.n_name AS supp_nation,
         {_FX} AS fx_rev
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
) all_sales
GROUP BY order_year
"""


# --- Q9-shaped: product-line profit by supplier nation and year --------
# LIKE-filtered part dim (pushed to the scan), profit = revenue minus a
# retail-cost proxy (the star schema has no partsupp table; reference
# data model has no supplycost either). Both terms are 1e-4-exact.
def _product_profit_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    profit_fx = ("TRY_CAST(ROUND((l_extendedprice * (1 - l_discount) "
                 "- p_retailprice * l_quantity) * 10000, 0) AS BIGINT)")
    total = f"SUM({profit_fx})"
    if dialect == "duckdb":
        total = f"CAST({total} AS BIGINT)"
    return f"""
SELECT n_name,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
       {rd(total, "10000", 2)} AS profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
"""


# --- Q11-shaped: parts above a share-of-total revenue threshold --------
# HAVING compares a grouped sum against a scalar subquery over the same
# fact. The threshold is 1.5× the MEAN per-part share so selectivity is
# SF-independent (a fixed 1/N share is all-rows at small part counts and
# empty at large ones). total/nparts is BIGINT/BIGINT → the same IEEE
# DOUBLE division in both engines (exact below 2^53 ≈ sf10; above that
# still deterministic — both engines run the identical float ops).
def _important_parts_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    total = f"SUM({_FX})"
    if dialect == "duckdb":
        total = f"CAST({total} AS BIGINT)"
    return f"""
SELECT l_partkey,
       {rd(_sum_fx(dialect), "10000", 2)} AS part_revenue
FROM lineitem
GROUP BY l_partkey
HAVING SUM({_FX}) > (
  SELECT 1.5 * ({total} / COUNT(DISTINCT l_partkey)) FROM lineitem)
"""


# --- Q12-shaped: priority class split per line status ------------------
# IN-list conditional counts over the orders⋈lineitem join (the data
# model has no shipmode column; order priority plays its role).
def _priority_shipping_split_sql(dialect: str) -> str:
    hi = ("SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
          "THEN 1 ELSE 0 END)")
    lo = ("SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
          "THEN 1 ELSE 0 END)")
    return f"""
SELECT l_linestatus,
       CAST({hi} AS BIGINT) AS high_priority_lines,
       CAST({lo} AS BIGINT) AS low_priority_lines
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
GROUP BY l_linestatus
"""


# --- Q13-shaped: customer order-count histogram ------------------------
# LEFT OUTER join with an extra join-side predicate, then a second
# aggregation over the first — customers with zero qualifying orders
# survive as order_count = 0 (the distribution's head).
def _customer_order_distribution_sql(dialect: str) -> str:
    return """
SELECT order_count, COUNT(*) AS customer_count
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS order_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
       AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) per_customer
GROUP BY order_count
"""


# --- Q15-shaped: top supplier(s) by quarterly revenue ------------------
# CTE reused twice: once as the join side, once under a MAX scalar
# subquery. Exact integer revenue makes the "= MAX" predicate engine-
# portable (float revenue would make the top tie-break fragile).
def _top_supplier_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    return f"""
WITH supplier_revenue AS (
  SELECT l_suppkey AS supplier_no,
         {_sum_fx(dialect)} AS total_fx
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '2000-07-01 00:00:00'
    AND l_shipdate < TIMESTAMP '2000-10-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       {rd("total_fx", "10000", 2)} AS total_revenue
FROM supplier
JOIN supplier_revenue ON s_suppkey = supplier_no
WHERE total_fx = (SELECT MAX(total_fx) FROM supplier_revenue)
"""


# --- Q2-shaped: correlated scalar MAX ----------------------------------
# Each order's final shipment line(s): the classic correlated-scalar
# shape (Q2's MIN supplycost), planned by Catalyst as an aggregate +
# equi-join on the correlation key, not a per-row subquery execution.
def _last_shipment_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    return f"""
SELECT l_orderkey, l_linenumber,
       CAST(l_shipdate AS DATE) AS final_ship_date,
       {rd(_FX, "10000", 2)} AS line_revenue
FROM lineitem l
WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
  AND l_shipdate = (SELECT MAX(l2.l_shipdate) FROM lineitem l2
                    WHERE l2.l_orderkey = l.l_orderkey)
"""


# --- Q19-shaped: disjunctive multi-column predicate --------------------
# OR of brand/size/quantity conjunct groups — tests that the disjunction
# stays a single scan-side filter (no union-of-scans blowup) while the
# common p_partkey equi-join still plans hash/broadcast.
def _disjunctive_revenue_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    return f"""
SELECT {rd(_sum_fx(dialect), "10000", 2)} AS revenue,
       COUNT(*) AS line_count
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 40)
"""


# --- Q22-shaped: idle high-balance customers ---------------------------
# Scalar-average threshold (exact: cents cross-division is the same
# IEEE op in both engines on exactly-representable operands) plus a
# date-restricted NOT EXISTS — Catalyst plans a left-anti join against
# the filtered orders side.
def _idle_customers_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    cents = "TRY_CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)"
    cents2 = "TRY_CAST(ROUND(c2.c_acctbal * 100, 0) AS BIGINT)"
    total = f"SUM({cents})"
    if dialect == "duckdb":
        total = f"CAST({total} AS BIGINT)"
    return f"""
SELECT c_mktsegment,
       COUNT(*) AS cust_count,
       {rd(total, "100", 2)} AS total_acctbal
FROM customer c
WHERE {cents} > (
        SELECT CAST(SUM({cents2}) AS BIGINT) / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
GROUP BY c_mktsegment
"""


# --- Q21-shaped: suppliers who alone shipped late ----------------------
# Semi + anti in one query: the line must belong to a multi-supplier
# order (EXISTS) where NO other supplier also shipped late (NOT EXISTS).
# Both correlations carry an l_orderkey equi-predicate, so Catalyst
# plans sort-merge semi/anti joins, not nested loops.
def _waiting_suppliers_sql(dialect: str) -> str:
    return """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
"""


def _register_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        read_star_table(spark, sf_dir, t).createOrReplaceTempView(t)


def _builder(sql_fn, *tables: str):
    def build(spark: SparkSession, sf_dir: str,
              ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
        _register_views(spark, sf_dir, *tables)
        return spark.sql(sql_fn("spark"))
    return build


build_regional_supplier_volume = _builder(
    _regional_supplier_volume_sql,
    "customer", "orders", "lineitem", "supplier", "nation", "region")
build_nation_trade_volume = _builder(
    _nation_trade_volume_sql,
    "supplier", "lineitem", "orders", "customer", "nation")
build_nation_market_share = _builder(
    _nation_market_share_sql,
    "lineitem", "orders", "customer", "nation", "region", "supplier")
build_product_profit = _builder(
    _product_profit_sql, "lineitem", "part", "supplier", "nation", "orders")
build_important_parts = _builder(_important_parts_sql, "lineitem")
build_priority_shipping_split = _builder(
    _priority_shipping_split_sql, "orders", "lineitem")
build_customer_order_distribution = _builder(
    _customer_order_distribution_sql, "customer", "orders")
build_top_supplier = _builder(_top_supplier_sql, "supplier", "lineitem")
build_last_shipment = _builder(_last_shipment_sql, "lineitem")
build_disjunctive_revenue = _builder(
    _disjunctive_revenue_sql, "lineitem", "part")
build_idle_customers = _builder(_idle_customers_sql, "customer", "orders")
build_waiting_suppliers = _builder(
    _waiting_suppliers_sql, "supplier", "lineitem", "orders")


ORACLE_SQL_REGIONAL_SUPPLIER_VOLUME = _regional_supplier_volume_sql("duckdb")
ORACLE_SQL_NATION_TRADE_VOLUME = _nation_trade_volume_sql("duckdb")
ORACLE_SQL_NATION_MARKET_SHARE = _nation_market_share_sql("duckdb")
ORACLE_SQL_PRODUCT_PROFIT = _product_profit_sql("duckdb")
ORACLE_SQL_IMPORTANT_PARTS = _important_parts_sql("duckdb")
ORACLE_SQL_PRIORITY_SHIPPING_SPLIT = _priority_shipping_split_sql("duckdb")
ORACLE_SQL_CUSTOMER_ORDER_DISTRIBUTION = _customer_order_distribution_sql("duckdb")
ORACLE_SQL_TOP_SUPPLIER = _top_supplier_sql("duckdb")
ORACLE_SQL_LAST_SHIPMENT = _last_shipment_sql("duckdb")
ORACLE_SQL_DISJUNCTIVE_REVENUE = _disjunctive_revenue_sql("duckdb")
ORACLE_SQL_IDLE_CUSTOMERS = _idle_customers_sql("duckdb")
ORACLE_SQL_WAITING_SUPPLIERS = _waiting_suppliers_sql("duckdb")


# --- Q16-shaped: supplier variety per part attribute -------------------
# NOT IN (subquery) is its own plan family — the null-aware anti join —
# distinct from NOT EXISTS (plain anti). s_suppkey is non-null so the
# null-aware semantics are engine-portable; the grouped exact
# countDistinct is the A5 family over a 3-attribute key.
def _part_supplier_variety_sql(dialect: str) -> str:
    return """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#11'
  AND p_type NOT IN ('PROMO', 'ECONOMY')
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


build_part_supplier_variety = _builder(
    _part_supplier_variety_sql, "lineitem", "part", "supplier")

ORACLE_SQL_PART_SUPPLIER_VARIETY = _part_supplier_variety_sql("duckdb")


# --- Q17-shaped: small-quantity lines vs the per-part average ----------
# Correlated scalar AGGREGATE subqueries (COUNT and SUM over the same
# correlation key) de-correlated by Catalyst into one aggregate + join.
# The "quantity < 0.2 × avg" predicate is cross-multiplied into pure
# BIGINT space (5·q·cnt < sum), so the threshold is exact in both
# engines — no float average at all.
def _small_quantity_revenue_sql(dialect: str) -> str:
    rd = lambda n, d, s: round_div_expr(n, d, s, dialect)  # noqa: E731
    return f"""
SELECT {rd(_sum_fx(dialect), "70000", 2)} AS avg_weekly_revenue,
       COUNT(*) AS line_count
FROM lineitem l
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND 5 * CAST(l_quantity AS BIGINT) * (
        SELECT COUNT(*) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
      < (SELECT SUM(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
         WHERE l2.l_partkey = l.l_partkey)
"""


# --- Q20-shaped: high-volume shippers of a part family -----------------
# Nested IN chains: part-family membership feeds a grouped HAVING whose
# survivors feed the outer IN — two stacked left-semi joins, the shape
# that degenerates into O(n²) subquery re-execution on engines without
# subquery de-correlation.
def _bolt_volume_suppliers_sql(dialect: str) -> str:
    return """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
    AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 100
)
"""


build_small_quantity_revenue = _builder(
    _small_quantity_revenue_sql, "lineitem", "part")
build_bolt_volume_suppliers = _builder(
    _bolt_volume_suppliers_sql, "supplier", "lineitem", "part")

ORACLE_SQL_SMALL_QUANTITY_REVENUE = _small_quantity_revenue_sql("duckdb")
ORACLE_SQL_BOLT_VOLUME_SUPPLIERS = _bolt_volume_suppliers_sql("duckdb")


# --- LATERAL correlated top-k ------------------------------------------
# The remaining modern-SQL join shape: a correlated LATERAL subquery
# with ORDER BY + LIMIT ("top 2 orders per BUILDING customer").
# Catalyst DECORRELATES it — the physical plan is a partitioned window
# top-k (WindowGroupLimit partial top-2 below the shuffle) + equi-join,
# i.e. exactly the plan you would hand-write; nothing executes
# per-customer. The quarantined orders subquery keeps NULL keys and
# non-finite prices out on both engines (Spark lacks isfinite, so the
# clean clause is spelled per dialect).
def _lateral_order_topk_sql(dialect: str) -> str:
    if dialect == "duckdb":
        from demo_etl_spark.io import ORDERS_CLEAN_SQL as clean
    else:
        clean = (
            "(SELECT * FROM orders "
            "WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL "
            "AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL "
            "AND NOT isnan(o_totalprice) "
            "AND abs(o_totalprice) != double('inf')) orders"
        )
    return f"""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice, o.o_orderdate
FROM customer c JOIN LATERAL (
  SELECT o_orderkey, o_totalprice, o_orderdate
  FROM {clean}
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2) o ON true
WHERE c.c_mktsegment = 'BUILDING'
"""


build_lateral_order_topk = _builder(
    _lateral_order_topk_sql, "customer", "orders")

ORACLE_SQL_LATERAL_ORDER_TOPK = _lateral_order_topk_sql("duckdb")


# ------------------------------------------ recursive CTE hierarchy -----
def _part_hierarchy_sql(dialect: str) -> str:
    """Spark 4 recursive CTE (WITH RECURSIVE, UNION ALL) — the
    BOM/org-chart query class, exercised on the arithmetic parent chain
    p → p div 10 (a guaranteed tree: unique parent, no cycles, depth
    ~log10(key), so UNION ALL recursion touches each ancestor exactly
    once — Spark's recursive CTEs don't support UNION-distinct, which
    rules out cyclic closures but is exactly right for hierarchies).
    NULL keys seed one row and stop (NULL > 0 is false on both
    engines); per-part output: chain depth, root digit, chain length.
    """
    d = "div" if dialect == "spark" else "//"
    return f"""
WITH RECURSIVE chain (p_partkey, anc, depth) AS (
  SELECT p_partkey, p_partkey, 0 FROM part
  UNION ALL
  SELECT p_partkey, anc {d} 10, depth + 1 FROM chain WHERE anc > 0
)
SELECT p_partkey,
       CAST(MAX(depth) AS INTEGER) AS depth,
       CAST(MAX(CASE WHEN anc BETWEEN 1 AND 9 THEN anc END) AS INTEGER)
         AS root_digit,
       CAST(COUNT(*) AS BIGINT) AS chain_len
FROM chain
GROUP BY p_partkey
"""


build_part_hierarchy = _builder(_part_hierarchy_sql, "part")

ORACLE_SQL_PART_HIERARCHY = _part_hierarchy_sql("duckdb")
