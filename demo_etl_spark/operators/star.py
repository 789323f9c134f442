"""Star join + filters + detail/summary union (SURVEY.md §2.3 J2, §2.2
P1-P9, §2.4 A7 / §2.7 U2).

Job-1-equivalent semantics (inferred surface, SURVEY §0 Caveat A): filter
each input (equality filter on a categorical status column, date-range
"recent" filter, theta predicate — README.md:36-38), star-join facts to
dimensions (README.md:39), add derived per-row columns (README.md:40), and
combine detail rows with NULL-keyed summary rows (README.md:41-42).

Star-schema realization (FIXTURES.md §B): customer.c_mktsegment stands in
for customer status, o_orderdate recency for "recent orders",
p_retailprice > threshold for product availability.

Scale notes: both filters and the 4-way join are fully declarative — the
segment/date/price predicates push into the parquet scans (PushedFilters),
dimension sides broadcast, and the fact-fact join co-locates on orderkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_etl_spark.context import DEFAULT_CONTEXT, RunContext
from demo_etl_spark.functions import (
    day_name_upper,
    final_price,
    is_weekend,
    month_name_upper,
)
from demo_etl_spark.functions.fixedpoint import round_div, round_div_expr
from demo_etl_spark.functions.scalars import money_fixed
from demo_etl_spark.io import ORDERS_CLEAN_SQL, keyed_orders, load_star

SEGMENT = "BUILDING"
RECENT_DAYS = 365
MIN_RETAIL_PRICE = 905.0


def star_join_detail(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
    segment: str = SEGMENT,
    recent_days: int = RECENT_DAYS,
    min_retail_price: float = MIN_RETAIL_PRICE,
) -> DataFrame:
    cutoff = F.date_sub(F.lit(ctx.anchor_date), recent_days)
    active_customers = customer.filter(F.col("c_mktsegment") == segment)
    recent_orders = orders.filter(F.col("o_orderdate") >= cutoff)
    available_parts = part.filter(F.col("p_retailprice") > min_retail_price)

    joined = (
        lineitem.join(
            recent_orders, lineitem["l_orderkey"] == recent_orders["o_orderkey"]
        )
        .join(
            active_customers,
            recent_orders["o_custkey"] == active_customers["c_custkey"],
        )
        .join(available_parts, lineitem["l_partkey"] == available_parts["p_partkey"])
        .filter(F.col("o_custkey").isNotNull())  # P1 idiom (trivially true here)
    )

    enriched = joined.withColumns(
        {
            # try_divide: zero l_quantity must NULL (as DuckDB and the
            # reference's non-ANSI Spark do), not raise DIVIDE_BY_ZERO
            "_price_c": money_fixed(
                F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))
            ),
            "_disc_c": money_fixed(F.col("l_extendedprice") * F.col("l_discount")),
            "_fp_c": money_fixed(
                final_price(F.col("l_extendedprice"), F.col("l_discount"))
            ),
        }
    )
    return enriched.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("p_partkey").alias("product_id"),
        F.col("p_name").alias("product_name"),
        F.col("p_type").alias("category"),
        F.col("l_quantity").alias("quantity"),
        round_div("_price_c", "10000", 2).alias("price"),
        F.col("l_extendedprice").alias("extended_price"),
        round_div("_disc_c", "10000", 2).alias("discount_amount"),
        round_div("_fp_c", "10000", 2).alias("final_price"),
        F.col("o_orderdate").alias("order_date"),
        is_weekend(F.col("o_orderdate")).alias("is_weekend"),
        day_name_upper(F.col("o_orderdate")).alias("day_of_week"),
        month_name_upper(F.col("o_orderdate")).alias("month"),
        F.year(F.col("o_orderdate")).alias("year"),
    )


def detail_summary_union(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    part: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
) -> DataFrame:
    """U2/A7: per-line detail rows UNION ALL NULL-keyed per-category summary
    rows, discriminated by ``row_type`` — the reference's wide-union table
    pattern (README.md:41-42; null filters generate-asset.scala:58,99,131)."""
    base = star_join_detail(lineitem, orders, customer, part, ctx)
    detail = base.select(
        "customer_id",
        "order_id",
        "product_id",
        "category",
        "quantity",
        "final_price",
        F.lit("detail").alias("row_type"),
    )
    summary = (
        base.withColumn("_fp_c", money_fixed(F.col("final_price")))
        .groupBy("category")
        .agg(
            F.sum("quantity").alias("quantity"),
            F.sum("_fp_c").alias("_sum_fp_c"),
        )
        .select(
            F.lit(None).cast("bigint").alias("customer_id"),
            F.lit(None).cast("bigint").alias("order_id"),
            F.lit(None).cast("bigint").alias("product_id"),
            "category",
            "quantity",
            round_div("_sum_fp_c", "10000", 2).alias("final_price"),
            F.lit("summary").alias("row_type"),
        )
    )
    return detail.unionByName(summary)


def build_detail(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    t = load_star(spark, sf_dir)
    return star_join_detail(t["lineitem"], t["orders"], t["customer"], t["part"], ctx)


def build_union(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    t = load_star(spark, sf_dir)
    return detail_summary_union(
        t["lineitem"], t["orders"], t["customer"], t["part"], ctx
    )


def _rd(n: str, d: str, s: int) -> str:
    return round_div_expr(n, d, s, "duckdb")


# o_orderdate >= anchor(2002-01-01) − 365d = 2001-01-01.
_DETAIL_SQL = f"""
  SELECT
    o.o_orderkey AS order_id,
    c.c_custkey AS customer_id,
    c.c_name AS customer_name,
    p.p_partkey AS product_id,
    p.p_name AS product_name,
    p.p_type AS category,
    l.l_quantity AS quantity,
    {_rd("TRY_CAST(ROUND((l.l_extendedprice / l.l_quantity) * 10000, 0) AS BIGINT)", "10000", 2)} AS price,
    l.l_extendedprice AS extended_price,
    {_rd("TRY_CAST(ROUND((l.l_extendedprice * l.l_discount) * 10000, 0) AS BIGINT)", "10000", 2)} AS discount_amount,
    {_rd("TRY_CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) AS BIGINT)", "10000", 2)} AS final_price,
    o.o_orderdate AS order_date,
    isodow(o.o_orderdate) IN (6, 7) AS is_weekend,
    upper(dayname(o.o_orderdate)) AS day_of_week,
    upper(monthname(o.o_orderdate)) AS month,
    CAST(year(o.o_orderdate) AS INTEGER) AS year
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate >= DATE '2001-01-01'
    AND p.p_retailprice > 905.0
"""

ORACLE_SQL_DETAIL = f"SELECT * FROM ({_DETAIL_SQL})"

ORACLE_SQL_UNION = f"""
WITH d AS ({_DETAIL_SQL})
SELECT customer_id, order_id, product_id, category, quantity, final_price,
       'detail' AS row_type
FROM d
UNION ALL
SELECT NULL, NULL, NULL, category, SUM(quantity),
       {_rd("SUM(TRY_CAST(ROUND(final_price * 10000, 0) AS BIGINT))", "10000", 2)},
       'summary'
FROM d GROUP BY category
"""


# ------------------------------------------------------ regional rollup ----
def regional_sales(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
) -> DataFrame:
    """TPC-H-Q5-shaped deep star join: revenue by customer region/nation
    where the supplying nation equals the customer nation (local supply).

    Exercises the full dimension chain (region→nation→customer) plus a
    second fact-dimension arm (supplier); every dimension broadcast-joins,
    the fact-fact join co-locates on orderkey.
    """
    j = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(supplier, lineitem["l_suppkey"] == supplier["s_suppkey"])
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(nation, customer["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
    )
    agg = j.groupBy("r_name", "n_name").agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.countDistinct("c_custkey").alias("n_customers"),
        F.sum(
            money_fixed(
                final_price(F.col("l_extendedprice"), F.col("l_discount"))
            )
        ).alias("_rev_c"),
        F.count(F.lit(1)).alias("_n_lines"),
    )
    return agg.select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        "n_orders",
        "n_customers",
        round_div("_rev_c", "10000", 2).alias("total_revenue"),
        round_div("_rev_c", "_n_lines * 10000", 2).alias("avg_line_revenue"),
    )


def build_regional(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    t = load_star(spark, sf_dir)
    return regional_sales(
        t["lineitem"], t["orders"], t["customer"], t["supplier"],
        t["nation"], t["region"], ctx,
    )


ORACLE_SQL_REGIONAL = f"""
WITH j AS (
  SELECT r.r_name, n.n_name, o.o_orderkey, c.c_custkey,
         TRY_CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) AS BIGINT) AS fp_c
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE s.s_nationkey = c.c_nationkey
)
SELECT r_name AS region, n_name AS nation,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       COUNT(DISTINCT c_custkey) AS n_customers,
       {_rd("CAST(SUM(fp_c) AS BIGINT)", "10000", 2)} AS total_revenue,
       {_rd("CAST(SUM(fp_c) AS BIGINT)", "COUNT(*) * 10000", 2)} AS avg_line_revenue
FROM j
GROUP BY r_name, n_name
"""


# ------------------------------------------------ cube / distributions ----
def sales_cube(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
) -> DataFrame:
    """Revenue CUBE over (nation, order year): all four aggregation levels
    (detail, per-nation, per-year, grand total) in ONE pass — Spark's
    Expand produces every grouping set map-side, so the cost is one
    shuffle regardless of level count. ``grouping()`` flags disambiguate
    real NULL keys from subtotal rows (the cross-engine-safe idiom; the
    reference has no grouping sets at all — SURVEY §2.4 "not present").
    """
    fp = final_price(F.col("l_extendedprice"), F.col("l_discount"))
    j = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(nation, customer["c_nationkey"] == nation["n_nationkey"])
    )
    base = j.select(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("order_year"),
        money_fixed(fp).alias("_fp_c"),
    )
    return (
        base.cube("nation", "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("_fp_c").alias("_rev_c"),
            F.grouping("nation").cast("int").alias("is_nation_total"),
            F.grouping("order_year").cast("int").alias("is_year_total"),
        )
        # populated-cells-only guard: on a ZERO-ROW input the SQL
        # standard (and DuckDB) emit the () grand-total row with
        # count=0 while Spark emits nothing; every cell on non-empty
        # input aggregates >=1 row, so this only pins the empty case
        # (HAVING COUNT(*) > 0 in the oracle)
        .where(F.col("n_lines") > 0)
        .select(
            "nation",
            "order_year",
            "n_lines",
            round_div("_rev_c", "10000", 2).alias("total_revenue"),
            "is_nation_total",
            "is_year_total",
        )
    )


def regional_rollup(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
) -> DataFrame:
    """Revenue ROLLUP down the region ⊃ nation hierarchy — the ordered
    sibling of CUBE (sales_cube): only the prefix grouping sets
    (detail, per-region subtotal, grand total), which is the natural
    shape for a drill-down report over a containment hierarchy. Same
    one-Expand-pass execution as CUBE, one shuffle total.
    """
    fp = final_price(F.col("l_extendedprice"), F.col("l_discount"))
    j = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(nation, customer["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
    )
    base = j.select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        money_fixed(fp).alias("_fp_c"),
    )
    return (
        base.rollup("region", "nation")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("_fp_c").alias("_rev_c"),
            F.grouping("region").cast("int").alias("is_region_total"),
            F.grouping("nation").cast("int").alias("is_nation_total"),
        )
        # populated-cells-only guard (see sales_cube): pins the
        # empty-input grand-total divergence vs the SQL standard
        .where(F.col("n_lines") > 0)
        .select(
            "region",
            "nation",
            "n_lines",
            round_div("_rev_c", "10000", 2).alias("total_revenue"),
            "is_region_total",
            "is_nation_total",
        )
    )


def order_value_distribution(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
) -> DataFrame:
    """Per-nation exact order-value percentiles (p25/p50/p75/p95).

    EXACT AT ANY SCALE — not the collect-a-group-into-one-buffer
    ``percentile`` aggregate (whose per-group value buffer is the thing
    that dies at 100 TB, forcing the usual switch to approx_percentile):

    1. rank every order value within its nation (window PARTITIONED by
       nation — parallel, no group-sized buffer anywhere);
    2. per-nation counts give each quantile's bracketing ranks
       ``lo = 1 + (p·(n−1)) div 100`` / ``hi`` and the remainder — all
       exact integers;
    3. only the ≤8 bracketing rows per nation survive the filter; one
       tiny aggregation interpolates in EXACT integer space
       (v_lo·(100−rem) + v_hi·rem, still an integer) and divides once
       at the end — both engines divide the same integer by the same
       double, so the result is bit-identical by construction instead
       of by luck of matching float interpolation orders.

    The oracle runs the same rank formula (not quantile_cont), keeping
    the definition — linear interpolation at pos = 1 + q·(n−1), i.e.
    what percentile/quantile_cont compute — pinned in SQL.
    """
    from pyspark.sql import Window

    tp_c = F.expr("TRY_CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
    j = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(nation, customer["c_nationkey"] == nation["n_nationkey"])
    )
    # NULL _v (TRY_CAST overflow, or an unquarantined caller) must not
    # enter the rank: Spark's row_number orders NULLS FIRST while the
    # DuckDB oracle's ORDER BY is NULLS LAST, so one NULL would shift
    # every Spark rank by one and move all four percentile brackets
    # (r10 review; latent behind keyed_orders' finite guard today —
    # the oracle mirrors the filter)
    vals = j.select(F.col("n_name").alias("nation"), tp_c.alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    # ties in _v: bracketing rows with equal rank-neighbors carry equal
    # values, so the arbitrary order among ties cannot change any output
    w = Window.partitionBy("nation").orderBy("_v")
    ranked = vals.withColumn("_rk", F.row_number().over(w).cast("long"))
    cnt = vals.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    r = ranked.join(F.broadcast(cnt), "nation")
    qs = [(25, "p25"), (50, "p50"), (75, "p75"), (95, "p95")]
    need = F.lit(False)
    for p, name in qs:
        r = r.withColumn(
            f"_lo{p}", F.expr(f"1 + ({p} * (n_orders - 1)) div 100")
        ).withColumn(f"_rem{p}", F.expr(f"({p} * (n_orders - 1)) % 100"))
        hi = F.col(f"_lo{p}") + F.when(F.col(f"_rem{p}") > 0, 1).otherwise(0)
        r = r.withColumn(f"_hi{p}", hi)
        need = need | (F.col("_rk") == F.col(f"_lo{p}")) | (
            F.col("_rk") == F.col(f"_hi{p}")
        )
    aggs = [F.max("n_orders").alias("n_orders")]
    outs = ["nation", "n_orders"]
    for p, name in qs:
        scaled = F.max(
            F.when(F.col("_rk") == F.col(f"_lo{p}"), F.col("_v"))
        ) * (100 - F.max(f"_rem{p}")) + F.coalesce(
            F.max(F.when(F.col("_rk") == F.col(f"_hi{p}"), F.col("_v"))),
            F.lit(0),
        ) * F.max(f"_rem{p}")
        aggs.append(scaled.alias(f"_s{p}"))
        outs.append((F.col(f"_s{p}") / 10000.0).alias(name))
    return r.filter(need).groupBy("nation").agg(*aggs).select(*outs)


def build_cube(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    t = load_star(spark, sf_dir)
    return sales_cube(t["lineitem"], t["orders"], t["customer"], t["nation"], ctx)


def build_distribution(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    t = load_star(spark, sf_dir)
    return order_value_distribution(
        keyed_orders(t["orders"]), t["customer"], t["nation"], ctx
    )


# quarantined orders subquery without the trailing alias, for oracles
# that alias the table themselves (see io.ORDERS_CLEAN_SQL)
_ORDERS_SUBQ = ORDERS_CLEAN_SQL.rsplit(" ", 1)[0]

ORACLE_SQL_CUBE = f"""
WITH base AS (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
         TRY_CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) AS BIGINT) AS fp_c
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT nation, order_year,
       COUNT(*) AS n_lines,
       {_rd("CAST(SUM(fp_c) AS BIGINT)", "10000", 2)} AS total_revenue,
       CAST(GROUPING(nation) AS INTEGER) AS is_nation_total,
       CAST(GROUPING(order_year) AS INTEGER) AS is_year_total
FROM base
GROUP BY CUBE(nation, order_year)
HAVING COUNT(*) > 0
"""

def _distribution_oracle() -> str:
    """Same rank-bracket interpolation as the Spark plan (see
    order_value_distribution's docstring) — NOT quantile_cont, so the
    exact-integer definition is pinned in SQL."""
    qcols, scols = [], []
    for p in (25, 50, 75, 95):
        qcols.append(
            f"1 + ({p} * (n_orders - 1)) // 100 AS lo{p}, "
            f"({p} * (n_orders - 1)) % 100 AS rem{p}, "
            f"1 + ({p} * (n_orders - 1)) // 100 "
            f"+ CASE WHEN ({p} * (n_orders - 1)) % 100 > 0 THEN 1 ELSE 0 END"
            f" AS hi{p}"
        )
        scols.append(
            f"(MAX(CASE WHEN rk = lo{p} THEN v END) * (100 - MAX(rem{p}))"
            f" + COALESCE(MAX(CASE WHEN rk = hi{p} THEN v END), 0)"
            f" * MAX(rem{p})) / 10000.0 AS p{p}"
        )
    conds = " OR ".join(
        f"rk = lo{p} OR rk = hi{p}" for p in (25, 50, 75, 95)
    )
    return f"""
WITH j AS (
  -- v IS NOT NULL mirrors the Spark-side guard: a NULL rank value
  -- would sort NULLS FIRST under Spark's row_number but NULLS LAST
  -- here, shifting every bracket (r10 review)
  SELECT * FROM (
    SELECT n.n_name AS nation,
           TRY_CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS v
    FROM {_ORDERS_SUBQ} o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
  ) WHERE v IS NOT NULL
),
ranked AS (
  SELECT nation, v,
         row_number() OVER (PARTITION BY nation ORDER BY v) AS rk
  FROM j
),
cnt AS (
  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_orders FROM j GROUP BY nation
),
r AS (
  SELECT ranked.*, n_orders, {', '.join(qcols)}
  FROM ranked JOIN cnt USING (nation)
)
SELECT nation, MAX(n_orders) AS n_orders, {', '.join(scols)}
FROM r
WHERE {conds}
GROUP BY nation
"""


ORACLE_SQL_DISTRIBUTION = _distribution_oracle()


def build_rollup(spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT) -> DataFrame:
    t = load_star(spark, sf_dir)
    return regional_rollup(
        t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"], ctx
    )


ORACLE_SQL_ROLLUP = f"""
WITH base AS (
  SELECT r.r_name AS region,
         n.n_name AS nation,
         TRY_CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) AS BIGINT) AS fp_c
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT region, nation,
       COUNT(*) AS n_lines,
       {_rd("CAST(SUM(fp_c) AS BIGINT)", "10000", 2)} AS total_revenue,
       CAST(GROUPING(region) AS INTEGER) AS is_region_total,
       CAST(GROUPING(nation) AS INTEGER) AS is_nation_total
FROM base
GROUP BY ROLLUP(region, nation)
HAVING COUNT(*) > 0
"""


def sales_grouping_sets(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    ctx: RunContext = DEFAULT_CONTEXT,
) -> DataFrame:
    """Revenue over EXPLICIT grouping sets — (region, nation, year)
    detail, per-region totals, grand total — the mixed-granularity
    report neither CUBE (all 8 combinations) nor ROLLUP (prefix chain)
    expresses without wasted subtotal rows. Completes the §2.4
    multi-level-aggregate trio; same single-Expand one-shuffle plan as
    the cube, but Expand emits exactly the 3 requested sets per row
    instead of 2^k."""
    fp = final_price(F.col("l_extendedprice"), F.col("l_discount"))
    j = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(nation, customer["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
    )
    base = j.select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("order_year"),
        money_fixed(fp).alias("_fp_c"),
    )
    return (
        base.groupingSets(
            [["region", "nation", "order_year"], ["region"], []],
            "region",
            "nation",
            "order_year",
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("_fp_c").alias("_rev_c"),
            F.grouping("region").cast("int").alias("is_region_total"),
            F.grouping("nation").cast("int").alias("is_nation_total"),
            F.grouping("order_year").cast("int").alias("is_year_total"),
        )
        # populated-cells-only guard (see sales_cube): pins the
        # empty-input grand-total divergence vs the SQL standard
        .where(F.col("n_lines") > 0)
        .select(
            "region",
            "nation",
            "order_year",
            "n_lines",
            round_div("_rev_c", "10000", 2).alias("total_revenue"),
            "is_region_total",
            "is_nation_total",
            "is_year_total",
        )
    )


def build_grouping_sets(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    t = load_star(spark, sf_dir)
    return sales_grouping_sets(
        t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"], ctx
    )


ORACLE_SQL_GROUPING_SETS = f"""
WITH base AS (
  SELECT r.r_name AS region,
         n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
         TRY_CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) AS BIGINT) AS fp_c
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT region, nation, order_year,
       COUNT(*) AS n_lines,
       {_rd("CAST(SUM(fp_c) AS BIGINT)", "10000", 2)} AS total_revenue,
       CAST(GROUPING(region) AS INTEGER) AS is_region_total,
       CAST(GROUPING(nation) AS INTEGER) AS is_nation_total,
       CAST(GROUPING(order_year) AS INTEGER) AS is_year_total
FROM base
GROUP BY GROUPING SETS ((region, nation, order_year), (region), ())
HAVING COUNT(*) > 0
"""


# ------------------------------------------- incremental join view ------
#: ship-date split simulating "data already processed" vs "new arrivals"
IVM_SPLIT = "1998-07-01"


def incremental_join_view(
    lineitem: DataFrame, orders: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Incremental maintenance of a JOIN view: the monthly-revenue-per-
    priority view over lineitem ⋈ orders, maintained as
    Δ(A ⋈ B) = ΔA ⋈ B — only the NEW lineitems (shipdate ≥ split) join
    orders and aggregate; the result merges additively with the stored
    partial computed from the old half. Works because the aggregates
    are monoidal (counts + exact fixed-point sums) and lineitem is the
    only delta side. Completes the incremental family: additive rollup
    increments (events_incremental_rollup), disk MERGE
    (maintenance.merge_upsert), streaming serving compaction
    (streaming.serving) — this one proves the JOIN-view algebra under
    the oracle (the one-shot query over the full table).

    At 100 TB the 'stored' branch is a table scan of the materialized
    view, not a recompute — here both branches run so the driver's
    hash-check proves the merged result is bit-equal to one-shot."""

    def partial(li: DataFrame) -> DataFrame:
        fp = final_price(F.col("l_extendedprice"), F.col("l_discount"))
        return (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy(
                F.trunc("o_orderdate", "month").alias("order_month"),
                "o_orderpriority",
            )
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(money_fixed(fp)).alias("_rev_c"),
            )
        )

    # the split must PARTITION lineitem: a NULL l_shipdate satisfies
    # neither comparison and would vanish from both branches while the
    # one-shot oracle still aggregates the row — Delta(A ⋈ B) = ΔA ⋈ B
    # only holds when ΔA ∪ A_old covers A (r10 review); NULL-shipdate
    # rows ride with the historical branch
    old = partial(
        lineitem.filter(
            (F.col("l_shipdate") < F.lit(IVM_SPLIT))
            | F.col("l_shipdate").isNull()
        )
    )
    delta = partial(lineitem.filter(F.col("l_shipdate") >= F.lit(IVM_SPLIT)))
    return (
        old.unionByName(delta)
        .groupBy("order_month", "o_orderpriority")
        .agg(
            F.sum("n_lines").alias("n_lines"),
            F.sum("_rev_c").alias("_rev_c"),
        )
        .select(
            "order_month",
            "o_orderpriority",
            "n_lines",
            round_div("_rev_c", "10000", 2).alias("total_revenue"),
        )
    )


def build_incremental_join_view(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    t = load_star(spark, sf_dir)
    return incremental_join_view(t["lineitem"], keyed_orders(t["orders"]), ctx)


#: one-shot oracle — the merged incremental result must equal computing
#: the view directly over the FULL lineitem table
ORACLE_SQL_INCREMENTAL_JOIN_VIEW = f"""
SELECT date_trunc('month', o.o_orderdate) AS order_month,
       o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {_rd("CAST(SUM(TRY_CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)) * 10000, 0) AS BIGINT)) AS BIGINT)", "10000", 2)} AS total_revenue
FROM lineitem l
JOIN {_ORDERS_SUBQ} o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""


# ---------------------------------------------------- shipping SLA ------
SLA_DAYS = 7


def shipping_sla(
    lineitem: DataFrame, orders: DataFrame, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    """Per-priority shipping SLA: share of orders whose FIRST line ships
    within SLA_DAYS of the order date. Order-level compliance first
    (min shipdate per order — partial+final agg on the join key the
    fact pair already co-locates on), then a tiny per-priority rollup
    with exact HALF_UP shares. The operational-monitoring complement of
    the TPC-H Q12 shipping-mode split."""
    first_ship = lineitem.groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("_first_ship")
    )
    j = orders.join(
        first_ship, orders["o_orderkey"] == first_ship["l_orderkey"]
    ).withColumn(
        "_within",
        # coalesce 0: an order with a NULL effective date is NOT within
        # SLA — the oracle's CASE ... ELSE 0 semantics. Without it the
        # NULL rides into SUM, and a priority group whose EVERY order
        # is NULL-dated sums to NULL in Spark vs 0 in DuckDB (r13
        # review; latent — no current corpus has an all-NULL group).
        F.coalesce(
            (
                F.datediff(F.col("_first_ship"), F.to_date("o_orderdate"))
                <= SLA_DAYS
            ).cast("long"),
            F.lit(0),
        ),
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("_within").alias("n_within_sla"),
        )
        .withColumn("sla_share", round_div("n_within_sla", "n_orders", 4))
    )


def build_shipping_sla(
    spark: SparkSession, sf_dir: str, ctx: RunContext = DEFAULT_CONTEXT
) -> DataFrame:
    t = load_star(spark, sf_dir)
    return shipping_sla(t["lineitem"], keyed_orders(t["orders"]), ctx)


ORACLE_SQL_SHIPPING_SLA = f"""
WITH first_ship AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o.o_orderpriority,
         CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE), f.first_ship)
                   <= {SLA_DAYS} THEN 1 ELSE 0 END AS within
  FROM {_ORDERS_SUBQ} o JOIN first_ship f ON o.o_orderkey = f.l_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(within) AS BIGINT) AS n_within_sla,
       {_rd("CAST(SUM(within) AS BIGINT)", "CAST(COUNT(*) AS BIGINT)", 4)} AS sla_share
FROM j GROUP BY 1
"""
