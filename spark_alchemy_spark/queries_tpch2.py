"""Battery extension: the remaining TPC-H query shapes (Q2, Q4, Q7,
Q8, Q9, Q11, Q12, Q13, Q15, Q16, Q20, Q21), adapted to the synthetic
schema (TESTDATA.md).

The driver schema has no ``partsupp`` table and no commit/receipt
dates, so queries that need them are adapted while preserving the
operator shape the original exercises:

* ``partsupp`` is derived from ``lineitem`` (one row per part+supplier
  with total shipped quantity and the cheapest observed unit price) —
  the correlated-min (Q2), scalar-subquery-in-HAVING (Q11),
  NOT-IN (Q16) and nested-correlated-aggregate (Q20) shapes are intact;
* "late" lines (Q4's, Q12's and Q21's receipt-vs-commit lag) become
  ``l_shipdate > o_orderdate + INTERVAL k DAY``.

Scale notes: every dimension join (part, supplier, nation, region) is
an explicit ``F.broadcast``; the fact table shuffles at most once per
aggregation grain; Q21's double EXISTS/NOT-EXISTS correlation is
rewritten as two per-order distinct-count aggregates (one shuffle)
instead of two correlated self-joins.

Same determinism conventions as queries.py (shared aliases, rounded
floats, stable top-k tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import _t, query

# Derived-partsupp CTE, shared by the DuckDB oracles that need it.
_PS_CTE = """
    partsupp AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             sum(l_quantity) AS ps_availqty,
             min(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
    )
"""


def _derived_partsupp(lineitem):
    """The schema's stand-in for TPC-H ``partsupp``: availqty = total
    shipped quantity (exact: integer-valued doubles), supplycost = the
    cheapest observed unit price. One shuffle on (part, supplier)."""
    return lineitem.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum("l_quantity").alias("ps_availqty"),
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        ),
    )


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@query(
    "q2_min_cost_supplier",
    f"""
    WITH {_PS_CTE},
    eur AS (
      SELECT s_suppkey, s_acctbal, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    cand AS (
      SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name,
             p_partkey, p_name
      FROM partsupp
      JOIN eur ON ps_suppkey = s_suppkey
      JOIN part ON p_partkey = ps_partkey
      WHERE p_type = 'LARGE' AND p_size <= 15
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, p_name, round(ps_supplycost, 4) AS supplycost
    FROM cand c
    WHERE ps_supplycost = (
      SELECT min(ps_supplycost) FROM cand c2
      WHERE c2.ps_partkey = c.ps_partkey
    )
    ORDER BY round(s_acctbal, 2) DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 (adapted): min-cost supplier per part within a region —
    the correlated-min-subquery shape, expressed as a window min so the
    candidate set shuffles exactly once. Dimensions broadcast."""
    lineitem, part, supplier, nation, region = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    eur = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    cand = (
        _derived_partsupp(lineitem)
        .join(F.broadcast(eur), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(
                part.filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 15))
            ),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
    )
    w = Window.partitionBy("ps_partkey")
    return (
        cand.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("ps_supplycost", 4).alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q4_order_priority_exists",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark, sf_dir):
    """TPC-H Q4 (adapted: late = shipped >30 days after order): EXISTS
    correlated subquery as a left-semi join with a mixed equi + range
    condition — one shuffle on the order key, no dedup pass needed."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    window_orders = orders.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    late = window_orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bi-directional nation-pair trade volume by year. The
    two nation dims broadcast under different aliases; lineitem->orders
    is the only large shuffle, then customer joins on the order's
    partitioning."""
    lineitem, orders, customer, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    shipping = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        shipping.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: one nation's share of a region's market for a part
    type, per year — conditional-ratio aggregate over a 5-way join;
    every dimension broadcasts, lineitem shuffles once (to orders)."""
    lineitem, orders, customer, supplier, part, nation, region = _t(
        spark,
        sf_dir,
        "lineitem",
        "orders",
        "customer",
        "supplier",
        "part",
        "nation",
        "region",
    )
    asia_cust = (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_n = supplier.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rows = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1998-01-01"))
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    return (
        rows.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
                        0.0
                    )
                )
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    f"""
    WITH {_PS_CTE}
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount)
               - ps_supplycost * l_quantity AS amount
      FROM lineitem
      JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 (supplycost from the derived partsupp): per-nation
    per-year profit on a product line. The partsupp build and the
    line-level join share the same (partkey, suppkey) shuffle grain."""
    lineitem, orders, supplier, part, nation = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "part", "nation"
    )
    widget_parts = part.filter(F.col("p_name").like("%widget%")).select("p_partkey")
    lines = lineitem.join(
        F.broadcast(widget_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    ps = _derived_partsupp(lines)
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    rows = (
        lines.join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return (
        rows.groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


@query(
    "q11_important_stock",
    f"""
    WITH {_PS_CTE},
    natps AS (
      SELECT ps_partkey,
             CAST(round(ps_supplycost * ps_availqty, 6) AS DECIMAL(30, 6)) AS v
      FROM partsupp
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
    )
    SELECT ps_partkey, CAST(round(sum(v), 2) AS DOUBLE) AS part_value
    FROM natps
    GROUP BY ps_partkey
    HAVING sum(v) > (SELECT sum(v) * 0.001 FROM natps)
    ORDER BY part_value DESC, ps_partkey
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 (derived partsupp): parts holding an outsized share of
    a nation group's stock value — scalar subquery in HAVING, expressed
    as a broadcast of the one-row total joined against the grouped
    values (no second scan of the fact table: the grouped DF feeds
    both sides). Stock values are summed as exact decimals (per-row
    product snapped to a 1e-6 grid first) so the sum — and therefore
    the HAVING frontier and the 2dp display rounding — is
    order-insensitive and identical across engines; a plain double sum
    here rounds 452112.405 differently per accumulation order."""
    lineitem, supplier, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    nat_supp = (
        supplier.join(
            F.broadcast(
                nation.filter(
                    F.col("n_name").isin("NATION_3", "NATION_4", "NATION_5")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    natps = (
        _derived_partsupp(lineitem)
        .join(F.broadcast(nat_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            F.round(F.col("ps_supplycost") * F.col("ps_availqty"), 6)
            .cast("decimal(30,6)")
            .alias("v"),
        )
    )
    # by_part feeds BOTH the grouped values and the 1-row threshold;
    # without a checkpoint the derived-partsupp subtree runs twice (no
    # exchange reuse across the broadcast boundary)
    by_part = (
        natps.groupBy("ps_partkey")
        .agg(F.sum("v").alias("sum_v"))
        .localCheckpoint(eager=False)
    )
    total = by_part.agg(
        (F.sum("sum_v") * F.lit("0.001").cast("decimal(10,6)")).alias("threshold")
    )
    return (
        by_part.join(F.broadcast(total))
        .filter(F.col("sum_v") > F.col("threshold"))
        .select(
            "ps_partkey", F.round("sum_v", 2).cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@query(
    "q12_late_lines_priority",
    """
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_late_lines_priority(spark, sf_dir):
    """TPC-H Q12 (adapted: late = shipped >60 days after order, grouped
    by return flag — the schema has no shipmode): the paired
    case-count aggregate over a fact-fact join with a post-join range
    predicate."""
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = lineitem.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    ).join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: order-count distribution including zero-order
    customers — left outer join with a join-time filter (not a WHERE,
    which would drop the NULL rows), then a double aggregation."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderstatus") != "P").select(
                "o_custkey", "o_orderkey"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: the supplier(s) with max quarterly revenue — a view
    reused on both sides of a scalar-max subquery. The grouped revenue
    DF feeds both the max and the filter, so the lineitem scan and its
    shuffle happen once (AQE reuses the exchange). Comparison is on the
    2dp-rounded revenue, matching the battery's float convention."""
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_variety",
    f"""
    WITH {_PS_CTE}
    SELECT p_brand, p_type, p_size,
           count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_variety(spark, sf_dir):
    """TPC-H Q16 (derived partsupp; negative balance stands in for the
    complaints filter): NOT-IN as a broadcast left-anti join, then a
    count-distinct over the surviving part+supplier pairs."""
    lineitem, part, supplier = _t(spark, sf_dir, "lineitem", "part", "supplier")
    excluded = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    pairs = (
        _derived_partsupp(lineitem)
        .join(
            F.broadcast(excluded),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(parts), F.col("p_partkey") == F.col("ps_partkey"))
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_promotion_suppliers",
    f"""
    WITH {_PS_CTE}
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT ps_suppkey FROM partsupp
      WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND ps_availqty > 2 * (
          SELECT sum(l_quantity) FROM lineitem
          WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
        )
    )
    AND s_nationkey IN (
      SELECT n_nationkey FROM nation
      WHERE n_name IN ('NATION_0', 'NATION_1', 'NATION_2',
                       'NATION_3', 'NATION_4')
    )
    ORDER BY s_suppkey
    """,
)
def q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 (derived partsupp): suppliers holding more than 2x a
    year's shipments of a product line — the nested correlated
    aggregate becomes a join of two aggregations on the same
    (part, supplier) grain (one shuffle each, co-partitioned), then a
    semi join into supplier. All comparisons are exact: quantities are
    integer-valued doubles, so no float-boundary risk."""
    lineitem, part, supplier, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    red_parts = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    ps = _derived_partsupp(
        lineitem.join(
            F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey")
        )
    )
    qty96 = (
        lineitem.join(
            F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .groupBy(
            F.col("l_partkey").alias("q_partkey"),
            F.col("l_suppkey").alias("q_suppkey"),
        )
        .agg(F.sum("l_quantity").alias("qty_1996"))
    )
    promo_supp = (
        ps.join(
            qty96,
            (F.col("ps_partkey") == F.col("q_partkey"))
            & (F.col("ps_suppkey") == F.col("q_suppkey")),
        )
        .filter(F.col("ps_availqty") > 2 * F.col("qty_1996"))
        .select("ps_suppkey")
    )
    nat_keys = nation.filter(
        F.col("n_name").isin(
            "NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4"
        )
    ).select("n_nationkey")
    return (
        supplier.join(
            F.broadcast(nat_keys), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
        )
        .join(
            promo_supp, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_waiting_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
      AND n_name IN ('NATION_7', 'NATION_8', 'NATION_9')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 (adapted: late = shipped >90 days after order date):
    the double EXISTS / NOT-EXISTS correlation, rewritten without
    correlated self-joins — per-order distinct-supplier and
    distinct-late-supplier counts (one aggregation pass over the
    joined fact) decide both predicates: the order must have another
    supplier (total >= 2) and no OTHER late supplier (late == 1)."""
    lineitem, orders, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation"
    )
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lines = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        f_orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    order_stats = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(is_late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    late_lines = lines.filter(is_late)
    nat_supp = supplier.join(
        F.broadcast(
            nation.filter(F.col("n_name").isin("NATION_7", "NATION_8", "NATION_9"))
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    waiting = (
        late_lines.join(
            order_stats.filter(
                (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
            ).select(F.col("l_orderkey").alias("ok")),
            F.col("l_orderkey") == F.col("ok"),
        )
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
