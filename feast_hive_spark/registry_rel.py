"""Additional relational coverage entries: the join/agg shapes the
reference lacks but Spark gives for free (SURVEY §2.3 'absent' list:
semi/anti joins; §2.4 'absent': rollup, pivot) — included so a user of
the reference switching to this engine gets the full relational
vocabulary with oracle-checked semantics.

Importing this module populates feast_hive_spark.registry.REGISTRY.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feast_hive_spark.plans.bcast import gated_broadcast, sql_broadcast_hint
from feast_hive_spark.registry import register
from feast_hive_spark.sources.tables import ensure_views, read_table


@register(
    "q6_revenue_delta",
    """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive filter + global agg —
    the canonical predicate-pushdown benchmark (all three filters reach
    the parquet scan; zero shuffles besides the 1-row final agg).
    One-``spark.sql`` build (see registry.q1_pricing_summary)."""
    ensure_views(spark, sf_dir)
    return spark.sql("""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """)


@register(
    "semi_join_active_customers",
    """
SELECT c.c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
""",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join (EXISTS): customers having >=1 order, by segment.
    Semi joins never duplicate or widen rows — at scale the build side
    is just the distinct key set."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "anti_join_inactive_customers",
    """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
)
""",
)
def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join (NOT EXISTS): customers with no recent order.
    The date filter lands on the anti side BEFORE the join — at scale
    that prunes the build input, not the probe output."""
    cust = read_table(spark, sf_dir, "customer")
    recent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(datetime(2001, 1, 1))
    )
    return cust.join(
        recent, cust.c_custkey == recent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "rollup_order_priority",
    """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
)
def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (priority -> status -> grand total) —
    subtotal rows carry NULL group keys in both engines."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "pivot_status_by_segment",
    """
SELECT c.c_mktsegment,
       COUNT(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS n_open,
       COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS n_filled,
       COUNT(CASE WHEN o.o_orderstatus = 'P' THEN 1 END) AS n_pending
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (conditional aggregation): order-status counts fanned out
    to columns per market segment."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    joined = orders.join(
        gated_broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
    )


@register(
    "set_ops_key_overlap",
    """
SELECT 'both' AS bucket, COUNT(*) AS n FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'purchase'
)
UNION ALL
SELECT 'click_only' AS bucket, COUNT(*) AS n FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'purchase'
)
""",
)
def set_ops_key_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (INTERSECT / EXCEPT / UNION ALL) over key sets."""
    # ONE events scan (r13, guide §2.3): INTERSECT/EXCEPT are
    # distinct-based, so both buckets derive from one per-user flag
    # rollup — the old two set ops each scanned events twice (4 scans,
    # 2 distinct exchanges per op).
    ev = read_table(spark, sf_dir, "events")
    flags = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("__c"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("__p"),
        )
        .cache()
    )
    both = flags.filter((F.col("__c") == 1) & (F.col("__p") == 1)).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("both").alias("bucket"), "n")
    only = flags.filter((F.col("__c") == 1) & (F.col("__p") == 0)).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("click_only").alias("bucket"), "n")
    return both.unionAll(only)


@register(
    "q10_returned_items",
    """
SELECT c.c_custkey, c.c_name, n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20
    with a deterministic total order; customer/nation broadcast while
    the size gate holds (plans/bcast.py — customer grows with scale).
    One-``spark.sql`` build (see registry.q1_pricing_summary)."""
    ensure_views(spark, sf_dir)
    hint = sql_broadcast_hint(
        spark, sf_dir, {"c": "customer", "n": "nation"}
    )
    return spark.sql(f"""
        SELECT {hint}
               c.c_custkey, c.c_name, n.n_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """)


@register(
    "q14_promo_revenue",
    """
SELECT ROUND(
         100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
         / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct,
       COUNT(*) AS n_rows
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a broadcast
    dim join (size-gated — part grows with scale). One-``spark.sql``
    build (see registry.q1_pricing_summary)."""
    ensure_views(spark, sf_dir)
    hint = sql_broadcast_hint(spark, sf_dir, {"p": "part"})
    return spark.sql(f"""
        SELECT {hint}
               round(100.0D * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                                       THEN l.l_extendedprice * (1 - l.l_discount)
                                       ELSE 0.0D END)
                     / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                 AS promo_revenue_pct,
               count(*) AS n_rows
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
    """)


@register(
    "q18_large_orders",
    """
SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
       ROUND(SUM(l.l_quantity), 2) AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING SUM(l.l_quantity) > 120
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: groupBy + HAVING threshold + top-k.

    Aggregate-before-join: lineitem reduces to one row per orderkey
    (map-side partial agg does most of it before the one shuffle) and
    the >120 filter runs on that, so the orders join sees only the
    few qualifying keys — AQE broadcasts that side at runtime instead
    of shuffling the full orders table, and the top-20 is a
    TakeOrdered, never a global sort. Joining the raw 4x-wider
    (lineitem x orders) stream first and aggregating after would
    shuffle every line row with its order payload attached. The
    aggregate-before-join shape is spelled in the SQL subquery — the
    one-``spark.sql`` build (see registry.q1_pricing_summary)
    preserves it verbatim."""
    ensure_views(spark, sf_dir)
    return spark.sql("""
        SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
               round(q.__sq, 2) AS total_qty
        FROM orders o
        JOIN (
          SELECT l_orderkey, sum(l_quantity) AS __sq
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 120
        ) q ON o.o_orderkey = q.l_orderkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
    """)


@register(
    "q4_priority_with_returns",
    """
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
""",
)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: EXISTS predicate on l_returnflag since
    this dataset has no l_commitdate): order-priority counts for orders
    in a quarter having at least one returned line. The correlated
    EXISTS becomes a left_semi join whose build side is pre-filtered —
    at scale only matching orderkeys shuffle, never full lineitem rows."""
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(datetime(1996, 7, 1)))
        & (F.col("o_orderdate") < F.lit(datetime(1996, 10, 1)))
    )
    returned = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q12_priority_by_linestatus",
    """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
""",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_linestatus standing in for the absent
    l_shipmode): dual conditional sums over a fact-fact join. The
    shipdate filter prunes lineitem at the scan; the two CASE sums are
    one pass (map-side partial agg on a 2-value key)."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(datetime(1996, 1, 1)))
        & (F.col("l_shipdate") < F.lit(datetime(1997, 1, 1)))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    """
SELECT n_orders, COUNT(*) AS n_custs
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'P'
  GROUP BY c.c_custkey
) per_cust
GROUP BY n_orders
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count-per-customer distribution. The
    status predicate lives in the LEFT JOIN's ON clause (not WHERE) so
    zero-order customers survive with count 0 — the agg-of-agg second
    shuffle is tiny (one row per distinct count value)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "P"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_custs"))


@register(
    "q19_disjunctive_revenue",
    """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (OR-of-ANDs) predicates spanning
    both join sides. Catalyst extracts the common single-side conjuncts
    (brand/size on part, quantity range on lineitem) and pushes them
    below the join, keeping the cross-side OR as a post-join filter."""
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem")
    joined = li.join(gated_broadcast(part), part.p_partkey == li.l_partkey)
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return joined.filter(
        arm("Brand#12", 5, 1, 11) | arm("Brand#23", 10, 10, 20) | arm("Brand#34", 15, 20, 30)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q22_dormant_rich_customers",
    """
SELECT c.c_mktsegment, COUNT(*) AS n_custs,
       ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
FROM customer c
WHERE c.c_acctbal > (SELECT ROUND(AVG(c_acctbal), 0) FROM customer
                     WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
GROUP BY c.c_mktsegment
""",
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS (dormant
    = no order since 1998, since every customer here has some order).
    The average is computed distributed and crossJoin-broadcast as a
    1-row literal (no driver collect); the threshold is rounded to an
    integer on both engines so float summation order can't flip a
    boundary row. The anti join's build side is the pre-filtered
    recent-orders key set, pruned before the shuffle."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(datetime(1998, 1, 1))
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 0).alias("__thr")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__thr")
    )
    return (
        rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "q7_nation_volume_shipping",
    """
SELECT supp_nation, cust_nation, l_year,
       ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: 6-way star join with a disjunctive nation-pair
    filter, revenue by (supplier nation, customer nation, year).

    Scale shape: nation is broadcast twice (aliased dims), supplier and
    customer broadcast; the only shuffles are the fact-fact
    lineitem-orders join and the final 3-key agg. The nation-pair
    disjunction cannot be pushed below the joins (it spans two sides)
    but prunes immediately after the cheap broadcast probes."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(gated_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(gated_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@register(
    "q8_market_share",
    """
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n1.n_name AS nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n2.n_regionkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join, market share of one supplier nation
    inside a customer region per year (conditional-sum ratio).

    All dims broadcast; the p_type filter prunes the part build side
    BEFORE its broadcast, which in turn prunes lineitem at the probe;
    the region filter shrinks the customer-nation dim to one region's
    keys. One fact-fact shuffle (lineitem-orders), one 1-key agg."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(gated_broadcast(p), li.l_partkey == p.p_partkey)
        .join(gated_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(gated_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    """
SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) - 10.0 * l.l_quantity AS amount
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%bolt%'
) profit
GROUP BY nation, o_year
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp table in this schema, so supplycost
    is a flat 10/unit): profit per supplier nation per year for parts
    matching a name pattern. The LIKE filter prunes part before its
    broadcast; profit arithmetic is codegen'd into the join stage."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    n = read_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(10.0) * F.col("l_quantity")
    )
    return (
        li.join(gated_broadcast(p), li.l_partkey == p.p_partkey)
        .join(gated_broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


@register(
    "q15_top_supplier",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier quarterly revenue, keep the
    supplier(s) hitting the global max (scalar-subquery equality).

    The revenue CTE is computed once and cached (two consumers: the
    max and the equality filter); the 1-row max is crossJoin-broadcast,
    never collected. Revenue is rounded to 2 on both engines BEFORE
    max/compare so the equality can't be split by float summation
    order."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(datetime(1996, 1, 1)))
            & (F.col("l_shipdate") < F.lit(datetime(1996, 4, 1)))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
        .cache()
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    return (
        gated_broadcast(s)
        .join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_counts",
    """
SELECT p.p_brand, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 2, 3, 4)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%0001%'
  )
GROUP BY p.p_brand, p.p_size
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem standing in for the absent partsupp):
    distinct supplier counts per (brand, size) excluding a supplier
    blocklist via NOT IN -> left_anti against the (tiny, broadcast)
    blocklist. COUNT(DISTINCT) expands to the classic two-phase
    partial-dedup aggregate - no row explosion at scale."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 2, 3, 4)
    )
    blocked = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%0001%")
    ).select("s_suppkey")
    return (
        li.join(gated_broadcast(blocked), li.l_suppkey == blocked.s_suppkey, "left_anti")
        .join(gated_broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    """
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey, ROUND(0.2 * AVG(l_quantity), 6) AS qty_thr
  FROM lineitem GROUP BY l_partkey
) t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_thr
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into a grouped aggregate + equi join - the
    standard Spark rewrite; Catalyst does the same to the subquery
    form. The threshold is rounded to 6 on both engines so float
    summation order can't flip a boundary row."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    thr = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_thr"))
    )
    return (
        li.join(gated_broadcast(p), li.l_partkey == p.p_partkey)
        .join(thr, li.l_partkey == thr.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q21_sole_returning_supplier",
    """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
""",
)
def q21_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (no commit/receipt dates in this schema, so
    'late' becomes 'returned'): suppliers who were the ONLY supplier
    with a returned line on a multi-supplier finalized order -
    EXISTS + NOT EXISTS double correlation on the same fact table.

    Spark shape (r13, guide §2.3/§3.3): the EXISTS/NOT-EXISTS pair is
    decided per (orderkey, suppkey), so the fact table folds to that
    rollup in ONE scan (was: three lineitem scans feeding shuffled
    semi/anti joins with fact-sized probe sides). Per returned line
    with supplier s on order o: "another supplier has a line on o"
    ⇔ o's distinct-supplier count ≥ 2 (s itself is in the set), and
    "no OTHER supplier has a returned line on o" ⇔ o's
    returned-supplier count == 1. Both counts ride one window over
    the (orderkey, suppkey)-sized rollup — the only shuffles after
    the scan are rollup-sized. numwait = SUM of the qualifying
    rollup's returned-line counts, the exact multiplicity the
    semi/anti formulation counted row-wise."""
    from pyspark.sql import Window

    s = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    ps = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("l_returnflag") == "R", F.lit(1))).alias(
            "__nret"
        )
    )
    wo = Window.partitionBy("l_orderkey")
    st = ps.select(
        "l_orderkey",
        "l_suppkey",
        "__nret",
        F.count(F.lit(1)).over(wo).alias("__d_all"),
        F.sum((F.col("__nret") > 0).cast("int")).over(wo).alias("__d_ret"),
    )
    base = st.filter(
        (F.col("__nret") > 0)
        & (F.col("__d_all") >= 2)
        & (F.col("__d_ret") == 1)
    ).join(
        o.select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    return (
        base.join(gated_broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("__nret").cast("long").alias("numwait"))
    )


# =====================================================================
# window-function vocabulary (SURVEY §2.5 'absent' list: the reference
# only ever uses ROW_NUMBER; these are the analytic windows a user of
# a real warehouse engine expects)
# =====================================================================


@register(
    "window_user_activity",
    """
SELECT event_id, user_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
       ROUND(SUM(value) OVER w, 2) AS cum_value,
       ROUND(AVG(value) OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP), event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
         AS mavg4,
       ROUND(value - LAG(value, 1, 0.0) OVER w, 2) AS delta_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
""",
)
def window_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence analytics in ONE window pass: running
    sequence number, cumulative sum, 4-row moving average, delta to the
    previous event. All four functions share one (partition, order) so
    Spark evaluates them in a single Window operator — one shuffle by
    user_id, one sort per partition, regardless of how many analytic
    columns ride along. Explicit event_id tiebreak keeps every frame
    deterministic (oracle-parity recipe)."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrows = w.rowsBetween(-3, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("long").alias("seq"),
        F.round(F.sum("value").over(w), 2).alias("cum_value"),
        F.round(F.avg("value").over(wrows), 4).alias("mavg4"),
        F.round(
            F.col("value") - F.lag("value", 1, 0.0).over(w), 2
        ).alias("delta_prev"),
    )


@register(
    "cube_order_stats",
    """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping-set combinations in one pass (the
    generalization of the ROLLUP entry) — Spark expands grouping sets
    into a single Expand + hash aggregate, NOT four scans."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "ntile_event_value_quartiles",
    """
WITH t AS (
  SELECT event_type, value,
         NTILE(4) OVER (PARTITION BY event_type
                        ORDER BY value, event_id) AS quartile
  FROM events
)
SELECT event_type, CAST(quartile AS BIGINT) AS quartile,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM t GROUP BY event_type, quartile
""",
)
def ntile_event_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing + re-aggregation (the score-banding shape):
    deterministic via the event_id tiebreak inside the window order."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select(
            "event_type",
            "value",
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "percentile_order_value",
    """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders GROUP BY o_orderstatus
""",
)
def percentile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group: Spark's percentile()
    and DuckDB's quantile_cont share the linear-interpolation formula,
    so the values hash-match. At 100 TB you'd flip to
    approx_percentile (t-digest, mergeable partials) - the exact form
    is the oracle-able baseline and the two agree to ~1e-9 relative."""
    o = read_table(spark, sf_dir, "orders")
    # one percentile(col, array(...)) call (r13, guide §2.3): three
    # scalar percentile aggregates each built their OWN per-group
    # value buffer (3x partial_percentile in the plan); the array form
    # sorts one buffer and reads all three quantiles from it — same
    # Percentile expression, bit-identical interpolation.
    return o.groupBy("o_orderstatus").agg(
        F.expr(
            "percentile(o_totalprice, array(0.5D, 0.9D, 0.99D))"
        ).alias("__ps")
    ).select(
        "o_orderstatus",
        F.round(F.col("__ps")[0], 4).alias("p50"),
        F.round(F.col("__ps")[1], 4).alias("p90"),
        F.round(F.col("__ps")[2], 4).alias("p99"),
    )


@register(
    "quantile_bins_order_value",
    """
WITH b AS (
  SELECT o_orderstatus,
         ROUND(quantile_cont(o_totalprice, 0.25), 4) AS b1,
         ROUND(quantile_cont(o_totalprice, 0.50), 4) AS b2,
         ROUND(quantile_cont(o_totalprice, 0.75), 4) AS b3
  FROM orders GROUP BY o_orderstatus
)
SELECT o.o_orderstatus,
       1 + CAST(o.o_totalprice > b.b1 AS INT)
         + CAST(o.o_totalprice > b.b2 AS INT)
         + CAST(o.o_totalprice > b.b3 AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o.o_totalprice), 2) AS sum_value
FROM orders o JOIN b USING (o_orderstatus)
GROUP BY 1, 2
""",
)
def quantile_bins_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretizer (the feature-binning shape): per-group
    quartile boundaries from ONE #groups-row aggregate broadcast back
    onto the fact scan, bin assignment in codegen, then the binned
    rollup. Boundaries are rounded to 4dp in BOTH engines before
    comparison so the bin edges are bit-identical cross-engine. At
    100 TB swap the exact percentile for approx_percentile (see
    approx_percentile_rank_bounded for its tolerance gate) — the plan
    shape is unchanged."""
    o = read_table(spark, sf_dir, "orders")
    # one percentile(col, array(...)) buffer instead of three (r13,
    # guide §2.3 — see percentile_order_value)
    bounds = o.groupBy("o_orderstatus").agg(
        F.expr(
            "percentile(o_totalprice, array(0.25D, 0.50D, 0.75D))"
        ).alias("__bs")
    ).select(
        "o_orderstatus",
        F.round(F.col("__bs")[0], 4).alias("b1"),
        F.round(F.col("__bs")[1], 4).alias("b2"),
        F.round(F.col("__bs")[2], 4).alias("b3"),
    )
    j = o.join(F.broadcast(bounds), "o_orderstatus")
    binc = (
        F.lit(1)
        + (F.col("o_totalprice") > F.col("b1")).cast("int")
        + (F.col("o_totalprice") > F.col("b2")).cast("int")
        + (F.col("o_totalprice") > F.col("b3")).cast("int")
    )
    return j.groupBy("o_orderstatus", binc.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_value"),
    )


@register(
    "full_outer_nation_presence",
    """
WITH cust AS (
  SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
  FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey
), supp AS (
  SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
  FROM supplier WHERE s_acctbal > 8000 GROUP BY s_nationkey
)
SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
""",
)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one join type the relational suite lacked):
    per-nation BUILDING-segment customer counts vs rich-supplier
    counts, keeping nations present on either side with zero-filled
    gaps. Both inputs pre-aggregate BEFORE the join, so the outer join
    runs on two tiny keyed aggregates, not on the fact tables."""
    cust = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 8000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "interval_overlap_counts",
    """
WITH purchases AS (
  SELECT event_id AS probe_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
  WHERE event_type = 'click'
)
SELECT p.probe_id, CAST(COUNT(c.us) AS BIGINT) AS n_nearby_clicks
FROM purchases p
LEFT JOIN clicks c ON c.us BETWEEN p.us - 1800000000 AND p.us + 1800000000
GROUP BY p.probe_id
""",
)
def interval_overlap_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap (range) join, binned for scale: clicks within
    +-30 minutes of each purchase.

    A naive range join is a broadcast-nested-loop (O(n*m) comparisons).
    The scalable shape: hash clicks into 30-minute time bins once, let
    every purchase probe only its 3 adjacent bins (sequence+explode),
    equi-join on the bin id, then apply the exact range predicate as a
    residual filter. Comparisons drop from all-pairs to pairs sharing
    a bin - the standard interval-join decomposition (DuckDB's IEJoin
    achieves the same effect inside the oracle)."""
    bin_us = 1800 * 1_000_000
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("probe_id"),
        F.unix_micros("ts").alias("p_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.unix_micros("ts").alias("c_us")
    ).withColumn("__bin", F.floor(F.col("c_us") / bin_us))
    probed = purchases.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor((F.col("p_us") - bin_us) / bin_us),
                F.floor((F.col("p_us") + bin_us) / bin_us),
            )
        ),
    )
    return (
        probed.join(clicks, "__bin", "left")
        .groupBy("probe_id")
        .agg(
            F.sum(
                F.when(
                    F.col("c_us").between(
                        F.col("p_us") - bin_us, F.col("p_us") + bin_us
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_nearby_clicks")
        )
    )


@register(
    "grouping_sets_orders",
    """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither ROLLUP nor CUBE): per-status and
    per-priority totals in ONE Expand+aggregate pass over one scan -
    the two-reports-one-scan shape."""
    orders = read_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "q2_best_supplier_per_part",
    """
WITH shipped AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), ranked AS (
  SELECT s.l_partkey, s.l_suppkey, su.s_acctbal, su.s_name,
         ROW_NUMBER() OVER (PARTITION BY s.l_partkey
                            ORDER BY su.s_acctbal DESC, s.l_suppkey) AS rn
  FROM shipped s
  JOIN supplier su ON su.s_suppkey = s.l_suppkey
  JOIN nation n ON n.n_nationkey = su.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT p.p_partkey, p.p_name, rk.s_name, rk.s_acctbal
FROM ranked rk JOIN part p ON p.p_partkey = rk.l_partkey
WHERE rk.rn = 1 AND p.p_size < 5
ORDER BY rk.s_acctbal DESC, p.p_partkey
LIMIT 20
""",
)
def q2_best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (lineitem standing in for partsupp, acctbal for
    supply cost): per-part argmax supplier within a region, then a
    top-20. The per-part correlated subquery decorrelates into one
    ranking window over the distinct (part, supplier) pairs; region
    pruning shrinks the supplier dim BEFORE its broadcast, and
    WindowGroupLimit keeps only rank-1 rows ahead of the final
    TakeOrdered."""
    li = read_table(spark, sf_dir, "lineitem")
    su = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_size") < 5)
    from pyspark.sql import Window

    shipped = li.select("l_partkey", "l_suppkey").distinct()
    regional = (
        su.join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("s_acctbal").desc(), F.col("l_suppkey")
    )
    ranked = (
        # regional is row-preserving over supplier (unique-key nation/
        # region lookups), but Catalyst's join estimate multiplies the
        # children — probe the supplier scan, the real bound.
        shipped.join(gated_broadcast(regional, probe=su),
                     shipped.l_suppkey == regional.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        ranked.join(gated_broadcast(p), ranked.l_partkey == p.p_partkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(20)
    )


@register(
    "q20_part_family_suppliers",
    """
WITH per AS (
  SELECT l.l_suppkey,
         SUM(CASE WHEN p.p_name LIKE '%rod%' THEN l.l_quantity ELSE 0 END)
           AS fam_qty,
         SUM(l.l_quantity) AS tot_qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       ROUND(fam.fam_qty, 2) AS fam_qty, ROUND(fam.tot_qty, 2) AS tot_qty
FROM supplier s
JOIN (SELECT * FROM per WHERE fam_qty > 0.15 * tot_qty) fam
  ON fam.l_suppkey = s.s_suppkey
""",
)
def q20_part_family_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp): suppliers whose shipments of a
    part family exceed a share of their total volume - the nested-
    aggregation IN-subquery decorrelated into one conditional-sum
    aggregate + a filtered equi join. One fact scan, one shuffle by
    supplier, supplier dim broadcast."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    per = (
        li.join(gated_broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.when(F.col("p_name").like("%rod%"), F.col("l_quantity")).otherwise(
                    0.0
                )
            ).alias("fam_qty"),
            F.sum("l_quantity").alias("tot_qty"),
        )
        .filter(F.col("fam_qty") > 0.15 * F.col("tot_qty"))
    )
    return (
        gated_broadcast(s)
        .join(per, s.s_suppkey == per.l_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("fam_qty", 2).alias("fam_qty"),
            F.round("tot_qty", 2).alias("tot_qty"),
        )
    )


@register(
    "q11_important_part_values",
    """
WITH partvalue AS (
  SELECT l.l_partkey,
         SUM(l.l_extendedprice * (1 - l.l_discount)) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('NATION_7', 'NATION_8', 'NATION_9')
  GROUP BY l.l_partkey
)
SELECT l_partkey, ROUND(value, 2) AS value
FROM partvalue
WHERE value > (SELECT ROUND(SUM(value) * 0.001, 0) FROM partvalue)
""",
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock), adapted to lineitem-as-partsupp
    like q2/q20 (no partsupp table in this dataset; reference domain has
    arbitrary Hive tables, hive.py:224-237). Per-part value concentration
    vs a global-fraction threshold: the HAVING subquery total is the same
    aggregate re-reduced, broadcast as a 1-row literal (crossJoin of a
    scalar, never a driver collect). The per-part aggregation shuffles
    once on l_partkey; the global total is a map-side partial over that
    already-reduced output, so the threshold costs no second scan at
    scale. Threshold rounded to integer on both engines so float
    summation order cannot flip a boundary row (q22 pattern)."""
    nations = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_8", "NATION_9")
    )
    sup_base = read_table(spark, sf_dir, "supplier")
    supp = sup_base.join(
        F.broadcast(nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    li = read_table(spark, sf_dir, "lineitem")
    partvalue = (
        li.join(
            # supp is row-preserving over supplier (unique-key nation
            # lookup) — probe the supplier scan, not the inflated join
            # estimate.
            gated_broadcast(supp.select("s_suppkey"), probe=sup_base),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "value"
            )
        )
    )
    thr = partvalue.agg(F.round(F.sum("value") * 0.001, 0).alias("__thr"))
    return (
        partvalue.crossJoin(F.broadcast(thr))
        .filter(F.col("value") > F.col("__thr"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )
