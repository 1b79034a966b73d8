"""Composed TPC-H-shaped showcase queries (beyond the SURVEY §2
inventory): multi-join + aggregate + top-k pipelines exercising the
relational core end to end, with the same oracle discipline.

Q1/Q5/Q6 shapes already exist as agg_pricing_summary /
join_star_multiway / filter_conjunct; these add the Q3 (shipping
priority: join-filter-agg-topk) and Q10 (returned items: wide join +
revenue ranking) compositions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import bcount, dsum, dsum_sql, epoch_us
from ..sources.tables import load_table


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: revenue of undelivered orders for one segment, top 10
    by revenue. Filters push into all three scans before the joins."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            epoch_us("o_orderdate").alias("o_orderdate_us"),
            "o_orderpriority",
        )
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q3_SQL = f"""
SELECT l_orderkey,
       epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
       o_orderpriority,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: customers who returned items in a quarter, ranked by
    lost revenue - the churn-risk report of the customer-360 world."""
    lo = F.lit("1995-10-01").cast("timestamp")
    hi = F.lit("1996-01-01").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dsum(revenue).alias("revenue"), bcount().alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
GROUP BY 1, 2, 3, 4, 5
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue per nation where supplier and customer share
    the nation, within one region. Dims (nation, region, supplier)
    broadcast; only the lineitem-orders join shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"), bcount().alias("n_items"))
    )


_Q5_SQL = f"""
SELECT n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by ship
    year (supplier nation != customer nation). The nation dim joins
    twice under different roles - broadcast both."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = ("NATION_2", "NATION_7")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .where(
            F.col("supp_nation").isin(*pair)
            & F.col("cust_nation").isin(*pair)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(dsum(revenue).alias("revenue"))
    )


_Q7_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_2', 'NATION_7')
  AND cn.n_name IN ('NATION_2', 'NATION_7')
  AND sn.n_name != cn.n_name
GROUP BY 1, 2, 3
"""


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo-part revenue share by ship month. Both operands
    of the ratio are exact decimal sums cast to double, so the division
    is one deterministic IEEE op on identical inputs in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), revenue).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(
                F.lit(100.0) * dsum(promo) / dsum(revenue), 6
            ).alias("promo_pct"),
            bcount().alias("n_items"),
        )
    )


_Q14_SQL = f"""
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       round(100.0 * {dsum_sql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             / {dsum_sql('l_extendedprice * (1 - l_discount)')}, 6) AS promo_pct,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds 300, with their
    customer - aggregate lineitem FIRST (map-side partial sum), then
    join only the ~100 qualifying orders to the dims."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "l_orderkey",
            epoch_us("o_orderdate").alias("o_orderdate_us"),
            "o_totalprice",
            "total_qty",
        )
    )


_Q18_SQL = """
SELECT c_custkey, c_name, l_orderkey,
       epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
       o_totalprice,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2, 3, 4, 5
HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
"""


def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (adapted: no l_commitdate/l_receiptdate in this schema;
    "late" = shipped >60 days after order): orders in a quarter that
    had at least one late line, counted by priority. The EXISTS becomes
    a LEFT SEMI join — one shuffle on orderkey, lineitem never
    materializes into the output, and the date disjunct on the probe
    side pushes into the lineitem scan."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(bcount().alias("order_count"))


_Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
"""


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one supplier nation's share of PROMO-part revenue sold
    to ASIA customers, by order year. Both ratio operands are exact
    decimal sums cast to double, so the division is one deterministic
    IEEE op; dims broadcast, only lineitem-orders shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    share = F.when(F.col("supp_nation") == "NATION_3", revenue).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(dsum(share) / dsum(revenue), 6).alias("mkt_share"),
            bcount().alias("n_items"),
        )
    )


_Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round({dsum_sql("CASE WHEN sn.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             / {dsum_sql('l_extendedprice * (1 - l_discount)')}, 6) AS mkt_share,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN part      ON l_partkey = p_partkey
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region    ON cn.n_regionkey = r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
GROUP BY 1
"""


def tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (adapted: l_linestatus stands in for the absent
    l_shipmode; "late" = shipped >=90 days after order): per line
    status, how many late lines came from high- vs low-priority
    orders. Conditional counts stay JVM-side as sum-of-when."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        & (F.year("l_shipdate") == 1997)
    )
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
    )


_Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
  AND year(l_shipdate) = 1997
GROUP BY 1
"""


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) with the maximum quarterly revenue. The
    per-supplier revenue is an exact decimal sum (identical double in
    both engines), so the max-equality self-comparison is determinate.
    The scalar max broadcasts; revenue aggregates before any join."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(dsum(revenue).alias("total_revenue"))
    mx = per_supp.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under a three-branch brand/size/quantity
    disjunction. The part-only conjuncts (brand+size) are pushable
    per-branch; the cross-table disjunction evaluates after the
    broadcast join, still inside codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    brand = F.col("p_brand")
    cond = (
        ((brand == "Brand#11") & size.between(1, 15) & qty.between(1, 11))
        | ((brand == "Brand#12") & size.between(1, 25) & qty.between(10, 20))
        | ((brand == "Brand#13") & size.between(1, 35) & qty.between(20, 30))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(dsum(revenue).alias("revenue"), bcount().alias("n_items"))
    )


_Q19_SQL = f"""
SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (adapted: c_mktsegment stands in for the absent phone
    country code): customers with above-average positive balance and no
    orders at all, grouped by segment. The above-average test is done
    in EXACT decimal (`acctbal * n > decimal_sum`) instead of comparing
    against a float mean, so no row can flip on a cross-engine ulp; the
    no-orders test is a LEFT ANTI join on custkey."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    stats = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(30,6)")).alias("bal_sum"),
        bcount().alias("n_pos"),
    )
    rich = cust.crossJoin(F.broadcast(stats)).where(
        F.col("c_acctbal").cast("decimal(30,6)") * F.col("n_pos") > F.col("bal_sum")
    )
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        bcount().alias("n_cust"), dsum("c_acctbal").alias("total_bal")
    )


_Q22_SQL = f"""
WITH s AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS bal_sum,
         CAST(COUNT(*) AS BIGINT) AS n_pos
  FROM customer WHERE c_acctbal > 0.0)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       {dsum_sql('c_acctbal')} AS total_bal
FROM customer, s
WHERE CAST(c_acctbal AS DECIMAL(30,6)) * n_pos > bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1
"""


QUERIES = {
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q10_returned_items": tpch_q10_returned_items,
    "tpch_q5_local_supplier": tpch_q5_local_supplier,
    "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
    "tpch_q14_promo_revenue": tpch_q14_promo_revenue,
    "tpch_q18_large_volume": tpch_q18_large_volume,
    "tpch_q4_order_priority": tpch_q4_order_priority,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q12_late_lines": tpch_q12_late_lines,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q19_disjunctive": tpch_q19_disjunctive,
    "tpch_q22_idle_customers": tpch_q22_idle_customers,
}

ORACLE = {
    "tpch_q3_shipping_priority": _Q3_SQL,
    "tpch_q10_returned_items": _Q10_SQL,
    "tpch_q5_local_supplier": _Q5_SQL,
    "tpch_q7_volume_shipping": _Q7_SQL,
    "tpch_q14_promo_revenue": _Q14_SQL,
    "tpch_q18_large_volume": _Q18_SQL,
    "tpch_q4_order_priority": _Q4_SQL,
    "tpch_q8_market_share": _Q8_SQL,
    "tpch_q12_late_lines": _Q12_SQL,
    "tpch_q15_top_supplier": _Q15_SQL,
    "tpch_q19_disjunctive": _Q19_SQL,
    "tpch_q22_idle_customers": _Q22_SQL,
}
