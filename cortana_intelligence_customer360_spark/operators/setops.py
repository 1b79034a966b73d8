"""Sort / limit / top-k / set operators (SURVEY.md §2.6).

Global sorts are range-partitioned by Spark (sampled boundaries), so
they scale; the pinned row_number() is only for oracle determinism and
every ordering carries a unique-key tiebreak (compat rule 7). Top-k
compiles to TakeOrderedAndProject - a per-partition heap + driver
merge, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import epoch_us
from ..sources.tables import EVENT_TYPES, load_table


def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort; emits the rank to make the (order-
    insensitive) oracle hash actually verify the ordering."""
    orders = load_table(spark, sf_dir, "orders")
    ordering = [
        F.col("o_orderdate").desc_nulls_last(),
        F.col("o_totalprice").asc_nulls_last(),
        F.col("o_orderkey").asc(),
    ]
    w = Window.orderBy(*ordering)
    return (
        orders.orderBy(*ordering)
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "o_orderkey",
            epoch_us("o_orderdate").alias("o_orderdate_us"),
            "o_totalprice",
        )
    )


_SORT_SQL = """
SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_orderdate DESC NULLS LAST,
                               o_totalprice ASC NULLS LAST,
                               o_orderkey ASC) AS BIGINT) AS rank,
       o_orderkey,
       epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
       o_totalprice
FROM orders
"""


def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 most expensive orders - TakeOrderedAndProject, tie-broken."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset union of custkeys from 'O' and 'F' status orders."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    f = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return o.unionByName(f)


_UNION_ALL_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct union of customer keys seen in orders or events."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    return (
        orders.select(F.col("o_custkey").alias("custkey"))
        .union(events.select(F.col("user_id").alias("custkey")))
        .distinct()
    )


_UNION_DISTINCT_SQL = """
SELECT o_custkey AS custkey FROM orders
UNION
SELECT user_id FROM events
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custkeys appearing in both orders and events (distinct)."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    return orders.select(F.col("o_custkey").alias("custkey")).intersect(
        events.select(F.col("user_id").alias("custkey"))
    )


_INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders
INTERSECT
SELECT user_id FROM events
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custkeys in customer but not in orders (EXCEPT distinct
    semantics = DataFrame.subtract)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.select(F.col("c_custkey").alias("custkey")).subtract(
        orders.select(F.col("o_custkey").alias("custkey"))
    )


_EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders
"""


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL: custkeys kept min(m, n) times across the
    'O'-status and 'F'-status order multisets. Spark's intersectAll is
    a single aggregate-count-per-side + generate plan — one shuffle on
    the key, no join blow-up on hot keys."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    f = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return o.intersectAll(f)


_INTERSECT_ALL_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL: each custkey kept max(m - n, 0) times
    (orders-minus-events multiset difference on the shared key space)."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    return orders.select(F.col("o_custkey").alias("custkey")).exceptAll(
        events.select(F.col("user_id").alias("custkey"))
    )


_EXCEPT_ALL_SQL = """
SELECT o_custkey AS custkey FROM orders
EXCEPT ALL
SELECT user_id FROM events
"""


def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort on a genuinely nullable key with EXPLICIT null placement —
    the cross-engine trap this op exists to pin: Spark's default is
    NULLS FIRST for ASC, DuckDB's is NULLS LAST, so any sort on a
    nullable key that doesn't spell out the placement silently differs
    between engines. NULLIF manufactures the nulls (zero-balance
    customers), rank makes the ordering hash-verifiable."""
    cust = load_table(spark, sf_dir, "customer")
    nullable_bal = F.when(F.col("c_acctbal") < 0, None).otherwise(
        F.col("c_acctbal")
    )
    ordering = [
        F.col("bal_or_null").asc_nulls_first(),
        F.col("c_custkey").asc(),
    ]
    w = Window.orderBy(*ordering)
    return (
        cust.select("c_custkey", nullable_bal.alias("bal_or_null"))
        .orderBy(*ordering)
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "c_custkey",
            "bal_or_null",
        )
    )


_SORT_NULLS_SQL = """
WITH c AS (
  SELECT c_custkey,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null
  FROM customer)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY bal_or_null ASC NULLS FIRST,
                               c_custkey ASC) AS BIGINT) AS rank,
       c_custkey, bal_or_null
FROM c
"""


def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the inverse of agg_pivot — fold the per-type
    event-count matrix back into (user_id, event_type, n) rows.
    Wide->long reshape is map-only (each row expands in place, no
    shuffle beyond the pivot's own aggregation)."""
    from ..operators.aggregates import event_type_pivot

    ev = load_table(spark, sf_dir, "events")
    wide = event_type_pivot(ev)
    value_cols = [c for c in wide.columns if c.startswith("n_")]
    return (
        wide.unpivot("user_id", value_cols, "event_type", "n")
        .withColumn("event_type", F.expr("substring(event_type, 3)"))
        .where(F.col("n") > 0)
    )


def _unpivot_sql() -> str:
    from ..operators.aggregates import pivot_oracle_sql

    return f"""
WITH wide AS ({pivot_oracle_sql()}),
long AS (
  UNPIVOT wide ON {', '.join(f'n_{t}' for t in sorted(EVENT_TYPES))}
  INTO NAME event_type VALUE n)
SELECT user_id, substring(event_type, 3) AS event_type, n
FROM long WHERE n > 0
"""



# ---------------------------------------------------------------------------
# Z-order (Morton) layout key — multi-dimensional data clustering.

_SPREAD_STEPS = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _spread16(col: Column) -> Column:
    """Interleave-ready bit spread of a 16-bit value (abcd -> a0b0c0d0)."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def _spread16_sql(expr: str) -> str:
    x = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """32-bit Morton interleave of two 16-bit dimensions.

    Callers must pre-scale dimensions to comparable bit-widths (see
    :func:`scale16` / :func:`sort_zorder`): interleaving a ~11-bit key
    with a ~7-bit key leaves every high interleaved bit owned by the
    wider key, and range-splits then cluster only that dimension."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def scale16(col: Column, mn: Column, mx: Column) -> Column:
    """Min/max-scale a key to the full 16-bit domain (exact IEEE floor
    of an exact-integer product/quotient — cross-engine stable).
    A degenerate (constant) dimension scales to 0 rather than 0/0,
    whose NaN/null handling is engine-dependent."""
    return F.when(mx == mn, F.lit(0).cast("long")).otherwise(
        F.floor(((col - mn) * 65535) / (mx - mn)).cast("long")
    )


def _scale16_sql(expr: str, mn: str, mx: str) -> str:
    return (
        f"CASE WHEN {mx} = {mn} THEN 0 ELSE "
        f"CAST(floor((({expr}) - {mn}) * 65535 / ({mx} - {mn})) AS BIGINT)"
        f" END"
    )


_ZORDER_TOPN = 200


def sort_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-interleave) layout key over two join dimensions.

    The 100 TB story: range-partitioning + sorting a fact table by
    ``zorder_key(scale16(l_partkey), scale16(l_suppkey))`` clusters
    BOTH dimensions into narrow per-file min/max ranges simultaneously,
    so parquet data skipping prunes scans filtered on either key — the
    standard lakehouse multi-dim clustering technique
    (tests/test_semantics.py asserts the span shrink on written files).
    Each dimension is min/max-scaled to 16 bits first (one cheap
    min/max scan, broadcast back as a 1-row literal frame) — without
    it, the wider key owns every high interleaved bit. The key itself
    is pure bit arithmetic (mask-shift spread, whole-stage codegen).
    The query form returns the first ``_ZORDER_TOPN`` rows in z-order —
    a TakeOrderedAndProject, never a full global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_partkey").alias("mn_p"),
        F.max("l_partkey").alias("mx_p"),
        F.min("l_suppkey").alias("mn_s"),
        F.max("l_suppkey").alias("mx_s"),
    )
    zkey = zorder_key(
        scale16(F.col("l_partkey"), F.col("mn_p"), F.col("mx_p")),
        scale16(F.col("l_suppkey"), F.col("mn_s"), F.col("mx_s")),
    )
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            zkey.alias("zkey"),
        )
        .orderBy("zkey", "l_orderkey", "l_linenumber")
        .limit(_ZORDER_TOPN)
    )


_ZORDER_SQL = f"""
WITH b AS (
  SELECT MIN(l_partkey) AS mn_p, MAX(l_partkey) AS mx_p,
         MIN(l_suppkey) AS mn_s, MAX(l_suppkey) AS mx_s
  FROM lineitem)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       ({_spread16_sql(_scale16_sql('l_partkey', 'mn_p', 'mx_p'))}
        | ({_spread16_sql(_scale16_sql('l_suppkey', 'mn_s', 'mx_s'))} << 1)) AS zkey
FROM lineitem CROSS JOIN b
ORDER BY zkey, l_orderkey, l_linenumber
LIMIT {_ZORDER_TOPN}
"""


def agg_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (Spark 4.0 API — the last uncovered
    DataFrame reshape): flip the per-type metric matrix so METRICS
    become rows and event types become columns, the report-friendly
    orientation of agg_pivot's user matrix. transpose() materializes
    the index column's values as column names (ascending), which is
    driver-bounded by the TYPE DOMAIN — a dimension, never data-scale;
    the upstream aggregate is the only shuffle. Metrics are cast to
    one common type (double, 6 dp where libm is involved) because
    transpose unifies all value columns to a least common type."""
    from ..compat import bcount, dsum

    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        bcount().cast("double").alias("n_events"),
        F.round(dsum("value"), 6).alias("sum_value"),
        F.count_distinct(F.col("user_id")).cast("double").alias("n_users"),
    )
    return m.transpose("event_type")


def _transpose_sql() -> str:
    from ..compat import dsum_sql

    types = sorted(EVENT_TYPES)
    rows = []
    for metric in ("n_events", "sum_value", "n_users"):
        cells = ", ".join(
            f"MAX(CASE WHEN event_type = '{t}' THEN {metric} END) AS {t}"
            for t in types
        )
        rows.append(f"SELECT '{metric}' AS key, {cells} FROM m")
    body = "\nUNION ALL\n".join(rows)
    return f"""
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n_events,
         round({dsum_sql('value')}, 6) AS sum_value,
         CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
  FROM events GROUP BY 1)
{body}
"""


QUERIES = {
    "agg_transpose": agg_transpose,
    "sort_nulls_ordering": sort_nulls_ordering,
    "sort_zorder": sort_zorder,
    "agg_unpivot": agg_unpivot,
    "sort_multikey": sort_multikey,
    "topk_global": topk_global,
    "set_union_all": set_union_all,
    "set_union_distinct": set_union_distinct,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "set_intersect_all": set_intersect_all,
    "set_except_all": set_except_all,
}

ORACLE = {
    "agg_transpose": _transpose_sql(),
    "sort_nulls_ordering": _SORT_NULLS_SQL,
    "sort_zorder": _ZORDER_SQL,
    "agg_unpivot": _unpivot_sql(),
    "sort_multikey": _SORT_SQL,
    "topk_global": _TOPK_SQL,
    "set_union_all": _UNION_ALL_SQL,
    "set_union_distinct": _UNION_DISTINCT_SQL,
    "set_intersect": _INTERSECT_SQL,
    "set_except": _EXCEPT_SQL,
    "set_intersect_all": _INTERSECT_ALL_SQL,
    "set_except_all": _EXCEPT_ALL_SQL,
}


def agg_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts by (MIN retail price,
    MAX size): a part survives iff no other part is at most as
    expensive AND at least as big with one strict — the multi-
    criteria shortlist operator (cheapest-per-capability).

    NO quadratic dominance join: sort-sweep rewrite — group to
    distinct prices with their max size, take the running max of size
    over STRICTLY cheaper prices (deterministic price-bucket prefix
    max: per-bucket maxima + a tiny bucket-offset frame, the value-
    bucket discipline), and keep parts whose size equals their price
    group's max and strictly exceeds that prefix. Exact integer/
    2-decimal comparisons throughout.
    """
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("size"),
    )
    grp = parts.groupBy("price").agg(F.max("size").alias("gmax"))
    grp = grp.withColumn("bkt", F.floor(F.col("price") / F.lit(64.0)).cast("long"))
    bmax = grp.groupBy("bkt").agg(F.max("gmax").alias("bm"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = bmax.withColumn("prevb", F.max("bm").over(wb)).select("bkt", "prevb")
    wloc = Window.partitionBy("bkt").orderBy("price").rowsBetween(
        Window.unboundedPreceding, -1
    )
    pref = (
        grp.join(F.broadcast(boff), "bkt")
        .withColumn("prevloc", F.max("gmax").over(wloc))
        .select(
            "price",
            "gmax",
            F.greatest(
                F.coalesce("prevb", F.lit(-1).cast("long")),
                F.coalesce("prevloc", F.lit(-1).cast("long")),
            ).alias("prefmax"),
        )
    )
    return (
        parts.join(pref, "price")
        .where((F.col("size") == F.col("gmax")) & (F.col("size") > F.col("prefmax")))
        .select("p_partkey", "price", "size")
        .orderBy("price", "p_partkey")
    )


_SKYLINE_SQL = """
WITH parts AS (
  SELECT p_partkey, p_retailprice AS price, CAST(p_size AS BIGINT) AS size
  FROM part),
grp AS (SELECT price, MAX(size) AS gmax FROM parts GROUP BY price),
pref AS (
  SELECT price, gmax,
         COALESCE(MAX(gmax) OVER (ORDER BY price
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           CAST(-1 AS BIGINT)) AS prefmax
  FROM grp)
SELECT p.p_partkey, p.price, p.size
FROM parts p JOIN pref ON p.price = pref.price
WHERE p.size = pref.gmax AND p.size > pref.prefmax
ORDER BY p.price, p.p_partkey
"""

QUERIES["agg_skyline_2d"] = agg_skyline_2d
ORACLE["agg_skyline_2d"] = _SKYLINE_SQL
