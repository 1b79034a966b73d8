"""pandas-on-Spark API surface (SURVEY.md §2.12, round 8).

``pyspark.pandas`` is the third query dialect Spark ships (DataFrame,
SQL, pandas API) and the one a pandas-native data scientist reaches
for first; an engine claiming the full PySpark surface needs it
exercised end-to-end. The op round-trips Spark -> pandas-on-Spark ->
(assign / groupby / agg / sort) -> Spark, all of which compiles to the
same Catalyst plans as the native API — no driver-side pandas, no
collect.

Exactness note: pandas-on-Spark sums of doubles inherit Spark's
partition-order nondeterminism, so the money column is converted to
exact integer CENTS before entering the pandas API; the int64 sums
are exact and the final dollars division is one deterministic IEEE op
(ml_logreg_newton's integer-pinning discipline applied to an API
surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES: dict = {}
ORACLE: dict = {}


def ps_groupby_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A representative pandas-API pipeline over orders: derive cents,
    filter, groupby priority with a multi-agg dict, flatten, sort —
    then hand back a Spark frame. Every step stays lazy/distributed
    (checked in tests: the result plan has the same one-exchange
    hash-aggregate shape as the native groupBy)."""
    import pyspark.pandas as ps  # noqa: F401 (import gates the surface)

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    pdf = od.pandas_api()
    pdf = pdf[pdf["cents"] > 0]
    pdf = pdf.assign(big=(pdf["cents"] > 20_000_000).astype("int64"))
    agg = (
        pdf.groupby("o_orderpriority")
        .agg({"cents": "sum", "o_orderkey": "count", "big": "sum"})
        .reset_index()
    )
    out = agg.to_spark()
    return out.select(
        "o_orderpriority",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.col("o_orderkey").cast("long").alias("n_orders"),
        F.col("big").cast("long").alias("n_big"),
    )


_PS_SQL = """
SELECT o_orderpriority,
       CAST(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
            / 100.0 AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (
         WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 20000000)
         AS BIGINT) AS n_big
FROM orders
WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
GROUP BY o_orderpriority
"""

QUERIES["ps_groupby_pipeline"] = ps_groupby_pipeline
ORACLE["ps_groupby_pipeline"] = _PS_SQL


def ps_merge_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-API depth (verdict-8 item 4): merge two independently
    aggregated frames, fillna, and a rolling 3-month window — the
    monthly-revenue trend report a pandas user writes verbatim, kept
    distributed end-to-end and handed back to Spark.

    Pipeline: monthly revenue (exact integer cents) MERGEd left with
    monthly urgent-order counts (missing months -> 0 via fillna),
    set_index('ym').sort_index() — the idiom that pins the frame's
    natural row order to the index BEFORE .rolling(), since ps rolling
    windows follow natural order, not index order (a frame sorted with
    sort_values then column-assigned reverts to pre-sort order; caught
    while prototyping) — then rolling(3, min_periods=1) sum/count.

    Exactness: rolling SUM over int64 cents stays int64 (exact); the
    two emitted floats are single IEEE divisions on exact integers
    (cents/100, (sum/n)/100), so no rounding canon is needed. Scale:
    both inputs collapse to month cardinality (~84 rows) before the
    merge; the rolling window is metadata-sized however big orders
    is — the same one-fact-aggregate-then-tiny-walk shape as
    ts_ses_grid's month series."""
    import pyspark.pandas as pps  # noqa: F401 (import gates the surface)

    od = load_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderpriority",
    )
    rev = (
        od.select("ym", "cents")
        .pandas_api()
        .groupby("ym")
        .agg({"cents": "sum"})
        .reset_index()
    )
    urgent = (
        od.where(F.col("o_orderpriority") == "1-URGENT")
        .select("ym")
        .pandas_api()
        .groupby("ym")
        .size()
        .rename("n_urgent")
        .reset_index()
    )
    m = rev.merge(urgent, on="ym", how="left")
    m["n_urgent"] = m["n_urgent"].fillna(0).astype("int64")
    m = m.set_index("ym").sort_index()
    roll = m["cents"].rolling(3, min_periods=1)
    m["roll_sum"] = roll.sum()
    m["roll_n"] = roll.count().astype("int64")
    out = m.reset_index().to_spark()
    return out.select(
        "ym",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.col("n_urgent").cast("long").alias("n_urgent"),
        (
            (F.col("roll_sum").cast("double") / F.col("roll_n").cast("double"))
            / 100.0
        ).alias("roll3_avg_revenue"),
    )


_PS_MERGE_SQL = """
WITH rev AS (
  SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS ym,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
urg AS (
  SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS ym,
         CAST(COUNT(*) AS BIGINT) AS n_urgent
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
m AS (
  SELECT r.ym, r.cents, COALESCE(u.n_urgent, 0) AS n_urgent
  FROM rev r LEFT JOIN urg u ON r.ym = u.ym)
SELECT ym,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       n_urgent,
       (CAST(SUM(cents) OVER w AS DOUBLE)
        / CAST(COUNT(*) OVER w AS DOUBLE)) / 100.0 AS roll3_avg_revenue
FROM m
WINDOW w AS (ORDER BY ym ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""

QUERIES["ps_merge_rolling"] = ps_merge_rolling
ORACLE["ps_merge_rolling"] = _PS_MERGE_SQL


def ps_resample_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-API third op (verdict-9 item 5): datetime indexing, a
    .loc date-range slice, and a resample('ME') monthly regrid — the
    calendar-regrid idiom a pandas user reaches for instead of a
    GROUP BY, kept distributed end-to-end.

    Pipeline: exact daily cents/order-count frame -> pandas_api ->
    set_index('d').sort_index() -> .loc['1996-01-01':'1998-12-31']
    (inclusive bounds, the pandas contract) -> resample('ME').sum()
    -> to_spark. Two API footguns pinned here (both caught while
    prototyping, tests/test_round10.py): (1) resample AFTER a .loc
    slice throws UNRESOLVED_COLUMN `__index_level_0__` — the sliced
    frame's internal index column is gone; the reset_index().
    set_index('d') round-trip rebuilds it. (2) resample's fillna(0.0)
    casts the int64 sums to DOUBLE on the way out — exact here
    because monthly cent totals sit far below 2^53, and the op casts
    back to BIGINT before emitting so the oracle compares integers.

    Resample bin semantics replayed in SQL: month-END labels
    (rule 'ME'), bins spanning month(min(d))..month(max(d)) of the
    SLICED data, empty months filled with 0 — DuckDB's
    generate_series + LEFT JOIN. Scale: the fact table collapses to
    day grain before entering the pandas API; resample's filler bins
    are a LocalRelation of month cardinality (driver-side but bounded
    by the calendar, not the data)."""
    import pyspark.pandas as pps  # noqa: F401 (import gates the surface)

    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("timestamp").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    daily = od.groupBy("d").agg(
        F.sum("cents").alias("cents"), F.count(F.lit(1)).alias("n")
    )
    pdf = daily.pandas_api().set_index("d").sort_index()
    sliced = pdf.loc["1996-01-01":"1998-12-31"]
    sliced = sliced.reset_index().set_index("d")  # footgun (1)
    monthly = sliced.resample("ME").sum()
    out = monthly.reset_index().to_spark()
    # month_end as a STRING label (ps_merge_rolling's ym precedent):
    # DuckDB's .df() widens DATE to datetime64, which canonizes with a
    # T00:00:00 suffix and hash-splits against a true date column.
    return out.select(
        F.date_format(F.col("index"), "yyyy-MM-dd").alias("month_end"),
        (F.col("cents").cast("long").cast("double") / 100.0).alias("revenue"),
        F.col("n").cast("long").alias("n_orders"),
    )


_PS_RESAMPLE_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS TIMESTAMP) AS d,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders
  WHERE CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
    AND CAST(o_orderdate AS TIMESTAMP) <= TIMESTAMP '1998-12-31'
  GROUP BY 1),
bounds AS (
  SELECT date_trunc('month', MIN(d)) AS lo, date_trunc('month', MAX(d)) AS hi
  FROM daily),
months AS (
  -- list-form generate_series: the table-function form only takes
  -- constants in DuckDB, the scalar/list form takes expressions
  SELECT last_day(CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH))
                       AS DATE)) AS month_end
  FROM bounds),
agg AS (
  SELECT last_day(CAST(d AS DATE)) AS month_end,
         SUM(cents) AS cents, SUM(n) AS n
  FROM daily GROUP BY 1)
SELECT strftime(m.month_end, '%Y-%m-%d') AS month_end,
       CAST(COALESCE(a.cents, 0) AS DOUBLE) / 100.0 AS revenue,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_orders
FROM months m LEFT JOIN agg a USING (month_end)
"""

QUERIES["ps_resample_monthly"] = ps_resample_monthly
ORACLE["ps_resample_monthly"] = _PS_RESAMPLE_SQL


_PS_IDX_LO = 1_000
_PS_IDX_HI = 20_000


def ps_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-API fourth op (verdict-10 item 5): the INDEX round-trip
    idioms — pandas_api(index_col=...), an integer .loc index slice,
    index-aligned column assignment, and to_spark(index_col=...) that
    must hand the index back as a real column, all distributed.

    Pipeline: orders keyed by o_orderkey as the ps index (exact
    integer cents discipline) -> sort_index() -> .loc[LO:HI] (pandas
    contract: both bounds INCLUSIVE, replayed as BETWEEN in the
    oracle) -> an index-derived assignment (key parity from
    .index % 2 — exercises index arithmetic, not just row filtering)
    -> to_spark(index_col='o_orderkey') -> one exact aggregate per
    parity group.

    Exactness: the index is int64 end-to-end; cents sums are int64;
    the one emitted double is a single IEEE division. Scale: the .loc
    slice compiles to a Catalyst range filter on the index column
    (predicate-pushdown-able — no driver materialization; asserted in
    tests/test_round11.py via the plan), and the output is
    parity-group cardinality (2 rows)."""
    import pyspark.pandas as pps  # noqa: F401 (import gates the surface)

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    pdf = od.pandas_api(index_col="o_orderkey").sort_index()
    sliced = pdf.loc[_PS_IDX_LO:_PS_IDX_HI]
    sliced = sliced.assign(parity=(sliced.index % 2).to_series())
    back = sliced.to_spark(index_col="o_orderkey")
    return (
        back.groupBy(F.col("parity").cast("int").alias("parity"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("o_orderkey").cast("long").alias("first_key"),
            F.max("o_orderkey").cast("long").alias("last_key"),
            (F.sum("cents").cast("double") / 100.0).alias("revenue"),
        )
        .orderBy("parity")
    )


_PS_IDX_SQL = f"""
SELECT CAST(o_orderkey % 2 AS INT) AS parity,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS last_key,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue
FROM orders
WHERE o_orderkey BETWEEN {_PS_IDX_LO} AND {_PS_IDX_HI}
GROUP BY 1
"""

QUERIES["ps_index_roundtrip"] = ps_index_roundtrip
ORACLE["ps_index_roundtrip"] = _PS_IDX_SQL
