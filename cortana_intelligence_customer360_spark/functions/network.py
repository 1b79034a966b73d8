"""Network/IP enrichment functions: deterministic IPv4 derivation and
CIDR-block classification via a broadcast range join.

Reference parity: the upstream Customer-360 solution ingests clickstream
with source-address enrichment (SURVEY.md §1.1, §2.12 extension surface;
reference checkout itself is empty, §0 — no file:line to cite). This is
the standard "map an event's IP to a network block" lookup re-expressed
Spark-first.

Scale posture (100 TB): the block table is a handful of rows and is
explicitly ``F.broadcast``-joined, so the event stream never shuffles —
the plan is scan -> project -> broadcast range join -> one aggregate
keyed by (label), with map-side partial aggregation. A real deployment
swaps the inline VALUES dim for a parquet dim table; the plan shape is
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import bcount
from ..sources.tables import load_table

# (label, lo, hi) over the 2^32 IPv4 space — deliberately leaves
# [hi(cdn), 2^32) unassigned so the left-join NULL path is exercised.
_CIDR_BLOCKS = [
    ("corp_net", 0, 2**28 - 1),
    ("dc_east", 2**28, 2**30 - 1),
    ("dc_west", 2**30, 2**31 - 1),
    ("partner", 2**31, 2**31 + 2**29 - 1),
    ("cdn", 2**31 + 2**29, 2**31 + 2**30 - 1),
]

# Knuth multiplicative hash: spreads sequential user ids over the full
# 32-bit space deterministically (same arithmetic in the oracle).
# The multiply is split 16/16: (uid mod 2^32) * _KNUTH would overflow
# int64 for uid near 2^32 (Spark non-ANSI wraps silently, DuckDB
# raises), so both engines compute
#   ((hi*K mod 2^16) << 16 | low 16 bits) form below, whose partial
# products stay < 2^48 — identical value, no overflow at any uid.
_KNUTH = 2654435761
_IP_SPACE = 2**32


def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-network-block event/user rollup: derive a deterministic
    IPv4 (Knuth hash of user_id mod 2^32), classify it against a
    broadcast CIDR block table with a range predicate, and aggregate.

    Unassigned addresses (no covering block) fall out of the left join
    as NULL and are reported under the 'unassigned' label."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    uid = F.col("user_id") % F.lit(_IP_SPACE)
    lo16 = uid % F.lit(65536)
    hi16 = ((uid - lo16) / F.lit(65536)).cast("long")
    ip = (
        ((hi16 * F.lit(_KNUTH)) % F.lit(65536)) * F.lit(65536)
        + lo16 * F.lit(_KNUTH)
    ) % F.lit(_IP_SPACE)
    ips = ev.select(F.col("user_id"), ip.alias("ip32"))
    dim = spark.createDataFrame(_CIDR_BLOCKS, "label string, lo long, hi long")
    joined = ips.join(
        F.broadcast(dim),
        (F.col("ip32") >= F.col("lo")) & (F.col("ip32") <= F.col("hi")),
        "left",
    )
    return (
        joined.select(
            F.coalesce("label", F.lit("unassigned")).alias("net_label"),
            "user_id",
            "ip32",
        )
        .groupBy("net_label")
        .agg(
            bcount().alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.min("ip32").alias("min_ip"),
            F.max("ip32").alias("max_ip"),
        )
    )


def _ip_cidr_sql() -> str:
    vals = ", ".join(f"('{l}', {lo}, {hi})" for l, lo, hi in _CIDR_BLOCKS)
    return f"""
WITH dim(label, lo, hi) AS (VALUES {vals}),
u AS (
  SELECT user_id, (user_id % {_IP_SPACE}) % 65536 AS lo16,
         CAST(((user_id % {_IP_SPACE}) - (user_id % {_IP_SPACE}) % 65536)
              / 65536 AS BIGINT) AS hi16
  FROM events),
ips AS (
  SELECT user_id,
         (((hi16 * {_KNUTH}) % 65536) * 65536 + lo16 * {_KNUTH})
           % {_IP_SPACE} AS ip32
  FROM u)
SELECT COALESCE(dim.label, 'unassigned') AS net_label,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(MIN(ip32) AS BIGINT) AS min_ip,
       CAST(MAX(ip32) AS BIGINT) AS max_ip
FROM ips LEFT JOIN dim ON ips.ip32 BETWEEN dim.lo AND dim.hi
GROUP BY 1
"""



_UA_TEMPLATES = [
    ("Mozilla/5.0 (Windows NT 10.0) Chrome/{v}.0.0 Safari/537.36", "chrome"),
    ("Mozilla/5.0 (Macintosh) Version/{v}.1 Safari/605.1.15", "safari"),
    ("Mozilla/5.0 (X11; Linux) Firefox/{v}.0", "firefox"),
    ("curl/{v}.8.0", "curl"),
]
_UA_VER_RE = "(Chrome|Firefox|curl|Version)/([0-9]+)"


def fn_ua_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-agent family + major-version extraction and rollup. The
    UA string is synthesized in-plan (user_id selects a template,
    version derives from user_id), then parsed back with contains()
    classification and a single RE2-safe regexp_extract (no
    lookaheads — Spark's Java regex and DuckDB's RE2 must agree).
    Classification and extraction are pure codegen'd column exprs;
    one small rollup keyed by family."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    v = (F.col("user_id") % 30 + 70).cast("long")
    pick = F.col("user_id") % 4

    def tpl_expr(i):
        head, tail = _UA_TEMPLATES[i][0].split("{v}")
        return F.concat(F.lit(head), v.cast("string"), F.lit(tail))

    ua = (
        F.when(pick == 0, tpl_expr(0))
        .when(pick == 1, tpl_expr(1))
        .when(pick == 2, tpl_expr(2))
        .otherwise(tpl_expr(3))
    )
    b = ev.select("user_id", ua.alias("ua"))
    family = (
        F.when(F.col("ua").contains("Chrome/"), "chrome")
        .when(F.col("ua").contains("Firefox/"), "firefox")
        .when(F.col("ua").contains("curl/"), "curl")
        .otherwise("safari")
    )
    major = F.regexp_extract("ua", _UA_VER_RE, 2).cast("long")
    return (
        b.select(family.alias("family"), major.alias("major"), "user_id")
        .groupBy("family")
        .agg(
            bcount().alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.min("major").alias("min_major"),
            F.max("major").alias("max_major"),
        )
    )


def _ua_sql() -> str:
    cases = []
    for i, (tpl, _) in enumerate(_UA_TEMPLATES):
        head, tail = tpl.split("{v}")
        cases.append(
            f"WHEN user_id % 4 = {i} THEN "
            f"'{head}' || CAST(user_id % 30 + 70 AS VARCHAR) || '{tail}'"
        )
    case = "CASE " + " ".join(cases) + " ELSE '' END"
    return f"""
WITH b AS (SELECT user_id, {case} AS ua FROM events),
parsed AS (
  SELECT user_id,
         CASE WHEN contains(ua, 'Chrome/') THEN 'chrome'
              WHEN contains(ua, 'Firefox/') THEN 'firefox'
              WHEN contains(ua, 'curl/') THEN 'curl'
              ELSE 'safari' END AS family,
         CAST(regexp_extract(ua, '{_UA_VER_RE}', 2) AS BIGINT) AS major
  FROM b)
SELECT family,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       MIN(major) AS min_major,
       MAX(major) AS max_major
FROM parsed GROUP BY family
"""



QUERIES = {
    "fn_ip_cidr": fn_ip_cidr,
    "fn_ua_parse": fn_ua_parse,
}
ORACLE = {
    "fn_ip_cidr": _ip_cidr_sql(),
    "fn_ua_parse": _ua_sql(),
}
