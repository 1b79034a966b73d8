"""From-scratch mergeable HyperLogLog built on deterministic md5
hashing — the register math of Flajolet et al. (HLL, AofA 2007)
expressed as two keyed aggregates, with NO approximation ambiguity:
every step (hash, bucket, rank, register max, harmonic sum) is a pure
integer/exact-binary-fraction function of the input keys, so the whole
sketch is bit-reproducible across engines and a full DuckDB oracle
applies (unlike the engine-native approx_count_distinct, which is
R-tier by design).

Reference parity: SURVEY.md §2.12 sketch surface (reference checkout
empty, §0). Complements agg_approx_distinct (native HLL++, R-tier) and
agg_sketch_merge: this one shows the ALGORITHM as data-parallel
relational ops and proves mergeability by re-aggregating the same
register table.

Scale posture (100 TB): pass 1 groups by (event_type, bucket) — at most
|types| x 256 rows survive, with map-side combine doing nearly all the
work executor-locally; pass 2 folds the tiny register table twice (per
group + merged-over-all-groups). Nothing shuffles at data volume; the
register table is driver-size but never collected.

Determinism note: the harmonic sum adds 256 exact binary fractions
2^-M[j] (M <= 33), every partial sum a multiple of 2^-33 below 2^9 —
exactly representable in a double, so the sum is order-independent and
identical in both engines. The only transcendental (ln in the
small-range correction) is formula-mirrored and rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import bcount
from ..sources.tables import load_table

_HLL_M = 256  # 2^8 buckets: first hex byte of the md5
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)  # bias constant, m >= 128


def registers_from(ev: DataFrame) -> DataFrame:
    """(event_type, bucket, reg): HLL register table from any
    (event_type, user_id) frame — batch or a micro-batch (the
    streaming merge in streaming.ops.stream_hll_merge reuses this,
    relying on max-merge idempotence).

    bucket = first md5 byte; rank = leading-zeros+1 of the next 32
    hash bits, computed via length(bin(x)) — pure integer, no log2
    rounding hazard."""
    h = F.md5(F.col("user_id").cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    x = F.conv(F.substring(h, 3, 8), 16, 10).cast("long")
    rho = F.when(x == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(x))
    )
    return (
        ev.select(
            "event_type", bucket.alias("bucket"), rho.alias("rho")
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").cast("int").alias("reg"))
    )


def _registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return registers_from(ev)


def _estimate(regs: DataFrame, key: str) -> DataFrame:
    m = F.lit(float(_HLL_M))
    n_present = bcount()
    sum_inv = F.sum(F.pow(F.lit(2.0), -F.col("reg"))) + (
        m - n_present.cast("double")
    )
    empty = (F.lit(_HLL_M) - n_present).cast("long")
    agg = regs.groupBy(key).agg(
        n_present.alias("n_buckets"),
        empty.alias("n_empty"),
        (F.lit(_HLL_ALPHA) * m * m / sum_inv).alias("e_raw"),
    )
    # Flajolet small-range correction: linear counting when the raw
    # estimate is small and empty buckets remain.
    est = F.when(
        (F.col("e_raw") <= 2.5 * _HLL_M) & (F.col("n_empty") > 0),
        F.lit(float(_HLL_M)) * F.log(m / F.col("n_empty").cast("double")),
    ).otherwise(F.col("e_raw"))
    return agg.select(
        F.col(key),
        "n_buckets",
        "n_empty",
        F.round(est, 6).alias("hll_estimate"),
    )


def hll_output(regs: DataFrame) -> DataFrame:
    """Per-group estimates + the '__all__' bucketwise-max merge from
    any register table (shared with the streaming merge path)."""
    per_group = _estimate(regs, "event_type")
    merged_regs = (
        regs.groupBy("bucket")
        .agg(F.max("reg").cast("int").alias("reg"))
        .withColumn("event_type", F.lit("__all__"))
    )
    merged = _estimate(merged_regs, "event_type")
    return per_group.unionByName(merged)


def agg_hll_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user HLL estimate per event_type PLUS the merged
    '__all__' sketch, where merge = bucketwise register max over the
    per-group register table — demonstrating the property that makes
    HLL the 100-TB distinct-count answer (partial sketches union
    losslessly without re-reading data)."""
    return hll_output(_registers(spark, sf_dir))


def _hll_sql() -> str:
    alpha = repr(_HLL_ALPHA)
    m = _HLL_M
    return f"""
WITH hashed AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::BIGINT
           AS bucket,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 8))::BIGINT
           AS x
  FROM events),
regs AS (
  SELECT event_type, CAST(bucket AS INT) AS bucket,
         CAST(MAX(CASE WHEN x = 0 THEN 33 ELSE 33 - length(bin(x)) END)
              AS INT) AS reg
  FROM hashed GROUP BY event_type, bucket),
allregs AS (
  SELECT '__all__' AS event_type, bucket, CAST(MAX(reg) AS INT) AS reg
  FROM regs GROUP BY bucket),
both_regs AS (SELECT * FROM regs UNION ALL SELECT * FROM allregs),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_buckets,
         CAST({m} - COUNT(*) AS BIGINT) AS n_empty,
         CAST({alpha} AS DOUBLE) * {m}.0 * {m}.0
           / (SUM(power(2.0, -reg)) + ({m}.0 - COUNT(*))) AS e_raw
  FROM both_regs GROUP BY event_type)
SELECT event_type, n_buckets, n_empty,
       round(CASE WHEN e_raw <= 2.5 * {m} AND n_empty > 0
                  THEN {m}.0 * ln({m}.0 / n_empty)
                  ELSE e_raw END, 6) AS hll_estimate
FROM agg
"""


_CMS_D = 4  # hash rows
_CMS_W = 256  # buckets per row


def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch count-min sketch (Cormode & Muthukrishnan 2005)
    over event_type frequencies, with the point-estimate readback and
    the exact count side-by-side — overestimate-only error visible in
    the output. Like agg_hll_custom, hashing is md5-derived, so the
    sketch is bit-reproducible and carries a full DuckDB oracle.

    Scale posture: the sketch build is ONE groupBy over (row, bucket)
    — at most d*w = 1024 cells survive regardless of input size, and
    map-side combine collapses almost everything executor-locally
    (the d-fold explode multiplies rows before combine, never across
    the wire). The readback joins the distinct-key table against the
    broadcast cell table. Sketches from different partitions/days
    merge by cellwise addition — the property the 1024-cell shape
    exists for."""
    ev = load_table(spark, sf_dir, "events").select("event_type")
    rows = F.explode(F.array(*[F.lit(r) for r in range(_CMS_D)])).alias("r")
    cells = (
        ev.select("event_type", rows)
        .select(
            "r",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(":", F.col("r"), F.col("event_type"))
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % _CMS_W
            ).alias("bucket"),
        )
        .groupBy("r", "bucket")
        .agg(bcount().alias("cnt"))
    )
    keys = ev.groupBy("event_type").agg(bcount().alias("exact_count"))
    probes = keys.select(
        "event_type",
        "exact_count",
        F.explode(F.array(*[F.lit(r) for r in range(_CMS_D)])).alias("r"),
    ).select(
        "event_type",
        "exact_count",
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("r"), F.col("event_type"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        ).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("event_type", "exact_count")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        "event_type",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).alias("overcount"),
    )


def _cms_sql() -> str:
    rows = ", ".join(f"({r})" for r in range(_CMS_D))
    return f"""
WITH r(r) AS (VALUES {rows}),
hashed AS (
  SELECT r.r,
         ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || event_type),
                         1, 8))::BIGINT % {_CMS_W} AS bucket
  FROM events CROSS JOIN r),
cells AS (
  SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM hashed GROUP BY r, bucket),
keys AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_count
  FROM events GROUP BY event_type),
probes AS (
  SELECT k.event_type, k.exact_count, r.r,
         ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || k.event_type),
                         1, 8))::BIGINT % {_CMS_W} AS bucket
  FROM keys k CROSS JOIN r)
SELECT p.event_type, p.exact_count,
       MIN(c.cnt) AS cms_estimate,
       MIN(c.cnt) - p.exact_count AS overcount
FROM probes p JOIN cells c USING (r, bucket)
GROUP BY p.event_type, p.exact_count
"""


QUERIES = {
    "agg_hll_custom": agg_hll_custom,
    "agg_count_min": agg_count_min,
}
ORACLE = {
    "agg_hll_custom": _hll_sql(),
    "agg_count_min": _cms_sql(),
}
