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

from pyspark.sql import DataFrame, SparkSession, Window
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


# -- mergeable quantile sketch (bottom-k / KMV sample) ----------------------

_QSK_K = 256  # sample size per group
_QSK_SHARDS = 64  # stage-1 fan-out; scale with cluster size, not data
_QSK_QS = (0.25, 0.5, 0.75, 0.9)


def _qsk_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_returnflag, price, rk): every lineitem row with its
    deterministic md5 priority over the unique (orderkey, linenumber)
    row key — the KMV 'uniform random draw' both engines can replay."""
    li = load_table(spark, sf_dir, "lineitem")
    rk = F.md5(
        F.concat_ws(
            ":",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        )
    )
    return li.select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        rk.alias("rk"),
    )


def bottomk_sample(rows: DataFrame, two_level: bool) -> DataFrame:
    """Keep the _QSK_K rows with smallest md5 priority per group.

    ``two_level=True`` is the mergeable/distributed form, prefixed by a
    KMV priority pre-filter: priorities are uniform hex strings, so the
    true bottom-k of a group of n rows all but surely lie below the
    16k/n priority quantile. A per-group threshold (hex-15 prefix of
    ceil(2^60 * 16k / n), string-compared — lexicographic order on
    lowercase hex IS numeric order) cuts the window input from n rows
    to ~16k per group as a map-only broadcast-join filter, so the
    bottom-k sorts never touch the fact table; the full scan only
    computes md5 + one string compare per row. P(filter drops a true
    bottom-k row) = P(Binomial(n, 16k/n) < k) < e^-2800 — zero at any
    scale; groups under 32k rows skip the filter entirely ('g' sorts
    above every hex digest). Stage 1 then keeps the k smallest per
    (group, shard) — the per-shard sketches a partitioned pipeline
    would persist — and stage 2 merges shard sketches by re-taking the
    k smallest of the union. min-k is associative, so this equals the
    direct single-level bottom-k EXACTLY (pinned by tests — the
    two_level=False path runs UNfiltered, so the equality test also
    proves the filter lossless — and by sharing one oracle)."""
    if two_level:
        counts = rows.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("_n_g")
        )
        t60 = F.ceil(
            F.lit(float(1 << 60)) * F.lit(16.0 * _QSK_K) / F.col("_n_g")
        ).cast("long")
        thr = F.when(
            F.col("_n_g") <= F.lit(32 * _QSK_K), F.lit("g")
        ).otherwise(F.lpad(F.lower(F.hex(t60)), 15, "0"))
        rows = rows.join(
            F.broadcast(counts.select("l_returnflag", thr.alias("_thr"))),
            "l_returnflag",
        ).where(F.col("rk") < F.col("_thr")).drop("_thr")
        shard = F.pmod(F.xxhash64("rk"), F.lit(_QSK_SHARDS))
        w1 = Window.partitionBy("l_returnflag", "shard").orderBy("rk")
        rows = (
            rows.withColumn("shard", shard)
            .withColumn("rn1", F.row_number().over(w1))
            .where(F.col("rn1") <= _QSK_K)
            .drop("rn1", "shard")
        )
    w2 = Window.partitionBy("l_returnflag").orderBy("rk")
    return (
        rows.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= _QSK_K)
        .drop("rn")
    )


def quantiles_from_sample(sample: DataFrame) -> DataFrame:
    """Quantile readback: element at position ceil(q*n) of the kept
    sample ordered by (value, priority) — a pure element pick, no
    interpolation, so cross-engine equality is exact."""
    wv = Window.partitionBy("l_returnflag").orderBy("price", "rk")
    wn = Window.partitionBy("l_returnflag")
    pos = sample.withColumn("vn", F.row_number().over(wv)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    qcols = [
        F.max(
            F.when(
                F.col("vn")
                == F.greatest(
                    F.lit(1), F.ceil(F.lit(q) * F.col("n")).cast("long")
                ),
                F.col("price"),
            )
        ).alias(f"q{int(q * 100)}")
        for q in _QSK_QS
    ]
    return pos.groupBy("l_returnflag").agg(
        F.max("n").cast("long").alias("n_sample"), *qcols
    )


def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch per group: a deterministic bottom-k
    (KMV-style) sample — keep the _QSK_K rows with the smallest md5
    priority — then read quantiles off the kept sample.

    Completes the md5-deterministic sketch triad (distinct =
    agg_hll_custom, frequency = agg_count_min, quantile = this): like
    those, every step is an exact integer/string function of the input,
    so unlike native approx_percentile (R-tier) this carries a FULL
    DuckDB oracle.

    Mergeability is not just claimed — the query RUNS the merged form:
    stage 1 computes independent per-shard sketches (the per-partition/
    per-day sketches a 100 TB pipeline would persist), stage 2 merges
    them by re-taking the k smallest priorities of the shard union.
    min-k associativity makes that bit-identical to the direct
    single-level sample, which is what the oracle computes and what
    tests/test_property.py pins Spark-vs-Spark.

    Scale posture: the KMV threshold pre-filter (see bottomk_sample)
    reduces the fact table to ~16k rows per group map-only before any
    window runs, so the only per-row work at data scale is md5 + one
    string compare; stage 1's window then partitions the filtered
    residue by (group, shard) and stage 2 sorts a set bounded by
    groups x shards x k. Error: a k-sample gives quantile rank error
    ~1/sqrt(k) (~6% at k=256), independent of data size."""
    sample = bottomk_sample(_qsk_rows(spark, sf_dir), two_level=True)
    return quantiles_from_sample(sample)


def _qsk_sql() -> str:
    qcols = ",\n       ".join(
        f"MAX(CASE WHEN vn = GREATEST(1, CAST(ceil({q} * n) AS BIGINT)) "
        f"THEN price END) AS q{int(q * 100)}"
        for q in _QSK_QS
    )
    return f"""
WITH base AS (
  SELECT l_returnflag,
         CAST(l_extendedprice AS DOUBLE) AS price,
         md5(CAST(l_orderkey AS VARCHAR) || ':' ||
             CAST(l_linenumber AS VARCHAR)) AS rk
  FROM lineitem),
keep AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY l_returnflag ORDER BY rk)
              AS rn
    FROM base)
  WHERE rn <= {_QSK_K}),
pos AS (
  SELECT l_returnflag, price,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY price, rk) AS vn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM keep)
SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_sample,
       {qcols}
FROM pos GROUP BY l_returnflag
"""


# -- mergeable Bloom membership sketch --------------------------------------

_BF_M = 1024  # bits
_BF_K = 3  # hash functions


def _bf_pos(i: int, col: str):
    """md5-derived bit position i for a key column — same arithmetic
    the oracle replays (CMS-style seeded digest slices)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(str(i)), F.col(col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _BF_M
    )


def agg_bloom_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch mergeable Bloom filter per event_type over the
    type's user set, plus the '__all__' merged filter (merge = bit OR
    = set union of positions — executed, not claimed), probed with
    every customer key so the one-sided error is visible in the
    output: n_bloom >= n_exact always (no false negatives, pinned in
    tests), and n_false_pos shows the FP cost of m=1024/k=3.

    Completes the deterministic sketch quartet (distinct = HLL,
    frequency = count-min, quantile = bottom-k, membership = this);
    like its siblings, md5-derived positions make every step an exact
    function of the input, so a FULL DuckDB oracle applies.

    Scale posture: the build is distinct + explode(k) + distinct —
    at most |types| x m position rows survive, map-side combine does
    the heavy lifting; the probe side joins against the BROADCAST
    position table (a real pipeline ships exactly this tiny bit table
    to prune a 100 TB scan — the manual form of join_bloom_runtime's
    engine-injected filter)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    users = ev.select("user_id").distinct()
    pos_arr = F.array(*[_bf_pos(i, "user_id") for i in range(_BF_K)])
    bits0 = ev.select(
        "event_type", F.explode(pos_arr).alias("pos")
    ).distinct()
    bits = bits0.unionByName(
        bits0.select(F.lit("__all__").alias("event_type"), "pos").distinct()
    )
    n_bits = bits.groupBy("event_type").agg(bcount().alias("n_bits_set"))

    types = bits.select("event_type").distinct()
    probes = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"))
        .crossJoin(F.broadcast(types))
    )
    ppos = probes.select(
        "user_id", "event_type", F.explode(pos_arr).alias("pos")
    )
    nhit = (
        ppos.join(F.broadcast(bits), ["event_type", "pos"], "left_semi")
        .groupBy("user_id", "event_type")
        .agg(bcount().alias("nhit"))
    )
    ev_ext = ev.unionByName(
        users.select(F.lit("__all__").alias("event_type"), "user_id")
    ).withColumn("is_member", F.lit(1))
    flags = (
        probes.join(nhit, ["user_id", "event_type"], "left")
        .join(ev_ext, ["user_id", "event_type"], "left")
        .select(
            "event_type",
            F.coalesce("is_member", F.lit(0)).alias("exact"),
            F.when(F.coalesce("nhit", F.lit(0)) == _BF_K, 1)
            .otherwise(0)
            .alias("bloom"),
        )
    )
    agg = flags.groupBy("event_type").agg(
        bcount().alias("n_probes"),
        F.sum("exact").cast("long").alias("n_exact"),
        F.sum("bloom").cast("long").alias("n_bloom"),
        (F.sum("bloom") - F.sum("exact")).cast("long").alias("n_false_pos"),
    )
    return agg.join(n_bits, "event_type")


def _bloom_sql() -> str:
    ivals = ", ".join(f"({i})" for i in range(_BF_K))
    pos = (
        "('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || "
        f"CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % {_BF_M}"
    )
    return f"""
WITH i(i) AS (VALUES {ivals}),
ev AS (SELECT DISTINCT event_type, user_id FROM events),
users AS (SELECT DISTINCT user_id FROM events),
bits0 AS (
  SELECT DISTINCT event_type, {pos} AS pos FROM ev CROSS JOIN i),
bits AS (
  SELECT event_type, pos FROM bits0
  UNION
  SELECT '__all__', pos FROM bits0),
nbits AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_bits_set
  FROM bits GROUP BY event_type),
types AS (SELECT DISTINCT event_type FROM bits),
probes AS (
  SELECT c_custkey AS user_id, event_type FROM customer CROSS JOIN types),
ppos AS (
  SELECT user_id, event_type, {pos} AS pos FROM probes CROSS JOIN i),
nhit AS (
  SELECT pp.user_id, pp.event_type, CAST(COUNT(*) AS BIGINT) AS nhit
  FROM ppos pp
  WHERE EXISTS (SELECT 1 FROM bits b
                WHERE b.event_type = pp.event_type AND b.pos = pp.pos)
  GROUP BY 1, 2),
ev_ext AS (
  SELECT event_type, user_id FROM ev
  UNION
  SELECT '__all__', user_id FROM users),
flags AS (
  SELECT p.event_type,
         CASE WHEN e.user_id IS NOT NULL THEN 1 ELSE 0 END AS exact,
         CASE WHEN COALESCE(h.nhit, 0) = {_BF_K} THEN 1 ELSE 0 END AS bloom
  FROM probes p
  LEFT JOIN nhit h ON h.user_id = p.user_id AND h.event_type = p.event_type
  LEFT JOIN ev_ext e ON e.user_id = p.user_id AND e.event_type = p.event_type)
SELECT f.event_type, CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(exact) AS BIGINT) AS n_exact,
       CAST(SUM(bloom) AS BIGINT) AS n_bloom,
       CAST(SUM(bloom) - SUM(exact) AS BIGINT) AS n_false_pos,
       MAX(nb.n_bits_set) AS n_bits_set
FROM flags f JOIN nbits nb ON nb.event_type = f.event_type
GROUP BY f.event_type
"""


# -- theta-sketch set algebra (KMV bottom-k over user sets) -----------------

_TH_K = 64  # sketch size; estimator active once |A ∪ B| > k


def agg_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV sketch SET ALGEBRA: distinct-user union and
    intersection estimates for every event-type pair, computed only
    from the per-type bottom-k sketches — the sketch operation that
    answers "how many users did both X and Y" on a 100 TB event log
    without a pairwise distinct-count over the raw data.

    Math (Dasgupta et al., the Theta Sketch Framework): θ = k-th
    smallest md5 priority in A∪B's combined sample. Below θ, sample
    membership equals set membership (θ <= θ_A, θ_B), so
    |A∪B| ≈ (k-1)/θ and |A∩B| ≈ |{h < θ: in both samples}|/θ. When
    the union sample holds fewer than k users the sketches ARE the
    sets and both estimates are exact — both engines branch on the
    same condition. md5 priorities make every step deterministic, so
    a FULL DuckDB oracle applies; the exact intersection is computed
    alongside so the sketch error is visible in the output.

    Scale posture: the only data-sized work is one distinct over
    (event_type, user_id) (map-side combine) and one self-equi-join
    on user_id for the exact column; every pairwise step runs on
    |types| x k sampled rows. The per-type bottom-k window takes the
    same KMV threshold pre-filter as bottomk_sample at scale."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .withColumn("h", F.md5(F.col("user_id").cast("string")))
    )
    wt = Window.partitionBy("event_type").orderBy("h")
    sample = (
        ev.withColumn("rn", F.row_number().over(wt))
        .where(F.col("rn") <= _TH_K)
        .drop("rn")
    )
    types = ev.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .crossJoin(types.select(F.col("event_type").alias("type_b")))
        .where(F.col("type_a") < F.col("type_b"))
    )
    sa = pairs.join(sample, sample.event_type == pairs.type_a).select(
        "type_a", "type_b", "user_id", "h",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    sb = pairs.join(sample, sample.event_type == pairs.type_b).select(
        "type_a", "type_b", "user_id", "h",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    u = (
        sa.unionByName(sb)
        .groupBy("type_a", "type_b", "user_id", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("type_a", "type_b").orderBy("h")
    ranked = u.withColumn("rn", F.row_number().over(wp))
    t60 = F.conv(F.substring("h", 1, 15), 16, 10).cast("double")
    two60 = float(1 << 60)
    per_pair = ranked.groupBy("type_a", "type_b").agg(
        bcount().alias("n_union_sample"),
        F.max(F.when(F.col("rn") == _TH_K, t60)).alias("t60"),
        F.sum(
            F.when(
                (F.col("rn") < _TH_K) & (F.col("in_a") + F.col("in_b") == 2), 1
            ).otherwise(0)
        ).cast("long").alias("rho"),
        F.sum((F.col("in_a") + F.col("in_b") == 2).cast("int"))
        .cast("long")
        .alias("inter_sample"),
    )
    est = per_pair.select(
        "type_a",
        "type_b",
        "n_union_sample",
        F.when(
            F.col("n_union_sample") < _TH_K,
            F.col("n_union_sample").cast("double"),
        )
        .otherwise(
            F.round(F.lit(float(_TH_K - 1)) * two60 / F.col("t60"), 6)
        )
        .alias("union_est"),
        F.when(
            F.col("n_union_sample") < _TH_K,
            F.col("inter_sample").cast("double"),
        )
        .otherwise(
            F.round(F.col("rho").cast("double") * two60 / F.col("t60"), 6)
        )
        .alias("inter_est"),
    )
    ea = ev.select(F.col("event_type").alias("type_a"), "user_id")
    eb = ev.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        ea.join(eb, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(bcount().alias("n_exact_inter"))
    )
    return est.join(exact, ["type_a", "type_b"], "left").select(
        "type_a",
        "type_b",
        "n_union_sample",
        "union_est",
        "inter_est",
        F.coalesce("n_exact_inter", F.lit(0).cast("long")).alias(
            "n_exact_inter"
        ),
    )


def _theta_sql() -> str:
    two60 = float(1 << 60)
    return f"""
WITH ev AS (
  SELECT DISTINCT event_type, user_id,
         md5(CAST(user_id AS VARCHAR)) AS h
  FROM events),
sample AS (
  SELECT * FROM (
    SELECT event_type, user_id, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM ev)
  WHERE rn <= {_TH_K}),
types AS (SELECT DISTINCT event_type FROM ev),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a CROSS JOIN types b WHERE a.event_type < b.event_type),
u AS (
  SELECT type_a, type_b, user_id, h,
         MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM (
    SELECT p.type_a, p.type_b, s.user_id, s.h, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN sample s ON s.event_type = p.type_a
    UNION ALL
    SELECT p.type_a, p.type_b, s.user_id, s.h, 0, 1
    FROM pairs p JOIN sample s ON s.event_type = p.type_b)
  GROUP BY type_a, type_b, user_id, h),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn,
         CAST(('0x' || substr(h, 1, 15))::BIGINT AS DOUBLE) AS t60
  FROM u),
per_pair AS (
  SELECT type_a, type_b,
         CAST(COUNT(*) AS BIGINT) AS n_union_sample,
         MAX(CASE WHEN rn = {_TH_K} THEN t60 END) AS t60,
         CAST(SUM(CASE WHEN rn < {_TH_K} AND in_a + in_b = 2
                       THEN 1 ELSE 0 END) AS BIGINT) AS rho,
         CAST(SUM(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END)
              AS BIGINT) AS inter_sample
  FROM ranked GROUP BY type_a, type_b),
est AS (
  SELECT type_a, type_b, n_union_sample,
         CASE WHEN n_union_sample < {_TH_K}
              THEN CAST(n_union_sample AS DOUBLE)
              ELSE round({float(_TH_K - 1)} * {two60} / t60, 6)
         END AS union_est,
         CASE WHEN n_union_sample < {_TH_K}
              THEN CAST(inter_sample AS DOUBLE)
              ELSE round(CAST(rho AS DOUBLE) * {two60} / t60, 6)
         END AS inter_est
  FROM per_pair),
exact AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_exact_inter
  FROM ev a JOIN ev b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT e.type_a, e.type_b, e.n_union_sample, e.union_est, e.inter_est,
       COALESCE(x.n_exact_inter, 0) AS n_exact_inter
FROM est e LEFT JOIN exact x
  ON x.type_a = e.type_a AND x.type_b = e.type_b
"""


QUERIES = {
    "agg_hll_custom": agg_hll_custom,
    "agg_count_min": agg_count_min,
    "agg_quantile_sketch": agg_quantile_sketch,
    "agg_bloom_custom": agg_bloom_custom,
    "agg_theta_setops": agg_theta_setops,
}
ORACLE = {
    "agg_hll_custom": _hll_sql(),
    "agg_count_min": _cms_sql(),
    "agg_quantile_sketch": _qsk_sql(),
    "agg_bloom_custom": _bloom_sql(),
    "agg_theta_setops": _theta_sql(),
}
