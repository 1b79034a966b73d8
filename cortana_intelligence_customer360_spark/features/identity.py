"""Identity resolution — the Customer-360 flagship: stitch per-source
customer records (CRM / web / store) into one golden customer via
shared match keys and distributed connected components.

Reference parity: the upstream Customer-360 solution's core promise is
a unified customer profile across source systems (SURVEY.md §1.1;
reference checkout itself is empty, §0 — no file:line to cite). This
is that entity-resolution step, Spark-first.

Record derivation is deterministic from the customer table so a full
DuckDB oracle applies: each customer yields a CRM record (email +
phone), a web record (email only), and a store record (phone only).
Households share a phone line (every customer with custkey % 40 == 1
uses custkey-1's phone), so some clusters legitimately span two
customers — the "two people, one account" case every real MDM system
must merge or survive.

Scale posture (100 TB): match-key blocking, never pairwise. Records
explode to (key_type, key_value) postings; each posting list emits a
STAR of edges to its minimum record id (|bucket|-1 edges, not
|bucket|² pairs); components come from the large-star/small-star
O(log² n) algorithm shared with dedup_cluster_stars — the same code
path proven on near-dup graphs. No step is quadratic in records or
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmops.dedup import _star_components
from ..sources.tables import load_table

_SOURCES = ["crm", "web", "store"]
_HOUSEHOLD_MOD = 40  # custkey % 40 == 1 shares custkey-1's phone


def _records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(record_id, custkey, source, email_key, phone_key): the
    per-source record table. email/phone keys are integer surrogates
    of the normalized values (what a real pipeline gets after
    lower/strip/E.164)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    phone = F.when(
        F.col("custkey") % _HOUSEHOLD_MOD == 1, F.col("custkey") - 1
    ).otherwise(F.col("custkey"))
    src = F.explode(
        F.array(*[F.lit(s) for s in _SOURCES])
    ).alias("source")
    recs = cust.select("custkey", phone.alias("phone"), src)
    src_idx = F.array_position(
        F.array(*[F.lit(s) for s in _SOURCES]), F.col("source")
    ).cast("long")
    return recs.select(
        (F.col("custkey") * 3 + src_idx - 1).alias("record_id"),
        "custkey",
        "source",
        F.when(F.col("source").isin("crm", "web"), F.col("custkey")).alias(
            "email_key"
        ),
        F.when(F.col("source").isin("crm", "store"), F.col("phone")).alias(
            "phone_key"
        ),
    )


def feat_identity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record mapping: every source record labeled with its
    resolved cluster (= min record_id of its identity component) plus
    the cluster's span (#records, #custkeys) — households resolve to
    multi-customer clusters, everyone else to exactly their three
    records."""
    recs = _records(spark, sf_dir)
    postings = recs.select(
        "record_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("e").alias("kt"), F.col("email_key").alias("kv")
                ),
                F.struct(
                    F.lit("p").alias("kt"), F.col("phone_key").alias("kv")
                ),
            )
        ).alias("k"),
    ).select("record_id", "k.kt", "k.kv").where(F.col("kv").isNotNull())
    hubs = postings.groupBy("kt", "kv").agg(
        F.min("record_id").alias("hub")
    )
    edges = (
        postings.join(hubs, ["kt", "kv"])
        .where(F.col("record_id") != F.col("hub"))
        .select(
            F.col("hub").alias("a_id"), F.col("record_id").alias("b_id")
        )
        .distinct()
    )
    nodes = recs.select(F.col("record_id").alias("doc_id"))
    comp = _star_components(nodes, edges).select(
        F.col("doc_id").alias("record_id"), "cluster_id"
    )
    labeled = recs.join(comp, "record_id")
    stats = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.countDistinct("custkey").cast("long").alias("n_custkeys"),
    )
    return labeled.join(stats, "cluster_id").select(
        "record_id", "custkey", "source", "cluster_id", "n_records",
        "n_custkeys",
    )


def _identity_sql() -> str:
    return f"""
WITH RECURSIVE recs AS (
  SELECT c_custkey * 3 + s.idx AS record_id,
         c_custkey AS custkey,
         s.source,
         CASE WHEN s.source IN ('crm', 'web') THEN c_custkey END
           AS email_key,
         CASE WHEN s.source IN ('crm', 'store') THEN
           CASE WHEN c_custkey % {_HOUSEHOLD_MOD} = 1
                THEN c_custkey - 1 ELSE c_custkey END END AS phone_key
  FROM customer
  CROSS JOIN (VALUES (0, 'crm'), (1, 'web'), (2, 'store')) s(idx, source)),
postings AS (
  SELECT record_id, 'e' AS kt, email_key AS kv FROM recs
    WHERE email_key IS NOT NULL
  UNION ALL
  SELECT record_id, 'p', phone_key FROM recs WHERE phone_key IS NOT NULL),
hubs AS (
  SELECT kt, kv, MIN(record_id) AS hub FROM postings GROUP BY kt, kv),
edges0 AS (
  SELECT DISTINCT h.hub AS a, p.record_id AS b
  FROM postings p JOIN hubs h USING (kt, kv)
  WHERE p.record_id <> h.hub),
edges AS (
  SELECT a AS u, b AS v FROM edges0
  UNION SELECT b, a FROM edges0),
reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
comp AS (
  SELECT rr.record_id,
         CAST(LEAST(rr.record_id, COALESCE(MIN(r.v), rr.record_id))
              AS BIGINT) AS cluster_id
  FROM recs rr LEFT JOIN reach r ON r.u = rr.record_id
  GROUP BY rr.record_id),
labeled AS (
  SELECT recs.record_id, recs.custkey, recs.source, comp.cluster_id
  FROM recs JOIN comp USING (record_id)),
stats AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_records,
         CAST(COUNT(DISTINCT custkey) AS BIGINT) AS n_custkeys
  FROM labeled GROUP BY cluster_id)
SELECT record_id, custkey, source, cluster_id, n_records, n_custkeys
FROM labeled JOIN stats USING (cluster_id)
"""


QUERIES = {
    "feat_identity_resolution": feat_identity_resolution,
}
ORACLE = {
    "feat_identity_resolution": _identity_sql(),
}
