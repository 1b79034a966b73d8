"""SQL catalog / DDL surface (SURVEY.md §2.12, round 8).

Every other op in the package reads parquet paths and temp views; a
user managing a warehouse goes through the SQL catalog instead:
``CREATE TABLE ... USING parquet`` (managed, written under the
session's spark-warehouse), ``INSERT INTO`` / ``INSERT OVERWRITE ...
PARTITION``, ``DESCRIBE``, ``SHOW PARTITIONS``, ``spark.catalog``
listing, and global temp views. These ops exercise that lifecycle
end-to-end with full DuckDB oracles: the read-back of what DDL+DML
produced must equal the same computation done directly on the source
tables, and catalog introspection results ride along as columns so a
silently-ignored DDL clause (wrong column count, unmanaged table,
missing partition) hash-mismatches instead of passing.

Scale notes: the DDL statements are metadata-only; the INSERTs are
ordinary distributed writes (same path as sink_parquet_partitioned).
Each op localCheckpoints its read-back BEFORE dropping the table in
``finally``, so the returned frame never references dropped state and
repeated runs are self-cleaning (plus a DROP IF EXISTS at entry for
crash leftovers).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import bcount, dsum_sql
from ..sources.tables import load_table

QUERIES: dict = {}
ORACLE: dict = {}


def _tag(sf_dir: str) -> str:
    import os

    return re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(os.path.normpath(sf_dir)))


def sql_catalog_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Managed-table lifecycle through the SQL catalog: CREATE TABLE
    USING parquet with an explicit schema, two INSERT INTO appends
    (even / odd custkeys — proving INSERT appends rather than
    overwrites), DESCRIBE + spark.catalog introspection, aggregate
    read-back, DROP in a finally. The per-segment account-balance
    partials are stored as DECIMAL(30,6) so re-aggregating the two
    appended halves is exact (decimal addition is associative; a
    DOUBLE partial would diverge from the oracle's single exact sum).

    Oracle: the same aggregate recomputed straight from customer, with
    n_inserts = COUNT(DISTINCT parity) per segment and the catalog
    facts as literals — 3 columns, managed, listed."""
    tbl = f"c360_ddl_{_tag(sf_dir)}"
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "catalog_ddl_customer_src"
    )
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"CREATE TABLE {tbl} "
        "(c_mktsegment STRING, n BIGINT, acctbal DECIMAL(30,6)) USING parquet"
    )
    try:
        for parity in (0, 1):
            spark.sql(
                f"INSERT INTO {tbl} "
                "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT), "
                "CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DECIMAL(30,6)) "
                f"FROM catalog_ddl_customer_src WHERE c_custkey % 2 = {parity} "
                "GROUP BY c_mktsegment"
            )
        # Catalog introspection (metadata reads, driver-side by nature):
        # DESCRIBE row set, listColumns count, tableType, listing.
        desc = spark.sql(f"DESCRIBE TABLE {tbl}").where(
            "col_name NOT LIKE '#%' AND col_name <> ''"
        ).collect()
        col_sig = ",".join(f"{r.col_name}:{r.data_type}" for r in desc)
        n_cols = len(spark.catalog.listColumns(tbl))
        managed = spark.catalog.getTable(tbl).tableType == "MANAGED"
        listed = any(t.name == tbl for t in spark.catalog.listTables())
        out = (
            spark.table(tbl)
            .groupBy("c_mktsegment")
            .agg(
                F.sum("n").cast("long").alias("n_customers"),
                F.sum("acctbal").cast("double").alias("acctbal"),
                bcount().alias("n_inserts"),
            )
            .withColumn("n_cols", F.lit(n_cols).cast("long"))
            .withColumn(
                "catalog_ok",
                F.lit(1 if (managed and listed) else 0).cast("long"),
            )
            .withColumn("col_sig", F.lit(col_sig))
        )
        return out.localCheckpoint()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


_DDL_SQL = f"""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {dsum_sql('c_acctbal')} AS acctbal,
       CAST(COUNT(DISTINCT c_custkey % 2) AS BIGINT) AS n_inserts,
       CAST(3 AS BIGINT) AS n_cols,
       CAST(1 AS BIGINT) AS catalog_ok,
       'c_mktsegment:string,n:bigint,acctbal:decimal(30,6)' AS col_sig
FROM customer GROUP BY 1
"""

QUERIES["sql_catalog_ddl"] = sql_catalog_ddl
ORACLE["sql_catalog_ddl"] = _DDL_SQL


def sql_catalog_ctas_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTAS with PARTITIONED BY + static-partition INSERT OVERWRITE:
    the nation×region join is materialized as a managed parquet table
    partitioned by r_name, then exactly the ASIA partition is
    rewritten with versioned names (static PARTITION spec — the other
    four partitions' files are untouched, the partition-granular
    rewrite a warehouse depends on at 100 TB). SHOW PARTITIONS count
    rides along as a column. Read-back aggregates the final state;
    oracle recomputes it with a CASE for the overwritten partition."""
    tbl = f"c360_ctas_{_tag(sf_dir)}"
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("catalog_ctas_nation")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("catalog_ctas_region")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"CREATE TABLE {tbl} USING parquet PARTITIONED BY (r_name) AS "
        "SELECT n.n_nationkey, n.n_name, r.r_name "
        "FROM catalog_ctas_nation n JOIN catalog_ctas_region r "
        "ON n.n_regionkey = r.r_regionkey"
    )
    try:
        spark.sql(
            f"INSERT OVERWRITE TABLE {tbl} PARTITION (r_name = 'ASIA') "
            "SELECT n.n_nationkey, concat(n.n_name, '_V2') "
            "FROM catalog_ctas_nation n JOIN catalog_ctas_region r "
            "ON n.n_regionkey = r.r_regionkey WHERE r.r_name = 'ASIA'"
        )
        n_parts = spark.sql(f"SHOW PARTITIONS {tbl}").count()
        out = (
            spark.table(tbl)
            .groupBy("r_name")
            .agg(
                bcount().alias("n_nations"),
                F.sum(F.when(F.col("n_name").endswith("_V2"), 1).otherwise(0))
                .cast("long")
                .alias("n_v2"),
                F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                    "names"
                ),
            )
            .withColumn("n_partitions", F.lit(n_parts).cast("long"))
        )
        return out.localCheckpoint()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


_CTAS_SQL = """
SELECT r.r_name,
       CAST(COUNT(*) AS BIGINT) AS n_nations,
       CAST(COUNT(*) FILTER (WHERE r.r_name = 'ASIA') AS BIGINT) AS n_v2,
       STRING_AGG(
         CASE WHEN r.r_name = 'ASIA' THEN n.n_name || '_V2' ELSE n.n_name END,
         ','
         ORDER BY CASE WHEN r.r_name = 'ASIA' THEN n.n_name || '_V2'
                       ELSE n.n_name END
       ) AS names,
       (SELECT CAST(COUNT(DISTINCT r_regionkey) AS BIGINT) FROM region)
         AS n_partitions
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
"""

QUERIES["sql_catalog_ctas_partitioned"] = sql_catalog_ctas_partitioned
ORACLE["sql_catalog_ctas_partitioned"] = _CTAS_SQL


def sql_catalog_global_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global temp views: CREATE OR REPLACE GLOBAL TEMPORARY VIEW,
    cross-database read via the global_temp schema, and
    spark.catalog.listTables('global_temp') proving the view is
    actually registered there (the listing flag is an output column —
    a view that silently landed in the wrong database would zero it
    and hash-mismatch). Dropped in a finally via dropGlobalTempView."""
    gname = f"c360_gv_{_tag(sf_dir)}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "catalog_gv_orders_src"
    )
    spark.sql(
        f"CREATE OR REPLACE GLOBAL TEMPORARY VIEW {gname} AS "
        "SELECT o_orderpriority, o_totalprice FROM catalog_gv_orders_src "
        "WHERE o_orderstatus = 'F'"
    )
    try:
        listed = any(
            t.name == gname for t in spark.catalog.listTables("global_temp")
        )
        out = (
            spark.table(f"global_temp.{gname}")
            .groupBy("o_orderpriority")
            .agg(
                bcount().alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
                .cast("double")
                .alias("total"),
            )
            .withColumn("listed", F.lit(1 if listed else 0).cast("long"))
        )
        return out.localCheckpoint()
    finally:
        spark.catalog.dropGlobalTempView(gname)


_GV_SQL = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       {dsum_sql('o_totalprice')} AS total,
       CAST(1 AS BIGINT) AS listed
FROM orders WHERE o_orderstatus = 'F'
GROUP BY 1
"""

QUERIES["sql_catalog_global_view"] = sql_catalog_global_view
ORACLE["sql_catalog_global_view"] = _GV_SQL


def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF (CREATE FUNCTION with a SQL expression body —
    Spark 4's catalog-resident alternative to Python UDFs: the body is
    INLINED into the plan by the analyzer, so it stays whole-stage
    codegen, costs nothing vs writing the expression by hand, and
    needs no Python worker): a priority-discount function applied per
    order, aggregated per priority through the DECIMAL discipline.
    DROP FUNCTION in a finally; result localCheckpointed first."""
    fname = f"c360_disc_{_tag(sf_dir)}"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "catalog_udf_orders"
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {fname}(price DOUBLE, pri STRING) "
        "RETURNS DOUBLE "
        "RETURN CASE WHEN pri LIKE '1-%' THEN price * CAST(0.9 AS DOUBLE) "
        "ELSE price END"
    )
    try:
        out = spark.sql(
            f"""
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST({fname}(o_totalprice, o_orderpriority)
                        AS DECIMAL(30,6))) AS DOUBLE) AS disc_total
            FROM catalog_udf_orders GROUP BY 1
            """
        )
        return out.localCheckpoint()
    finally:
        spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {fname}")


_SQL_UDF_SCALAR_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CASE WHEN o_orderpriority LIKE '1-%'
                          THEN o_totalprice * CAST(0.9 AS DOUBLE)
                          ELSE o_totalprice END AS DECIMAL(30,6)))
            AS DOUBLE) AS disc_total
FROM orders GROUP BY 1
"""

QUERIES["sql_udf_scalar"] = sql_udf_scalar
ORACLE["sql_udf_scalar"] = _SQL_UDF_SCALAR_SQL


def sql_udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL table UDF (CREATE FUNCTION ... RETURNS TABLE — the
    parameterized-view form: callers SELECT FROM f(arg) and the
    analyzer inlines the body as a subquery, so predicates and
    pruning push straight through). The function yields one market
    segment's customers; the op aggregates two invocations to prove
    per-call parameter binding. DROP FUNCTION in a finally."""
    fname = f"c360_seg_{_tag(sf_dir)}"
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "catalog_udtf_customer"
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {fname}(seg STRING) "
        "RETURNS TABLE (c_custkey BIGINT, c_acctbal DOUBLE) "
        "RETURN SELECT c_custkey, c_acctbal "
        "FROM catalog_udtf_customer WHERE c_mktsegment = seg"
    )
    try:
        out = spark.sql(
            f"""
            SELECT seg,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                     AS acctbal,
                   CAST(MAX(c_custkey) AS BIGINT) AS max_key
            FROM (
              SELECT 'BUILDING' AS seg, * FROM {fname}('BUILDING')
              UNION ALL
              SELECT 'MACHINERY' AS seg, * FROM {fname}('MACHINERY')
            ) GROUP BY seg
            """
        )
        return out.localCheckpoint()
    finally:
        spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {fname}")


_SQL_UDF_TABLE_SQL = """
SELECT c_mktsegment AS seg,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS acctbal,
       CAST(MAX(c_custkey) AS BIGINT) AS max_key
FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
GROUP BY 1
"""

QUERIES["sql_udf_table"] = sql_udf_table
ORACLE["sql_udf_table"] = _SQL_UDF_TABLE_SQL


def sql_catalog_alter_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution through the catalog: CREATE TABLE, INSERT the
    even partkeys, ALTER TABLE ADD COLUMNS (brand STRING), INSERT the
    odd partkeys WITH the new column — then one read-back proving (a)
    pre-evolution rows surface NULL for the added column, (b)
    post-evolution rows carry it, (c) the evolved DESCRIBE shape. This
    is the append-only widening every long-lived warehouse table goes
    through; parquet handles it by schema merge at read."""
    tbl = f"c360_alter_{_tag(sf_dir)}"
    load_table(spark, sf_dir, "part").createOrReplaceTempView(
        "catalog_alter_part_src"
    )
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"CREATE TABLE {tbl} (k BIGINT, price DECIMAL(30,6)) USING parquet"
    )
    try:
        spark.sql(
            f"INSERT INTO {tbl} SELECT p_partkey, "
            "CAST(p_retailprice AS DECIMAL(30,6)) "
            "FROM catalog_alter_part_src WHERE p_partkey % 2 = 0"
        )
        spark.sql(f"ALTER TABLE {tbl} ADD COLUMNS (brand STRING)")
        spark.sql(
            f"INSERT INTO {tbl} SELECT p_partkey, "
            "CAST(p_retailprice AS DECIMAL(30,6)), p_brand "
            "FROM catalog_alter_part_src WHERE p_partkey % 2 = 1"
        )
        n_cols_after = len(spark.catalog.listColumns(tbl))
        out = (
            spark.table(tbl)
            .groupBy((F.col("k") % 2 == 1).alias("evolved"))
            .agg(
                bcount().alias("n"),
                bcount("brand").alias("n_brand"),
                F.countDistinct("brand").cast("long").alias("n_brands"),
                F.sum("price").cast("double").alias("price_total"),
            )
            .withColumn("n_cols", F.lit(n_cols_after).cast("long"))
        )
        return out.localCheckpoint()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


_ALTER_SQL = f"""
SELECT (p_partkey % 2 = 1) AS evolved,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(CASE WHEN p_partkey % 2 = 1 THEN p_brand END) AS BIGINT)
         AS n_brand,
       CAST(COUNT(DISTINCT CASE WHEN p_partkey % 2 = 1 THEN p_brand END)
         AS BIGINT) AS n_brands,
       {dsum_sql('p_retailprice')} AS price_total,
       CAST(3 AS BIGINT) AS n_cols
FROM part GROUP BY 1
"""

QUERIES["sql_catalog_alter_evolve"] = sql_catalog_alter_evolve
ORACLE["sql_catalog_alter_evolve"] = _ALTER_SQL


def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER clause + named-parameter SQL (Spark 4): table and
    column names arrive as BOUND PARAMETERS (spark.sql(..., args=...))
    and are resolved through IDENTIFIER(:p) — the injection-safe way
    to template object names, vs string-formatting SQL. The grouping
    column itself is parameter-chosen; a silently-ignored binding
    would group by the wrong column and hash-mismatch."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "catalog_ident_orders"
    )
    out = spark.sql(
        """
        SELECT IDENTIFIER(:grp) AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(IDENTIFIER(:val) AS DECIMAL(30,6))) AS DOUBLE)
                 AS total
        FROM IDENTIFIER(:tbl)
        WHERE IDENTIFIER(:val) > :minv
        GROUP BY IDENTIFIER(:grp)
        """,
        args={
            "grp": "o_orderstatus",
            "val": "o_totalprice",
            "tbl": "catalog_ident_orders",
            "minv": 1000.0,
        },
    )
    return out


_IDENT_SQL = """
SELECT o_orderstatus AS grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
FROM orders WHERE o_totalprice > 1000.0
GROUP BY 1
"""

QUERIES["sql_identifier_clause"] = sql_identifier_clause
ORACLE["sql_identifier_clause"] = _IDENT_SQL


def sql_show_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog introspection statements as row sources: SHOW VIEWS
    LIKE over two probe views (pattern-filtered, so unrelated session
    state can't leak in) and DESCRIBE QUERY over a typed projection —
    the surfaces a SQL IDE calls to autocomplete. Both are
    driver-side metadata reads; the op normalizes them into one
    (kind, name, dtype) frame with a fully literal oracle. The view
    names carry the sf tag for isolation but the tag is stripped from
    the output so the oracle is SF-independent."""
    tag = _tag(sf_dir)
    v1, v2 = f"c360_probe_a_{tag}", f"c360_probe_b_{tag}"
    load_table(spark, sf_dir, "region").createOrReplaceTempView(v1)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(v2)
    try:
        shows = spark.sql(f"SHOW VIEWS LIKE 'c360_probe_*_{tag}'").select(
            F.lit("show").alias("kind"),
            F.replace(
                F.col("viewName"), F.lit(f"_{tag}"), F.lit("")
            ).alias("name"),
            F.lit("view").alias("dtype"),
        )
        desc = spark.sql(
            "DESCRIBE QUERY SELECT CAST(1 AS BIGINT) AS k, 'x' AS s, "
            "CAST(1.5 AS DOUBLE) AS v, CAST(NULL AS TIMESTAMP) AS ts"
        ).select(
            F.lit("describe").alias("kind"),
            F.col("col_name").alias("name"),
            F.col("data_type").alias("dtype"),
        )
        return shows.unionByName(desc).localCheckpoint()
    finally:
        spark.catalog.dropTempView(v1)
        spark.catalog.dropTempView(v2)


_SHOW_DESCRIBE_SQL = """
SELECT * FROM (VALUES
  ('show', 'c360_probe_a', 'view'),
  ('show', 'c360_probe_b', 'view'),
  ('describe', 'k', 'bigint'),
  ('describe', 's', 'string'),
  ('describe', 'v', 'double'),
  ('describe', 'ts', 'timestamp')
) AS t(kind, name, dtype)
"""

QUERIES["sql_show_describe"] = sql_show_describe
ORACLE["sql_show_describe"] = _SHOW_DESCRIBE_SQL
