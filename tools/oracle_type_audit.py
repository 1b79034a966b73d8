"""Registry-wide oracle output-type conformance audit.

Round-5 lesson (VERDICT.md r5 "What's wrong"): the driver's value-hash
is type-strict at the pandas-dtype level. DuckDB converts HUGEINT and
DECIMAL output columns to float64 in ``.df()``, so an oracle column
``SUM(int)`` (HUGEINT) hashes as ``1.0`` while the Spark side's BIGINT
hashes as ``1`` — rows/schema match, hash fails (the confirmed
``win_reset_running_sum`` D5 failure). The fix-class is: every oracle's
OUTPUT column types must map to the same pandas dtype class as the
Spark query's schema.

This audit, for every O-tier id in the registry:
  1. builds the Spark DataFrame (lazy — no job run for most ops) and
     reads its schema;
  2. runs ``DESCRIBE <oracle sql>`` in DuckDB (type-only, no rows);
  3. classifies both sides into {int, float, decimal, bool, str, date,
     ts, bin, array<...>, other} and flags:
       - any HUGEINT/UHUGEINT oracle column (always converts float64);
       - DECIMAL oracle column where Spark is not DecimalType;
       - int-vs-float class mismatch in either direction;
       - column-NAME set drift (alias bugs surface as hash noise).

Usage: python tools/oracle_type_audit.py [sf_dir] [qid ...]
Exit 1 if any finding. Also importable: ``audit_one(schema, desc_rows)``
is reused by tests/test_oracle_types.py.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "DOUBLE", "REAL"}


def _duck_class(t: str) -> str:
    t = t.strip().upper()
    if t.endswith("[]"):
        return "array<" + _duck_class(t[:-2]) + ">"
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t in _DUCK_INT:
        return "int"
    if t in _DUCK_FLOAT:
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("VARCHAR", "TEXT", "STRING", "CHAR", "BPCHAR"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t in ("BLOB", "BYTEA", "BINARY", "VARBINARY"):
        return "bin"
    return "other"


def _spark_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return "array<" + _spark_class(dt.elementType) + ">"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.BinaryType):
        return "bin"
    return "other"


# class pairs the driver canon demonstrably absorbs:
#   (decimal, decimal-oracle) both sides decimal — Spark DecimalType vs
#     DuckDB DECIMAL: fn_cast_decimal hash-PASSED D1, so Decimal-vs-
#     float64 folding exists in the driver canon. We still DISALLOW
#     (float-spark, decimal-oracle): decimal-arithmetic rounding can
#     differ bit-wise from the Spark double path, and the r5 verdict
#     ordered those 7 ids terminal-CAST AS DOUBLE. Only a Spark
#     DecimalType output may keep a DECIMAL oracle column.
_ALLOWED = {("decimal", "float"), ("decimal", "decimal")}


def audit_one(spark_schema, desc_rows) -> list[str]:
    """Compare one query's Spark schema against DuckDB DESCRIBE rows.

    desc_rows: list of (column_name, column_type) from the oracle.
    Returns a list of human-readable findings (empty == conformant).
    """
    findings: list[str] = []
    s_names = [f.name for f in spark_schema.fields]
    d_names = [r[0] for r in desc_rows]
    if sorted(s_names) != sorted(d_names):
        findings.append(
            f"column-name drift: spark={sorted(s_names)} oracle={sorted(d_names)}"
        )
        return findings  # name drift makes per-column compare meaningless
    d_types = {r[0]: r[1] for r in desc_rows}
    for f in spark_schema.fields:
        sc = _spark_class(f.dataType)
        dc = _duck_class(d_types[f.name])
        if "hugeint" in dc:
            findings.append(
                f"col {f.name}: oracle {d_types[f.name]} (-> pandas float64)"
                f" vs spark {f.dataType.simpleString()} — CAST the oracle"
                f" column AS BIGINT"
            )
            continue
        if sc == dc or (sc, dc) in _ALLOWED:
            continue
        findings.append(
            f"col {f.name}: class mismatch spark={sc}"
            f" ({f.dataType.simpleString()}) vs oracle={dc} ({d_types[f.name]})"
        )
    return findings


def main() -> int:
    import duckdb

    from cortana_intelligence_customer360_spark.session import get_spark
    from cortana_intelligence_customer360_spark.sources.tables import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="oracle-type-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as e

    queries, oracle = e.queries(), e.oracle_sql()
    n_bad = 0
    for qid in sorted(oracle):
        if only and qid not in only:
            continue
        try:
            schema = queries[qid](spark, sf_dir).schema
            desc = con.execute("DESCRIBE " + oracle[qid]).fetchall()
            findings = audit_one(schema, [(r[0], r[1]) for r in desc])
        except Exception as exc:  # noqa: BLE001
            findings = [f"audit error: {exc!r:.300}"]
        for msg in findings:
            print(f"{qid}: {msg}")
        n_bad += bool(findings)
    print(f"# audited={len(only) if only else len(oracle)} flagged={n_bad}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
