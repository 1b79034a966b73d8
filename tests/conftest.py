"""Shared fixtures: tuned SparkSession, DuckDB oracle connection, and a
comparator that replicates the driver's correctness gate (row-count +
schema + order-insensitive value-hash; SURVEY.md §5.2).

Default test scale factor is sf0.001 for speed; set
C360_TEST_SF_DIR=/root/testdata/sf0.01 to run at the driver's t2 scale.
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cortana_intelligence_customer360_spark.session import get_spark  # noqa: E402
from cortana_intelligence_customer360_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("C360_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="c360-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def sf001_dir() -> str:
    """The driver's t2 scale (sf0.01), derived from the same testdata
    root as ``sf_dir`` — for the few tests whose semantics need more
    rows than sf0.001 provides."""
    return os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canon_cell(v) -> str:
    """Canonical string for one value — DRIVER-STRICT since round 6.

    The r5 driver hash failure (win_reset_running_sum: rows/schema
    match, hash fail) proved the real driver does NOT fold integral
    floats into ints: a DuckDB HUGEINT column reaches pandas as
    float64 and hashes ``1.0`` against Spark BIGINT's ``1``. The old
    canon here absorbed exactly that difference, so 505 local parity
    tests were green while the driver failed. Floats now keep their
    floatness (``repr``), and only signed zero is normalized (-0.0 ==
    0.0 semantically and both sides can legitimately produce either).
    Decimal→float folding stays: fn_cast_decimal hash-PASSED driver
    round 1, so the driver demonstrably folds Decimal objects."""
    if v is None:
        return "<NULL>"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "<NULL>"
        if f == 0.0:
            f = 0.0
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        f = float(v)
        return canon_cell(f)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    s = str(v)
    return "<NULL>" if s == "NaT" else s


def frame_signature(pdf) -> tuple[int, tuple[str, ...], Counter]:
    cols = sorted(pdf.columns)
    rows = Counter(
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return len(pdf), tuple(cols), rows


def assert_frames_match(spark_df, duck_pdf, qid: str) -> None:
    spark_pdf = spark_df.toPandas()
    n_s, c_s, r_s = frame_signature(spark_pdf)
    n_d, c_d, r_d = frame_signature(duck_pdf)
    assert n_s == n_d, f"{qid}: row count spark={n_s} oracle={n_d}"
    assert c_s == c_d, f"{qid}: columns spark={c_s} oracle={c_d}"
    if r_s != r_d:
        only_s = list((r_s - r_d).items())[:5]
        only_d = list((r_d - r_s).items())[:5]
        raise AssertionError(
            f"{qid}: value mismatch\n  spark-only (5 of {sum((r_s - r_d).values())}): "
            f"{only_s}\n  oracle-only (5 of {sum((r_d - r_s).values())}): {only_d}\n"
            f"  columns: {c_s}"
        )
