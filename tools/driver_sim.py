"""Simulate the driver's verify pass against the __spark_entry__ contract.

Mimics what the driver does (SURVEY.md §5.2), deliberately NOT reusing
the engine's tuned session: builds a vanilla SparkSession exactly as a
third-party caller would, imports __spark_entry__ through the repo
root, runs t1 (entry smoke) and t2 (per-query DuckDB oracle compare at
sf0.01: row-count + schema + order-insensitive value-hash), prints one
JSON line per query and a summary.

Usage: python tools/driver_sim.py [sf_dir] [query_id ...]

A FULL run (no query_id filter) additionally writes
CORRECTNESS_LOCAL.json at the repo root, keyed exactly like the
driver's CORRECTNESS_rN sample ({qid: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}), so the closing sweep's
per-id strict-canon status is an artifact rather than a NOTES.md
claim (verdict-7 item 8). Subset runs never touch the file.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import traceback
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (float, np.floating)):
        # Driver-strict (r6): no integral-float folding — see
        # tests/conftest.py canon_cell for the r5 failure analysis.
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
        return canon(float(v))
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    s = str(v)
    return "<NULL>" if s == "NaT" else s


def signature(pdf):
    cols = sorted(pdf.columns)
    rows = Counter(
        tuple(canon(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return len(pdf), tuple(cols), rows


def main() -> int:
    # Vanilla session - what the driver would build, none of our tuning.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    t0 = time.time()
    n = e.entry(spark).count()
    print(json.dumps({"t1_entry_rows": n, "sec": round(time.time() - t0, 2)}))
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries, oracle = e.queries(), e.oracle_sql()
    ok = bad = 0
    record: dict[str, dict] = {}
    for qid in sorted(queries):
        if ONLY and qid not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = queries[qid](spark, SF_DIR).toPandas()
            if qid in oracle:
                ddf = con.execute(oracle[qid]).df()
                ns, cs, rs = signature(sdf)
                nd, cd, rd = signature(ddf)
                match = (ns, cs) == (nd, cd) and rs == rd
                status = "MATCH" if match else "MISMATCH"
                detail = ""
                if not match:
                    if ns != nd:
                        detail = f"rows {ns} vs {nd}"
                    elif cs != cd:
                        detail = f"cols {cs} vs {cd}"
                    else:
                        ex = list((rs - rd).items())[:2]
                        detail = f"values spark-only={ex}"
                record[qid] = {
                    "rows_match": ns == nd,
                    "schema_match": cs == cd,
                    "hash_match": match,
                    "spark_rows": ns,
                    "oracle_rows": nd,
                    "err": None,
                }
            else:
                status, detail = "ROWS_ONLY", f"rows={len(sdf)}"
                record[qid] = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": len(sdf),
                    "oracle_rows": None,
                    "err": "no_oracle",
                }
            ok += status in ("MATCH", "ROWS_ONLY")
            bad += status == "MISMATCH"
            print(
                json.dumps(
                    {"q": qid, "status": status, "sec": round(time.time() - t0, 2),
                     **({"detail": detail[:400]} if detail else {})}
                )
            )
        except Exception as exc:  # noqa: BLE001
            bad += 1
            print(json.dumps({"q": qid, "status": "ERROR", "err": str(exc)[:300]}))
            traceback.print_exc(limit=3)
            record[qid] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": str(exc)[:300],
            }
    print(json.dumps({"summary": {"ok": ok, "bad": bad, "sf_dir": SF_DIR}}))
    if not ONLY:
        with open(os.path.join(REPO, "CORRECTNESS_LOCAL.json"), "w") as f:
            json.dump(record, f, indent=1)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
