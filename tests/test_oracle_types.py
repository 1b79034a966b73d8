"""Registry-wide oracle OUTPUT-TYPE conformance — the r6 gate born from
the round-5 driver hash failure.

``win_reset_running_sum`` failed the driver in r05 with rows_match and
schema_match true but hash_match false: the oracle's ``SUM(int)``
window emitted HUGEINT, which DuckDB converts to float64 in ``.df()``,
so the driver hashed ``1.0`` against Spark BIGINT's ``1``. The parity
suite missed it because the old canon folded integral floats.

This test closes the class structurally: for EVERY O-tier id, DuckDB
``DESCRIBE <oracle>`` column types must map to the same pandas-dtype
class as the Spark query's schema (tools/oracle_type_audit.audit_one):
no HUGEINT/UHUGEINT ever, DECIMAL only when the Spark side is
DecimalType, no int-vs-float cross-class drift, and identical column
name sets. DESCRIBE is type-only (no rows scanned), and the Spark side
only builds the plan, so the whole registry audits in seconds per id.
"""

from __future__ import annotations

import pytest

from cortana_intelligence_customer360_spark import registry
from tools.oracle_type_audit import audit_one

QUERIES, ORACLE = registry.build()


@pytest.mark.parametrize("qid", sorted(ORACLE))
def test_oracle_output_types(qid, spark, duck, sf_dir):
    schema = QUERIES[qid](spark, sf_dir).schema
    desc = duck.execute("DESCRIBE " + ORACLE[qid]).fetchall()
    findings = audit_one(schema, [(r[0], r[1]) for r in desc])
    assert not findings, f"{qid}: " + "; ".join(findings)
