"""Decompose the sql_scripting trio (verdict-11 item 2): where does
the wall go — the one distributed seed aggregate, or the per-statement
scripting-interpreter iteration?

Times, in one warmed JVM:
  a) the seed aggregate alone (plain SQL, collect)
  b) the full script op (noop sink, as benched)
  c) a synthetic script with the same seed but ZERO loop iterations
  d) a synthetic script with 4x the loop iterations (pure SETs)
so cost(b) - cost(c) isolates the loop, and (d) pins per-statement cost.

Usage: python tools/r12/probe_scripting.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from cortana_intelligence_customer360_spark import registry  # noqa: E402
from cortana_intelligence_customer360_spark.session import get_spark  # noqa: E402
from cortana_intelligence_customer360_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(fn, reps=3):
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    spark = get_spark(app_name="c360-probe-script", driver_memory="48g")
    queries, _ = registry.build()
    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("p_orders")
    spark.sql("SELECT COUNT(*) FROM p_orders").collect()  # warm

    seed_sql = (
        "SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)"
        " FROM p_orders"
    )
    print("seed_agg_collect:", round(t(lambda: spark.sql(seed_sql).collect()), 3))

    for qid in ("sql_scripting_repeat", "sql_scripting_for", "sql_scripting_while"):
        print(
            qid,
            round(
                t(
                    lambda: queries[qid](spark, SF_DIR)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                ),
                3,
            ),
        )

    prev = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")

    def script(n_iters: int):
        return f"""
BEGIN
  DECLARE total DOUBLE;
  DECLARE bal DOUBLE = 0.0;
  DECLARE i BIGINT = 0;
  SET total = ({seed_sql});
  WHILE i < {n_iters} DO
    SET bal = round(bal * 1.02 + 1.0, 6);
    SET i = i + 1;
  END WHILE;
  SELECT i, bal, total;
END
"""

    try:
        for n in (0, 24, 96):
            print(
                f"synthetic_while_{n}_iters:",
                round(t(lambda: spark.sql(script(n)).collect()), 3),
            )
    finally:
        spark.conf.set("spark.sql.scripting.enabled", prev)


if __name__ == "__main__":
    main()
