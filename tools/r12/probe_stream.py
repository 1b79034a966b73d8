"""Round-12 stream decomposition probe (guide §1: measure first).

Runs one registered stream query in the bench's session shape and
dumps, per micro-batch, the StreamingQueryProgress durationMs
breakdown (addBatch / triggerExecution / getBatch / commitOffsets /
walCommit) plus state-operator metrics — the numbers that say whether
the wall goes to Python-side work (addBatch), batch planning, or
commit machinery.

Usage: python tools/r12/probe_stream.py <query_id> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from cortana_intelligence_customer360_spark import registry  # noqa: E402
from cortana_intelligence_customer360_spark.session import get_spark  # noqa: E402
from cortana_intelligence_customer360_spark.sources.tables import (  # noqa: E402
    TABLES,
    load_table,
)

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    qid = sys.argv[1]
    spark = get_spark(app_name="c360-probe", driver_memory="48g")
    queries, _ = registry.build()

    # Same warm pass as bench.py so the timing matches the bench shape.
    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    load_table(spark, SF_DIR, "events").groupBy("event_type").count().count()

    # Register a listener capturing every progress event (recentProgress
    # is capped and the drained query object is internal to the op).
    from pyspark.sql.streaming import StreamingQueryListener

    progresses: list[dict] = []

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progresses.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(_L())

    for rep in range(int(os.environ.get("PROBE_REPS", "2"))):
        progresses.clear()
        t0 = time.time()
        queries[qid](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        # listener is async; give it a beat to drain
        time.sleep(1.0)
        rows = []
        dur_sum: dict[str, float] = {}
        for p in progresses:
            d = p.get("durationMs", {})
            for k, v in d.items():
                dur_sum[k] = dur_sum.get(k, 0.0) + v / 1e3
            so = p.get("stateOperators", [])
            rows.append(
                {
                    "batchId": p.get("batchId"),
                    "rows": p.get("numInputRows"),
                    "durationMs": d,
                    "stateOps": [
                        {
                            k: s.get(k)
                            for k in (
                                "operatorName",
                                "commitTimeMs",
                                "allUpdatesTimeMs",
                                "timeToUpdateStateMs",
                                "numRowsUpdated",
                                "allRemovalsTimeMs",
                                "numStateStoreInstances",
                            )
                        }
                        for s in so
                    ],
                }
            )
        print(f"=== rep {rep}: wall {wall:.2f}s, {len(progresses)} progress events")
        print(json.dumps({"durationMs_sum_s": {k: round(v, 2) for k, v in dur_sum.items()}}))
        for r in rows:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
