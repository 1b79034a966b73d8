"""Round-12 transformWithState Python-side decomposition probe.

Mirrors typed_state/ops processors but wraps every state-server client
call with counters/timers (patched inside the WORKER via init(), so the
numbers are the real per-task costs) and times handleInputRows itself.
Prints one stderr line per task at close(); local mode surfaces worker
stderr on the driver console.

Usage: python tools/r12/probe_tws.py <mapstate|state|ttl|liststate|timers> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from cortana_intelligence_customer360_spark.session import get_spark  # noqa: E402
from cortana_intelligence_customer360_spark.sources.tables import (  # noqa: E402
    TABLES,
    load_table,
)

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

_STATS = {"rpc_n": 0, "rpc_s": 0.0, "handle_n": 0, "handle_s": 0.0, "emit_s": 0.0}


def _wrap_client(client) -> None:
    """Wrap every public method of a state client object with an RPC
    counter/timer (worker-side)."""
    for name in dir(client):
        if name.startswith("_"):
            continue
        fn = getattr(client, name)
        if not callable(fn):
            continue

        def mk(f):
            def wrapped(*a, **k):
                t0 = time.perf_counter()
                try:
                    return f(*a, **k)
                finally:
                    _STATS["rpc_n"] += 1
                    _STATS["rpc_s"] += time.perf_counter() - t0

            return wrapped

        setattr(client, name, mk(fn))


def _dump(tag: str) -> None:
    print(
        f"TWSPROBE {tag} pid={os.getpid()} "
        f"rpc_n={_STATS['rpc_n']} rpc_s={_STATS['rpc_s']:.3f} "
        f"handle_n={_STATS['handle_n']} handle_s={_STATS['handle_s']:.3f}",
        file=sys.stderr,
        flush=True,
    )


def main() -> None:
    which = sys.argv[1]
    spark = get_spark(app_name="c360-probe-tws", driver_memory="48g")
    for t in TABLES:
        load_table(spark, SF_DIR, t).count()

    from cortana_intelligence_customer360_spark.streaming import ops as S
    from cortana_intelligence_customer360_spark.streaming import typed_state as TS

    if which == "mapstate":
        base = TS._TypeCountProcessor
    elif which == "state":
        base = S._LatestEventProcessor
    elif which == "ttl":
        base = TS._TtlCounterProcessor
    elif which == "liststate":
        base = TS._PurchaseLogProcessor
    elif which == "timers":
        base = TS._DeadlineTimerProcessor
    else:
        raise SystemExit(f"unknown probe {which}")

    class Probed(base):  # type: ignore[valid-type, misc]
        def init(self, handle) -> None:
            super().init(handle)
            # every typed-state wrapper holds a *_client with the
            # actual socket RPCs; wrap each distinct client object.
            seen = set()
            for attr in self.__dict__.values():
                for cname in (
                    "_valueStateClient",
                    "_mapStateClient",
                    "_listStateClient",
                ):
                    cl = getattr(attr, cname, None)
                    if cl is not None and id(cl) not in seen:
                        seen.add(id(cl))
                        _wrap_client(cl)
            if hasattr(self, "_handle"):
                api = getattr(self._handle, "stateful_processor_api_client", None)
                if api is not None and id(api) not in seen:
                    _wrap_client(api)

        def handleInputRows(self, key, rows, timerValues):
            t0 = time.perf_counter()
            out = list(super().handleInputRows(key, rows, timerValues))
            _STATS["handle_n"] += 1
            _STATS["handle_s"] += time.perf_counter() - t0
            yield from out

        def close(self) -> None:
            _dump(which)
            super().close()

    # Build the same stream as the registered _multi op.
    if which == "mapstate":
        ev = S._events_stream_multi(spark, SF_DIR).select("user_id", "event_type")
        out_schema = TS._MAP_OUT_SCHEMA
        t0 = time.time()
        sink = TS._run_tws(spark, ev, Probed(), out_schema, min_batches=2)
        res = TS._latest_per(sink, ["user_id", "event_type"], "n")
    elif which == "state":
        ev = S._events_stream_multi(spark, SF_DIR).select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.col("event_id").cast("long").alias("event_id"),
            "event_type",
        )
        t0 = time.time()
        sink = TS._run_tws(spark, ev, Probed(), S._TWS_OUT_SCHEMA, min_batches=2)
        res = TS._latest_per(sink, ["user_id"], "n_events")
    elif which == "ttl":
        ev = S._events_stream_multi(spark, SF_DIR).select("user_id")
        t0 = time.time()
        sink = TS._run_tws(
            spark, ev, Probed(), TS._TTL_OUT_SCHEMA,
            time_mode="ProcessingTime", min_batches=2,
            stop_when_drained=True, min_gap_ms=1,
        )
        res = TS._ttl_sum(sink)
    elif which == "liststate":
        ev = S._events_stream_multi(spark, SF_DIR).select(
            "user_id", "event_type", "event_id"
        )
        t0 = time.time()
        sink = TS._run_tws(spark, ev, Probed(), TS._LIST_OUT_SCHEMA, min_batches=2)
        res = TS._latest_per(sink, ["user_id"], "n_purch")
    else:  # timers
        ev = (
            S._events_stream_multi(spark, SF_DIR)
            .withWatermark("ts", "10 minutes")
            .select(
                "user_id",
                "ts",
                (F.unix_micros("ts") / F.lit(1000)).cast("long").alias("ts_ms"),
            )
        )
        t0 = time.time()
        sink = TS._run_tws(
            spark, ev, Probed(), TS._TIMER_OUT_SCHEMA,
            time_mode="EventTime", event_time_col="", min_batches=2,
        )
        res = sink.distinct()

    res.write.format("noop").mode("overwrite").save()
    print(f"=== {which}: wall {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
