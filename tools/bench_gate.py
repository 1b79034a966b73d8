"""Round-over-round bench comparator (verdict-7 item 1 done-check).

Usage:
    python tools/bench_gate.py RUN_A.json RUN_B.json [--sum-tol 0.03]

Compares two bench.py output snapshots (BENCH_LOCAL.json schema) and
prints ONE JSON line:

  {"shared_ids": n, "sum_a": s, "sum_b": s, "sum_ratio": r,
   "sum_ok": bool, "outliers": {qid: ratio, ...}, "ok": bool}

Pass criteria (the verdict-7 reproducibility bar):
  - shared-id SUMS differ by < sum_tol (default 3%), AND
  - no shared id differs by > 1.5x between runs — with a 0.4 s
    absolute floor, because a 0.3 s id reading 0.46 s is timer noise,
    not the graph_hits 4<->14.5 s class this gate exists to catch.

Exit code 1 if either criterion fails, so it can gate CI-style.
"""

from __future__ import annotations

import json
import sys

RATIO_MAX = 1.5
ABS_FLOOR_S = 0.4


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sum_tol = 0.03
    for a in sys.argv[1:]:
        if a.startswith("--sum-tol"):
            sum_tol = float(a.split("=", 1)[1])
    qa = json.load(open(args[0]))["queries"]
    qb = json.load(open(args[1]))["queries"]
    shared = sorted(set(qa) & set(qb))
    sum_a = sum(qa[k] for k in shared)
    sum_b = sum(qb[k] for k in shared)
    ratio = sum_b / sum_a if sum_a else float("inf")
    outliers = {}
    for k in shared:
        lo, hi = sorted((qa[k], qb[k]))
        if hi > lo * RATIO_MAX and hi - lo > ABS_FLOOR_S:
            outliers[k] = round(hi / max(lo, 1e-9), 2)
    sum_ok = abs(ratio - 1.0) < sum_tol
    ok = sum_ok and not outliers
    print(
        json.dumps(
            {
                "shared_ids": len(shared),
                "sum_a": round(sum_a, 1),
                "sum_b": round(sum_b, 1),
                "sum_ratio": round(ratio, 4),
                "sum_ok": sum_ok,
                "outliers": dict(
                    sorted(outliers.items(), key=lambda kv: -kv[1])[:20]
                ),
                "ok": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
