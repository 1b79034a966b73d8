"""Same-hour bench A/B against a prior-round checkout (verdict-9 item 1).

Round-over-round bench totals on this shared VM drift 1.3-1.6x between
sessions on byte-identical code (NOTES.md round-9 adjudication), so a
raw cross-round comparison can never distinguish a code regression from
a slow hour. The only admissible evidence is a SAME-HOUR A/B: check out
the prior round's code in a worktree and run the identical id subset on
both checkouts back-to-back, minutes apart. This tool promotes the
round-9 NOTES anecdote into a standing artifact.

Usage:
    python tools/bench_ab.py <prior-commit> <round-N> [sf_dir]

e.g.  python tools/bench_ab.py 1ccd417 10

Runs the fixed 10-id representative subset (one id per op family:
agg/join/feat/dedup/tpch/win/stream/ml/graph/text) on the prior
checkout (git worktree, own Spark JVM) and then on HEAD, and writes
BENCH_AB_r{N}.json:

  {"prior_commit": ..., "ids": [...], "per_id": {qid: {"prior": s,
   "head": s}}, "sum_prior": s, "sum_head": s,
   "code_factor": head/prior,          # >1 means HEAD is slower CODE
   "env_factor": prior_today/prior_floor,  # >1 means the HOUR is slow
   "prior_floor_source": ...}

env_factor compares the prior checkout's reading TODAY against the
same ids' floor in the prior round's own session (its
BENCH_TRIPLICATE per-id min) — byte-identical code, different hour, so
any excess is environmental by construction.

Trigger policy (BASELINE.md protocol): run this whenever the
shared-id floor sum moves >5% round-over-round (tools/bench_gate.py
--sum-tol=0.05 failing is the tripwire). bench notes must cite the
resulting BENCH_AB_r{N}.json instead of arguing from raw totals.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One id per family, all O-tier, all present since round <=6 so any
# prior-round checkout this decade can run them. Keep FIXED so A/B
# artifacts stay comparable across rounds.
AB_IDS = [
    "agg_pricing_summary",
    "join_asof",
    "feat_profile_join",
    "dedup_minhash",
    "tpch_q8_market_share",
    "win_sliding_range",
    "stream_tumbling",
    "ml_train_score",
    "graph_pagerank",
    "text_stats",
]


def _run_bench(checkout: str, sf_dir: str) -> dict[str, float]:
    """Run bench.py on the given checkout for AB_IDS; return timings."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py", *AB_IDS],
        cwd=checkout,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            rec = json.loads(line)
            if set(AB_IDS) <= set(rec.get("queries", {})):
                return {k: rec["queries"][k] for k in AB_IDS}
    raise SystemExit(
        f"bench.py in {checkout} produced no parseable JSON line:\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def _prior_floor(round_n: int) -> tuple[dict[str, float], str]:
    """Per-id floors for AB_IDS from the newest PRIOR-round triplicate.

    Strictly round < round_n (r10 ADVICE): under the trigger policy
    the round-N triplicate, if it already exists, was produced by HEAD
    code, and dividing the prior checkout's same-hour reading by
    HEAD-code floors would break the 'byte-identical code, different
    hour' premise env_factor is defined by — conflating exactly the
    code delta this tool exists to isolate.
    """
    cands: list[tuple[int, str]] = []
    for p in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_TRIPLICATE_r(\d+)\.json", p)
        if m and int(m.group(1)) < round_n:
            cands.append((int(m.group(1)), p))
    trips = [p for _, p in sorted(cands)]
    if not trips:
        return {}, "none (skipped: no prior-round triplicate)"
    with open(os.path.join(REPO, trips[-1])) as f:
        trip = json.load(f)
    per = trip.get("per_id", {})
    return (
        {k: per[k]["min"] for k in AB_IDS if k in per},
        trips[-1],
    )


def main() -> None:
    prior_commit = sys.argv[1]
    round_n = int(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    tree = f"/tmp/ab_r{round_n}_prior"
    subprocess.run(
        ["git", "worktree", "remove", "--force", tree],
        cwd=REPO,
        capture_output=True,
    )
    subprocess.run(
        ["git", "worktree", "add", "--force", tree, prior_commit],
        cwd=REPO,
        check=True,
    )
    try:
        # Prior first, HEAD second — matches the r9 manual protocol;
        # back-to-back in the same hour is what makes the pair valid.
        prior = _run_bench(tree, sf_dir)
        head = _run_bench(REPO, sf_dir)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", tree],
            cwd=REPO,
            capture_output=True,
        )

    floors, floor_src = _prior_floor(round_n)
    # The triplicate floors are sf0.1-protocol numbers; an A/B run at
    # another SF (smoke) must not emit a cross-SF env_factor.
    if not sf_dir.rstrip("/").endswith("sf0.1"):
        floors, floor_src = {}, f"{floor_src} (skipped: sf mismatch)"
    sum_prior = round(sum(prior.values()), 2)
    sum_head = round(sum(head.values()), 2)
    floor_ids = [k for k in AB_IDS if k in floors]
    sum_floor = sum(floors[k] for k in floor_ids)
    sum_prior_on_floor_ids = sum(prior[k] for k in floor_ids)
    rec = {
        "prior_commit": prior_commit,
        "sf_dir": sf_dir,
        "ids": AB_IDS,
        "per_id": {
            k: {"prior": prior[k], "head": head[k]} for k in AB_IDS
        },
        "sum_prior": sum_prior,
        "sum_head": sum_head,
        "code_factor": round(sum_head / max(sum_prior, 1e-9), 3),
        "env_factor": (
            round(sum_prior_on_floor_ids / max(sum_floor, 1e-9), 3)
            if floor_ids
            else None
        ),
        "prior_floor_source": floor_src,
    }
    out = os.path.join(REPO, f"BENCH_AB_r{round_n}.json")
    with open(out, "w") as f:
        f.write(json.dumps(rec, indent=1) + "\n")
    print(json.dumps(rec))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
