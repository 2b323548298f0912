"""Regenerate `_GATE_FIRST` in dask_lightgbm_spark/queries/__init__.py from
the committed CORRECTNESS_r*.json files — each round's mandatory commit #1.

The rotation contract (enforced by tests/test_relational.py::
test_gate_order_staleness_contract): queries never driver-verified gate
first, then every query absent from the LATEST round, ordered
oldest-verification-first (ties by position in that round's file). This
script computes exactly the ordering the test recomputes and splices it
into the module, so the rotation can never be mis-transcribed by hand.

Usage: python tools/gen_gate.py            # rewrite in place
       python tools/gen_gate.py --check    # exit 1 if a rotation is due
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODULE = os.path.join(REPO, "dask_lightgbm_spark", "queries", "__init__.py")

# Freshness SLO (r12 verdict #8): with 188 catalog queries and ~50 driver
# sample slots per round, the rotation clears the oldest block each round
# and worst-case staleness is bounded — no query's latest hash-matched
# driver verification may be older than newest_round - MAX_STALENESS. If a
# future round samples fewer queries, --check (and the contract test, which
# asserts the same bound) fails LOUDLY instead of silently aging the tail.
MAX_STALENESS = 3


def verification_state() -> tuple[dict[str, int], list[str], int]:
    """latest verified round per query (hash-matched runs only), the stale
    ordering, and the newest round number."""
    latest: dict[str, int] = {}
    pos: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for i, (q, rec) in enumerate(json.load(open(f)).items()):
            if rec.get("hash_match"):
                latest[q] = rnd
                pos[q] = i
    newest = max(latest.values())
    stale = sorted(
        (q for q in latest if latest[q] < newest),
        key=lambda q: (latest[q], pos[q]),
    )
    return latest, stale, newest


def main() -> int:
    from dask_lightgbm_spark.queries import _GATE_FIRST, all_queries

    latest, stale, newest = verification_state()
    never = [n for n in all_queries() if n not in latest]
    want = never + stale

    current_ok = (
        [q for q in _GATE_FIRST if q not in latest] == never
        and [q for q in _GATE_FIRST if q in latest] == stale
    )
    oldest = min(latest.values())
    overdue = sorted(q for q in latest if latest[q] < newest - MAX_STALENESS)
    if "--check" in sys.argv:
        print(
            f"newest round r{newest}: {len(never)} never-verified, "
            f"{len(stale)} stale; oldest verification r{oldest} "
            f"(SLO: >= r{newest - MAX_STALENESS}); rotation "
            + ("current" if current_ok else "OUT OF DATE — run tools/gen_gate.py")
        )
        if overdue:
            print(
                f"FRESHNESS SLO BREACH: {len(overdue)} queries last verified "
                f"before r{newest - MAX_STALENESS}: {overdue[:10]}"
                + (" ..." if len(overdue) > 10 else "")
            )
        return 0 if current_ok and not overdue else 1
    if current_ok:
        print(f"rotation already current for r{newest} ({len(want)} entries)")
        return 0

    lines = ["_GATE_FIRST: list[str] = ["]
    lines.append("    # --- never driver-verified (prepend new queries here) ---")
    for q in never:
        lines.append(f'    "{q}",')
    cur = None
    for q in stale:
        if latest[q] != cur:
            cur = latest[q]
            lines.append(f"    # --- last verified r{cur} ---")
        lines.append(f'    "{q}",')
    lines.append("]")

    src = open(MODULE).read()
    start = src.index("_GATE_FIRST: list[str] = [")
    end = src.index("\n]", start) + 2  # just past the closing bracket
    open(MODULE, "w").write(src[:start] + "\n".join(lines) + src[end:])
    print(
        f"rewrote _GATE_FIRST for r{newest}: {len(never)} never-verified + "
        f"{len(stale)} stale = {len(want)} entries"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
