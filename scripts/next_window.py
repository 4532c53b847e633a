"""Compute the next round's 50-key attestation window mechanically.

The driver's CORRECTNESS gate checks the first 50 keys of queries() in
dict order, so engine.registry._ATTEST_FIRST IS the round's driver
coverage. Until now the next-round list lived as a hand-maintained
registry comment; this script derives it from the evidence on disk so
the round-boundary swap is one command instead of a recipe.

Policy (the registry's, verbatim):
  1. First-time attestation always outranks re-attestation: keys with NO
     green (hash_match) row in any CORRECTNESS_r*.json come first,
     alphabetical. A key whose only rows are rows-only (err ==
     'no_oracle') or errors also counts as first-time for FULL purposes.
  2. Staleness rotation fills the remaining slots, legal only once every
     key has a first attestation: keys whose NEWEST green row is at
     least 4 rounds older than the target round, oldest-green-first then
     alphabetical.
  3. The window is exactly 50 keys (the driver's cap). Fewer eligible
     keys than slots → the window is shorter and the script says so.

Usage: python scripts/next_window.py [target_round]
  target_round defaults to max(round on disk) + 1.

Prints the ready-to-paste Python list plus a provenance line per key
(never-attested | graduating | stale rN). Read-only: it never edits the
registry — the swap stays a reviewed commit.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAP = 50
STALE_AFTER = 4  # rounds; a green this old is eligible for rotation


def load_evidence(before_round: int | None = None) -> tuple[dict[str, int], int]:
    """{key: newest green round} plus the newest round on disk.

    Keys with rows but no green row map to -1 (graduation candidates).
    ``before_round`` scopes the scan to rounds strictly before it — a
    window is judged against the evidence that existed when it was
    chosen, so recomputing it after its own CORRECTNESS file lands must
    not change the answer (the r06/r07 round-boundary lesson)."""
    newest_green: dict[str, int] = {}
    rounds: list[int] = []
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if m is None:
            continue
        rnd = int(m.group(1))
        if before_round is not None and rnd >= before_round:
            continue
        rounds.append(rnd)
        for k, v in json.load(open(f)).items():
            green = bool(
                v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
            )
            cur = newest_green.get(k, -1)
            newest_green[k] = max(cur, rnd) if green else cur
    if not rounds:
        raise SystemExit("no CORRECTNESS_r*.json files on disk")
    return newest_green, max(rounds)


def next_window(target_round: int | None = None) -> list[tuple[str, str]]:
    from engine.registry import collect

    queries, oracles = collect()
    if target_round is None:
        _, newest_round = load_evidence()
        target_round = newest_round + 1
    evidence, _ = load_evidence(before_round=target_round)

    first_time = []  # never attested, or no green row yet
    for k in sorted(queries):
        g = evidence.get(k, None)
        if g is None:
            first_time.append((k, "never-attested"))
        elif g < 0:
            first_time.append((k, "graduating (rows-only/err history)"))

    window = first_time[:CAP]
    if len(window) < CAP:
        # rotation legal: every key will have a first attestation once the
        # first-time block above lands (or already has one) — len(window)
        # < CAP already implies no first-timer was left out of the window
        # (window IS first_time when it's short of the cap)
        stale = [
            (k, g)
            for k, g in evidence.items()
            if g >= 0 and g <= target_round - STALE_AFTER and k in queries
        ]
        stale.sort(key=lambda kg: (kg[1], kg[0]))  # oldest green, then name
        for k, g in stale:
            if len(window) >= CAP:
                break
            window.append((k, f"stale (newest green r{g:02d})"))
    return window


def main() -> None:
    target = int(sys.argv[1]) if len(sys.argv) > 1 else None
    if target is None:
        _, newest_round = load_evidence()
        target = newest_round + 1
    window = next_window(target)
    print(f"# next window: target round r{target:02d}, {len(window)} keys")
    for k, why in window:
        print(f"#   {k:40s} {why}")
    print("_ATTEST_FIRST = [")
    for k, _ in window:
        print(f'    "{k}",')
    print("]")
    if len(window) < CAP:
        print(f"# NOTE: only {len(window)} eligible keys (< cap {CAP})")


if __name__ == "__main__":
    main()
