"""Attestation-window integrity: the driver's CORRECTNESS gate checks the
first 50 keys of queries() in dict order, so the registry's _ATTEST_FIRST
list IS the round's driver coverage. These tests pin the invariants that
make a window slot count: the list leads the returned dict exactly, every
windowed key carries a FULL oracle (a slot spent on a rows-only check
would waste driver attestation), and the current window contains only
keys that need first-time or graduation attestation.

The unattested-targets check scans only CORRECTNESS files from rounds
STRICTLY BEFORE the window's own round (_WINDOW_ROUND): a slot is judged
against the evidence that existed when the window was chosen. Scanning
all files made the r06 variant go stale the moment the driver wrote
CORRECTNESS_r06.json — the window's own attestations flagged every slot
as 'wasted' (ADVICE r06, the round's only red test)."""

from __future__ import annotations

import glob
import json
import os
import re

from engine.registry import _ATTEST_FIRST, _WINDOW_ROUND, collect

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_window_leads_collect_order():
    queries, _ = collect()
    head = list(queries)[: len(_ATTEST_FIRST)]
    assert head == _ATTEST_FIRST


def test_window_is_driver_cap_sized():
    # the driver checks exactly 50 keys; a short list wastes slots and a
    # long one silently drops the tail out of the window
    assert len(_ATTEST_FIRST) == 50
    assert len(set(_ATTEST_FIRST)) == 50


def test_window_keys_all_have_full_oracles():
    _, oracles = collect()
    missing = [k for k in _ATTEST_FIRST if k not in oracles]
    assert not missing, f"windowed keys without oracles: {missing}"


def test_window_round_is_current_or_just_completed():
    """The window must be in one of exactly two legal states:

    1. mid-round — _WINDOW_ROUND points past every CORRECTNESS file on
       disk (the driver hasn't written this round's file yet), or
    2. just completed — CORRECTNESS_r{_WINDOW_ROUND}.json exists, its key
       set equals the current window, and every row is green (the round
       closed successfully; the swap reminder is the registry comment's
       pre-registered next-round list, not a suite-red tripwire).

    Anything else (a round file newer than the window, a completed file
    whose keys don't match the window, or red rows in the window's own
    file) means the window was forgotten across a round boundary or the
    round failed — fail loudly. This replaces the r06/r07 tripwire that
    was DESIGNED to go red the moment the driver wrote the round file
    (red at judging time two rounds running — VERDICT r07 item 2)."""
    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    assert rounds, "no CORRECTNESS files found"
    if _WINDOW_ROUND > max(rounds):
        return  # mid-round: this round's file not written yet
    assert _WINDOW_ROUND == max(rounds), (
        f"_WINDOW_ROUND={_WINDOW_ROUND} but CORRECTNESS_r{max(rounds):02d}"
        ".json exists: window forgotten across a round boundary — swap to"
        " the pre-registered next-round list in engine/registry.py"
    )
    own = json.load(
        open(os.path.join(REPO, f"CORRECTNESS_r{_WINDOW_ROUND:02d}.json"))
    )
    assert set(own) == set(_ATTEST_FIRST), (
        "window's own CORRECTNESS file covers different keys than"
        f" _ATTEST_FIRST: extra={sorted(set(own) - set(_ATTEST_FIRST))},"
        f" missing={sorted(set(_ATTEST_FIRST) - set(own))}"
    )
    red = [
        k
        for k, v in own.items()
        if not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
    ]
    assert not red, (
        f"window round r{_WINDOW_ROUND:02d} completed with red rows: {red}"
    )


def test_window_equals_policy_output():
    """The committed _ATTEST_FIRST must be exactly what the executable
    policy (scripts/next_window.py) derives from the CORRECTNESS files
    that existed when the window was chosen (rounds < _WINDOW_ROUND).
    This turns the registry's prose staleness policy into code: the
    round-boundary swap is `python scripts/next_window.py <N>` → paste,
    and any hand-edit that diverges from policy fails here. Evidence is
    round-scoped, so the assertion is stable before AND after the
    driver writes the window's own CORRECTNESS file."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from next_window import next_window

    derived = [k for k, _ in next_window(_WINDOW_ROUND)]
    assert derived == _ATTEST_FIRST, (
        "committed window diverges from policy output: "
        f"extra={sorted(set(_ATTEST_FIRST) - set(derived))}, "
        f"missing={sorted(set(derived) - set(_ATTEST_FIRST))}"
    )


def test_window_targets_unattested_graduating_or_stale_keys():
    """Every slot must buy new driver evidence: the key has no
    CORRECTNESS row from any round before _WINDOW_ROUND, or its only
    prior rows were the weaker rows-only check (err == 'no_oracle') and
    it is graduating to FULL, or — the registry's staleness-rotation
    policy, legal only once every key has a first attestation — its
    newest green row is at least 4 rounds older than the window's round
    (the r08 plan re-attests the oldest r01 greens)."""
    prior: dict[str, list[tuple[int, dict]]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if m is None or int(m.group(1)) >= _WINDOW_ROUND:
            continue
        for k, v in json.load(open(f)).items():
            prior.setdefault(k, []).append((int(m.group(1)), v))
    queries, _ = collect()
    # Rotation is legal once every key has a first attestation — counting
    # first-time slots in THIS window (the r08 window completes total
    # attestation and spends its remaining slots on rotation in the same
    # round; the pre-registered plan does both at once).
    all_attested = all(k in prior or k in _ATTEST_FIRST for k in queries)
    wasted = []
    for k in _ATTEST_FIRST:
        rows = prior.get(k)
        if rows is None:
            continue  # never attested: the slot buys a first attestation
        green = [rnd for rnd, r in rows if r.get("hash_match")]
        if not green:
            # only rows-only or error history: the slot buys the first
            # FULL hash-match attestation
            continue
        if all_attested and max(green) <= _WINDOW_ROUND - 4:
            continue  # staleness rotation: refreshing a ≥4-round-old green
        wasted.append(k)
    assert not wasted, f"window slots re-attesting already-green keys: {wasted}"
