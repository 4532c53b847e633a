"""Attestation-window integrity: the driver's CORRECTNESS gate checks the
first 50 keys of queries() in dict order, so the registry's _ATTEST_FIRST
list IS the round's driver coverage. These tests pin the invariants that
make a window slot count: the list leads the returned dict exactly, every
windowed key carries a FULL oracle (a slot spent on a rows-only check
would waste driver attestation), and the r06 window contains only keys
that need first-time or graduation attestation."""

from __future__ import annotations

import glob
import json
import os

from engine.registry import _ATTEST_FIRST, collect

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


def test_window_targets_unattested_or_graduating_keys():
    """Every r06 slot must buy new driver evidence: either the key has no
    prior CORRECTNESS row at all, or its only prior rows were the weaker
    rows-only check (err == 'no_oracle') and it is graduating to FULL."""
    prior: dict[str, list] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))):
        for k, v in json.load(open(f)).items():
            prior.setdefault(k, []).append(v)
    wasted = []
    for k in _ATTEST_FIRST:
        rows = prior.get(k)
        if rows is None:
            continue  # never attested: the slot buys a first attestation
        if not any(r.get("hash_match") for r in rows):
            # only rows-only or error history: the slot buys the first
            # FULL hash-match attestation
            continue
        wasted.append(k)
    assert not wasted, f"window slots re-attesting already-green keys: {wasted}"
