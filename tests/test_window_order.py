"""The driver oracles the FIRST 50 queries() entries per round — this
test pins dict order to the machine ranking (never-checked > red >
code-changed-since-row > oldest row) so a new or edited query can't
silently sit one slot past the window (round 5's events_zorder_layout
miss). Fails => rerun scripts/window_order.py --emit."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)

import __spark_entry__ as entry
import window_order

_RANKED, _CAT = window_order.compute_ranking(entry)


def test_window_matches_ledger_ranking():
    ranked = _RANKED
    actual = list(entry.queries())
    assert actual[: window_order.WINDOW_SIZE] == ranked[
        : window_order.WINDOW_SIZE
    ], "queries() order is stale — run scripts/window_order.py --emit"


def test_never_checked_and_red_lead_the_window():
    ranked, cat = _RANKED, _CAT
    urgent = [k for k in ranked if cat[k] in ("cat0", "cat1", "cat1.5")]
    window = list(entry.queries())[: window_order.WINDOW_SIZE]
    missing = [k for k in urgent if k not in window]
    assert not missing, (
        f"never-checked/red queries outside the driver window: {missing}"
    )


def test_registry_covers_ranking():
    # every ranked key resolves to a registry entry and vice versa
    assert sorted(_RANKED) == sorted(entry.queries())
