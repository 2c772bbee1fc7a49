"""Gate-window hygiene: the driver's correctness gate hashes only the
first ~50 entries of __spark_entry__.queries(), so registry ORDER is
coverage policy.  These tests pin the window so a future insertion
cannot silently evict a query from driver coverage (VERDICT r3 item 8).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

GATE_WINDOW = 50


def test_every_query_has_an_oracle():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(q) == set(o), (
        f"queries()/oracle_sql() key mismatch: only-q={set(q) - set(o)}, "
        f"only-o={set(o) - set(q)}"
    )
    assert list(q) == list(o), "queries() and oracle_sql() must share one order"


def test_gate_priority_names_exist():
    q = entrymod.queries()
    missing = [n for n in entrymod.GATE_PRIORITY if n not in q]
    assert not missing, f"GATE_PRIORITY names not in registry: {missing}"


def test_first_window_is_exactly_gate_priority():
    """The driver-checked window must be the explicit, reviewed list —
    any new query must be added to GATE_PRIORITY deliberately (evicting
    a doubly-green one), never by accident of dict-merge order."""
    q = list(entrymod.queries())
    prio = entrymod.GATE_PRIORITY
    assert len(prio) == GATE_WINDOW, (
        f"GATE_PRIORITY has {len(prio)} entries; keep it exactly "
        f"{GATE_WINDOW} so the window is fully intentional"
    )
    assert q[:GATE_WINDOW] == prio, (
        "first-50 registry window drifted from GATE_PRIORITY:\n"
        + "\n".join(
            f"  pos {i}: registry={a!r} priority={b!r}"
            for i, (a, b) in enumerate(zip(q[:GATE_WINDOW], prio))
            if a != b
        )
    )


def test_no_duplicate_priority_entries():
    prio = entrymod.GATE_PRIORITY
    assert len(prio) == len(set(prio))
