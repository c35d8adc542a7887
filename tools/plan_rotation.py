"""Rotation planning: simulate future rounds' gate windows before
registering/retiring entries, so registration plans are checked by
arithmetic instead of discovered by a failing
``test_rotation_manifest_current`` after the fact.

The model: each round the driver checks the FIRST 50 of ``queries()``
(sorted stalest-first from ROTATION.json); an entry is acceptably
fresh for 3 rounds; the rotation test fails if any entry that needs a
check this round (last green ≤ round−3, or never checked) falls
outside the 50-entry window.

Usage:
    python tools/plan_rotation.py                      # status quo
    python tools/plan_rotation.py +new_entry -retired  # what-if

Each ``+name`` registers a hypothetical new entry, each ``-name``
retires one, and the simulator plays the NEXT round's gate (assuming
the current round's window goes green) and reports the window fit.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50
FRESH_ROUNDS = 3


def simulate(adds: list[str], drops: list[str]) -> int:
    import __spark_entry__ as E

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "ROTATION.json")) as f:
        last = dict(json.load(f)["last_green"])
    current = max(last.values(), default=0)

    # assume the CURRENT round's gate window goes green before the
    # hypothetical change lands
    now_names = list(E.queries())
    for n in now_names[:WINDOW]:
        last[n] = current + 1

    names = [n for n in now_names if n not in set(drops)] + [
        a for a in adds if a not in now_names
    ]
    nxt = current + 2
    order = sorted(names, key=lambda n: last.get(n, 0))
    window = set(order[:WINDOW])
    must = {
        n
        for n in names
        if last.get(n, 0) <= nxt - FRESH_ROUNDS or n not in last
    }
    overflow = sorted(must - window)
    print(
        f"next round r{nxt}: registry {len(names)} "
        f"(cap {WINDOW * FRESH_ROUNDS}), must-check {len(must)}, "
        f"window {WINDOW} -> {'FITS' if not overflow else 'OVERFLOW'}"
    )
    if overflow:
        print("pushed out:", overflow[:12])
    slack = WINDOW - len(must)
    print(f"slack for further registrations next round: {max(slack, 0)}")
    return 1 if overflow else 0


if __name__ == "__main__":
    adds = [a[1:] for a in sys.argv[1:] if a.startswith("+")]
    drops = [a[1:] for a in sys.argv[1:] if a.startswith("-")]
    sys.exit(simulate(adds, drops))
