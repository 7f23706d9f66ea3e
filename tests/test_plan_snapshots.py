"""The committed PLAN_SNAPSHOTS.md must match the plans the code actually
produces — a physical-plan regression (new shuffle, lost broadcast, widened
scan) shows up as a readable diff in review instead of silently shipping.

Regenerate with `python tools/plan_snapshots.py` after intentional changes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plan_snapshots_current():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from plan_snapshots import OUT, build_snapshots

    with open(OUT) as f:
        committed = f.read()
    fresh = build_snapshots()
    if committed != fresh:
        with open("/tmp/fresh_snap.md", "w") as f:
            f.write(fresh)
    assert committed == fresh, (
        "PLAN_SNAPSHOTS.md is stale — a physical plan changed (this also "
        "happens when the test-fixture schemas drift, e.g. a column's type "
        "changes and a conversion Project disappears; that kind of diff is "
        "benign). Review the diff vs /tmp/fresh_snap.md, then regenerate "
        "with `python tools/plan_snapshots.py` and commit the result."
    )
