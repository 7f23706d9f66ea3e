"""The correctness driver samples the first 50 names from
``__spark_entry__.queries()``; ``registry._DRIVER_PRIORITY`` pins that
window. These tests keep the pin honest: every priority name must resolve,
the window must be exactly the priority list, and reordering must not drop
or duplicate any registered query.
"""

from __future__ import annotations

from end_to_end_data_engineering_and_ml_system_spark.plans.registry import (
    _DRIVER_PRIORITY,
    _REGISTRY,
    _ensure_loaded,
    all_queries,
)

DRIVER_WINDOW = 50


def test_priority_names_exist():
    _ensure_loaded()
    missing = [n for n in _DRIVER_PRIORITY if n not in _REGISTRY]
    assert not missing, f"_DRIVER_PRIORITY names not registered: {missing}"


def test_priority_no_duplicates():
    assert len(set(_DRIVER_PRIORITY)) == len(_DRIVER_PRIORITY)


def test_driver_window_is_priority_list():
    head = list(all_queries())[: len(_DRIVER_PRIORITY)]
    assert head == list(_DRIVER_PRIORITY)
    assert len(_DRIVER_PRIORITY) == DRIVER_WINDOW


def test_reorder_preserves_registry():
    _ensure_loaded()
    assert set(all_queries()) == set(_REGISTRY)
    assert len(all_queries()) == len(_REGISTRY)


def test_registry_never_shrinks():
    """A rename or deleted @register can't silently shrink driver coverage:
    the registry held 155 queries at the round-3 snapshot and only grows."""
    _ensure_loaded()
    assert len(_REGISTRY) >= 156


def test_round4_window_is_never_driver_tested():
    """The round-4 window exists to close the driver-evidence gap: every
    name in it must be absent from all committed CORRECTNESS_r0*.json files
    (i.e. genuinely never driver-tested before this round)."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r0[123].json")))
    if not files:  # fresh clone without round artifacts
        return
    tested: set[str] = set()
    for f in files:
        with open(f) as fh:
            tested |= set(json.load(fh))
    overlap = [n for n in _DRIVER_PRIORITY if n in tested]
    assert not overlap, f"window wastes slots on already-proven queries: {overlap}"
