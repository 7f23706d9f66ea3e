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
