"""Shared physical-plan capture for plan-shape assertions.

One version-tolerant path for every test that asserts on plan strings:
``df.explain()`` is public API and renders the same physical-plan tree
(scan details like ``PushedFilters``, codegen stars, Exchange nodes) that
``_jdf.queryExecution().executedPlan().toString()`` exposes through private
JVM handles — which broke across Spark versions often enough that tests
must not call it directly.
"""

from __future__ import annotations

import contextlib
import io


def physical_plan(df) -> str:
    """The physical plan as a string, captured via public ``df.explain()``."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()
