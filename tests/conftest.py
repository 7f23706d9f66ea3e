from __future__ import annotations

import pytest

from end_to_end_data_engineering_and_ml_system_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="e2e-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    # leak detector: the autouse per-test sweep below must have drained
    # every rank-cache handle already, so a nonzero count here means some
    # code path outside the tests' control (an operator, a harness helper)
    # persisted without routing through the tracked-release protocol
    from end_to_end_data_engineering_and_ml_system_spark.operators.relational import (
        release_rank_caches,
    )

    leaked = release_rank_caches(all_threads=True)
    s.stop()
    assert leaked == 0, (
        f"{leaked} rank-cache handle(s) survived to session teardown — "
        "a code path forgot its per-query release_rank_caches()"
    )


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(autouse=True)
def _free_rank_caches():
    """Unpersist distributed-rank intermediates after every test — the
    suite builds hundreds of registry queries per session and the cached
    range-shuffles would otherwise accumulate for the session lifetime."""
    yield
    from end_to_end_data_engineering_and_ml_system_spark.operators.relational import (
        release_rank_caches,
    )

    # all_threads: tests that exercise rank builds on worker threads must
    # not leak their handles past the test (no query is in flight between
    # tests, so the teardown sweep is safe here)
    release_rank_caches(all_threads=True)
