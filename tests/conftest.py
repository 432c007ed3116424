import os

import pytest
from hypothesis import settings

os.environ.setdefault("RAY_DEDUP_LOGS", "0")

# deterministic property tests: the suite is a correctness GATE (driver
# runs it per round), so runs must be reproducible; randomized
# exploration runs on demand with HYPOTHESIS_PROFILE=deep
settings.register_profile("gate", derandomize=True)
settings.register_profile("deep", max_examples=400, deadline=None,
                          derandomize=False)
settings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "gate"))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    # empty sort partitions produce empty-schema bundles Ray warns about
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)
    yield
    ray.shutdown()
