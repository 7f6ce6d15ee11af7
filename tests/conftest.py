"""Session-scoped Ray fixture — init ONCE for the whole pytest run."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session")
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    """Deterministic 200-file corpus + truth pairs (no Ray needed)."""
    from clonehunter_ray.corpus import generate_corpus

    return generate_corpus(200, 42)
