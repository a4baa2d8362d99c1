"""Shared fixtures: ONE Ray session per pytest session + a small corpus."""

from __future__ import annotations

import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    from zeeklog_ray.raypatch import worker_runtime_env

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             runtime_env=worker_runtime_env())
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.WARNING)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(ray_session) -> str:
    """Deterministic 6k-row corpus (generated once, cached under /tmp)."""
    from zeeklog_ray.corpus import generate_corpus

    return generate_corpus(6_000)


@pytest.fixture(scope="session")
def corpus_frame():
    """The same corpus as an in-memory pandas frame — the in-test oracle."""
    from zeeklog_ray.corpus import make_corpus_frame

    return make_corpus_frame(6_000)
