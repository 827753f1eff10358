"""Shared fixtures.  Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import logging

import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_dir(tmp_path_factory):
    """Smoke token table (~2k rows)."""
    from logtrics_ray.synth import write_token_table
    d = tmp_path_factory.mktemp("t1")
    return write_token_table(str(d), 2000, n_shards=4)


@pytest.fixture(scope="session")
def t2_dir(tmp_path_factory):
    """Conformance token table (~10k rows)."""
    from logtrics_ray.synth import write_token_table
    d = tmp_path_factory.mktemp("t2")
    return write_token_table(str(d), 10000, n_shards=8)
