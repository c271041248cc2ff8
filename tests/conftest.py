"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware.

This image preloads jaxlib via sitecustomize, so XLA_FLAGS must be in the
process environment BEFORE the interpreter starts — if it isn't, re-exec
pytest once with the corrected environment."""

import os
import sys

_FLAG = "--xla_force_host_platform_device_count=8"

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")  # this build ignores plural
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    # Usually too late (sitecustomize preloads jaxlib before conftest runs);
    # tests needing 8 devices fall back to a subprocess with this env set.
    os.environ["XLA_FLAGS"] = (flags + " " + _FLAG).strip()

try:
    # Effective even though sitecustomize preloaded jaxlib: the backend is
    # only selected at first use. (XLA_FLAGS, in contrast, is captured at
    # jaxlib import — hence the subprocess fallback in test_parallel.)
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
