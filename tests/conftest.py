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
    # NOTE: the env vars above are setdefault-ineffective when the shell
    # exports JAX_PLATFORMS=axon, and the axon register() hook forces
    # jax_platforms="axon,cpu" via jax.config — so override the config AND
    # drop the axon backend factory, or a wedged TPU tunnel hangs the
    # whole CPU suite at first backends() call.
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The XLA CPU compiler segfaults when the process heap is already
    several GB deep (seen ~170 tests into the full suite); dropping the
    jit executable cache at module boundaries keeps the heap bounded.
    Same-module tests still share compiled pipelines."""
    yield
    try:
        import jax

        from vello_tpu.pipeline import layered as _lay
        from vello_tpu.pipeline import render as _ren

        # drop the repo's own jit caches first: they pin the compiled
        # executables jax.clear_caches() would otherwise free
        _ren._JIT_CACHE.clear()
        _ren._JIT_B_CACHE.clear()
        for name in dir(_lay):
            v = getattr(_lay, name)
            if isinstance(v, dict) and name.endswith("_CACHE"):
                v.clear()
        jax.clear_caches()
    except Exception:
        pass
