"""Multi-device sharded rendering test. Runs in-process when 8 devices are
available; otherwise re-runs in a subprocess with the virtual-device env set
before interpreter start (required because this image preloads jaxlib)."""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def test_dp_sp_sharded_matches_single_device():
    import jax

    if len(jax.devices()) >= 8:
        sys.path.insert(0, HERE)
        from parallel_check import main
        main()
        return
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""   # skip axon-tunnel registration
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "parallel_check.py")],
        env=env, capture_output=True, text=True, timeout=560,
        cwd=os.path.dirname(HERE))
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "parallel_check OK" in r.stdout
