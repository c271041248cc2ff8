"""Snapshot test harness (reference: vello_tests/src/snapshot.rs +
vello_dev_macros): golden PNGs in tests/snapshots/, mean-difference
thresholds per renderer, VELLO_TEST_UPDATE=1 regenerates."""

import os

import numpy as np

SNAP_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "snapshots")


def assert_snapshot(name: str, img: np.ndarray, mean_tol: float = 0.002,
                    max_tol: float = None, allow_flips: int = 0):
    """img: (H, W, 4) premultiplied f32. Compares RGBA8 against the golden.

    max_tol defaults to 4/255 per channel (the reference gates 2/255
    across its 504 snapshots, vello_dev_macros/src/lib.rs:20-23; goldens
    here are deterministic CPU-backend reruns, so the slack only covers
    intentional cross-version quantization jitter). Tests opting out must
    say why at the call site.

    allow_flips: number of PIXELS permitted to exceed max_tol — for
    aliased ("centers") modes, where any boundary-coverage jitter flips a
    whole pixel and a max gate would be all-or-nothing."""
    from vello_tpu.utils.png import read_png, to_rgba8, write_png

    if max_tol is None:
        max_tol = 4.01 / 255.0
    os.makedirs(SNAP_DIR, exist_ok=True)
    path = os.path.join(SNAP_DIR, f"{name}.png")
    rgba = to_rgba8(img)
    if os.environ.get("VELLO_TEST_UPDATE") or not os.path.exists(path):
        write_png(path, img)
        if not os.environ.get("VELLO_TEST_UPDATE"):
            raise AssertionError(
                f"snapshot {name} did not exist; generated {path} — rerun")
        return
    golden = read_png(path)
    assert golden.shape == rgba.shape, \
        f"{name}: shape {rgba.shape} vs golden {golden.shape}"
    d = np.abs(golden.astype(np.float64) - rgba.astype(np.float64)) / 255.0
    assert d.mean() < mean_tol, f"{name}: mean diff {d.mean():.5f}"
    if allow_flips:
        nbad = int((d.max(axis=-1) >= max_tol).sum())
        assert nbad <= allow_flips, \
            f"{name}: {nbad} px exceed {max_tol:.4f} (allow {allow_flips})"
    else:
        assert d.max() < max_tol, f"{name}: max diff {d.max():.4f}"
