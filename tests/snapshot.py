"""Snapshot test harness (reference: vello_tests/src/snapshot.rs +
vello_dev_macros): golden PNGs in tests/snapshots/, mean-difference
thresholds per renderer, VELLO_TEST_UPDATE=1 regenerates."""

import os

import numpy as np

SNAP_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "snapshots")


def assert_snapshot(name: str, img: np.ndarray, mean_tol: float = 0.002,
                    max_tol: float = 0.25):
    """img: (H, W, 4) premultiplied f32. Compares RGBA8 against the golden."""
    from vello_tpu.utils.png import read_png, to_rgba8, write_png

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
    assert d.max() < max_tol, f"{name}: max diff {d.max():.4f}"
