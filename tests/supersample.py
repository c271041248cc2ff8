"""Brute-force supersampled rasterizer — the independent ground truth used to
validate both the oracle and the device pipeline (the role vello_cpu's f32
pipeline plays as pixel oracle in the reference's test strategy)."""

import numpy as np

from vello_tpu.peniko import Fill


def supersample_coverage(lines: np.ndarray, width: int, height: int,
                         rule: int = int(Fill.NON_ZERO),
                         ss: int = 8) -> np.ndarray:
    """Point-sampled coverage with ss*ss samples per pixel.

    lines: (N, 4) array of x0,y0,x1,y1 (a closed polygon soup).
    """
    H, W = height * ss, width * ss
    offs = (np.arange(ss) + 0.5) / ss
    ys = (np.arange(height)[:, None] + offs[None, :]).reshape(-1)
    xs = (np.arange(width)[:, None] + offs[None, :]).reshape(-1)
    winding = np.zeros((H, W), dtype=np.int32)
    if len(lines):
        for i in range(0, len(lines), 256):
            chunk = lines[i:i + 256].astype(np.float64)
            x0, y0, x1, y1 = chunk[:, 0], chunk[:, 1], chunk[:, 2], chunk[:, 3]
            # Ray to +x: standard crossing rule, half-open in y.
            ylo = np.minimum(y0, y1)
            yhi = np.maximum(y0, y1)
            sgn = np.sign(y1 - y0)
            # (H, N) row crossing mask
            cross = (ys[:, None] >= ylo[None, :]) & (ys[:, None] < yhi[None, :])
            dy = np.where(np.abs(y1 - y0) < 1e-30, 1.0, y1 - y0)
            t = (ys[:, None] - y0[None, :]) / dy[None, :]
            xc = x0[None, :] + t * (x1 - x0)[None, :]
            # (H, W, N) -> sum over N ... do per row to bound memory
            for r in range(H):
                m = cross[r]
                if not m.any():
                    continue
                xcr = xc[r, m]
                sg = sgn[m]
                winding[r] += ((xs[None, :] < xcr[:, None]) *
                               sg[:, None]).sum(axis=0).astype(np.int32)
    w = winding.astype(np.float64)
    if rule == int(Fill.EVEN_ODD):
        cov = np.abs(w % 2.0)
        cov = np.where(cov > 1.0, 2.0 - cov, cov)
    else:
        cov = np.minimum(np.abs(w), 1.0)
    return cov.reshape(height, ss, width, ss).mean(axis=(1, 3))
