"""Host-side (numpy) flatten — shared by the CPU oracle and the capacity
estimator. Exact mirror of the device flatten math (ops/flatten.py)."""

from __future__ import annotations

import numpy as np

from .config import FLATTEN_TOL, MAX_LINES_PER_SEG


def elevate_to_cubic(points: np.ndarray, kind: np.ndarray) -> np.ndarray:
    """Degree-elevate lines/quads to cubics. points (S,4,2), kind (S,)."""
    p0 = points[:, 0]
    out = np.empty_like(points)
    out[:, 0] = p0
    # line: p1 slot holds the end point
    line_p1 = points[:, 1]
    quad_c, quad_p2 = points[:, 1], points[:, 2]
    cub = points
    k = kind[:, None]
    c1 = np.where(k == 1, p0 + (line_p1 - p0) / 3.0,
                  np.where(k == 2, p0 + 2.0 / 3.0 * (quad_c - p0), cub[:, 1]))
    c2 = np.where(k == 1, p0 + 2.0 / 3.0 * (line_p1 - p0),
                  np.where(k == 2, quad_p2 + 2.0 / 3.0 * (quad_c - quad_p2),
                           cub[:, 2]))
    p3 = np.where(k == 1, line_p1, np.where(k == 2, quad_p2, cub[:, 3]))
    out[:, 1] = c1
    out[:, 2] = c2
    out[:, 3] = p3
    return out


def wang_counts(cubics: np.ndarray, kind: np.ndarray, tol: float,
                max_lines: int) -> np.ndarray:
    d1 = cubics[:, 0] - 2 * cubics[:, 1] + cubics[:, 2]
    d2 = cubics[:, 1] - 2 * cubics[:, 2] + cubics[:, 3]
    m = 6.0 * np.maximum(np.hypot(d1[..., 0], d1[..., 1]),
                         np.hypot(d2[..., 0], d2[..., 1]))
    n = np.ceil(np.sqrt(np.maximum(m, 0.0) / (8.0 * tol)))
    n = np.clip(n, 1, max_lines).astype(np.int64)
    return np.where(kind == 1, 1, n)


def transform_points(points: np.ndarray, tmat: np.ndarray) -> np.ndarray:
    x = (points[..., 0] * tmat[:, None, 0] + points[..., 1] * tmat[:, None, 2]
         + tmat[:, None, 4])
    y = (points[..., 0] * tmat[:, None, 1] + points[..., 1] * tmat[:, None, 3]
         + tmat[:, None, 5])
    return np.stack([x, y], axis=-1)


def flatten_decoded(decoded, tol: float = FLATTEN_TOL,
                    max_lines: int = MAX_LINES_PER_SEG):
    """Flatten decoded segments to lines. Returns (lines (N,4) f32, path_ix)."""
    kind = decoded["kind"]
    if len(kind) == 0:
        return np.zeros((0, 4), np.float32), np.zeros(0, np.int32)
    pts = transform_points(decoded["points"].astype(np.float64),
                           decoded["transform"].astype(np.float64))
    cub = elevate_to_cubic(pts, kind)
    counts = wang_counts(cub, kind, tol, max_lines)
    offs = np.cumsum(counts) - counts
    total = int(counts.sum())
    # expand: for each line slot, its segment and sub index
    seg_of = np.searchsorted(np.cumsum(counts), np.arange(total), side="right")
    sub = np.arange(total) - offs[seg_of]
    n = counts[seg_of].astype(np.float64)
    t0 = sub / n
    t1 = (sub + 1) / n
    c = cub[seg_of]

    def ev(t):
        t = t[:, None]
        mt = 1.0 - t
        return (mt ** 3 * c[:, 0] + 3 * mt * mt * t * c[:, 1]
                + 3 * mt * t * t * c[:, 2] + t ** 3 * c[:, 3])

    p0 = ev(t0)
    p1 = ev(t1)
    lines = np.concatenate([p0, p1], axis=-1).astype(np.float32)
    return lines, decoded["path_ix"][seg_of]


