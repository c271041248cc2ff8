"""Segmented reductions over sorted ids WITHOUT scatter.

XLA scatter-add on TPU serializes per update (catastrophic at 10^5-10^6
updates). Every segmented reduction in this pipeline runs over ids that are
already sorted (post key-sort), so segment sums become: one inclusive cumsum
+ two searchsorted boundary lookups + a gather — all dense, fully-vectorised
VPU work. This module is the TPU replacement for the reference's atomicAdd
patterns (path_count.wgsl tile counts, backdrop bumps, coarse accumulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def searchsorted_dense(sorted_data: jnp.ndarray, n_queries: int,
                       side: str = "left") -> jnp.ndarray:
    """searchsorted(sorted_data, arange(n_queries), side) without the
    serialized binary search: jnp.searchsorted lowers to ~log2(n) DEPENDENT
    gather rounds on TPU (a device trace showed 6-8 ms per call at this
    scale), while merging two already-sorted integer sequences is one 1-op
    sort + one 2-op sort (~1-2 ms). The (value, is-query) pair is packed
    into one i32 so the merge moves a single channel; a query at merged
    position j has exactly j - k data elements before it (k = its rank
    among the arange queries)."""
    n_d = sorted_data.shape[0]
    d = jnp.clip(sorted_data.astype(jnp.int32), 0, n_queries)
    q = jnp.arange(n_queries, dtype=jnp.int32)
    if side == "left":     # result[k] = #data < k  (query before equal data)
        packed = jnp.concatenate([q * 2, d * 2 + 1])
        qpar = 0
    else:                  # result[k] = #data <= k (query after equal data)
        packed = jnp.concatenate([d * 2, q * 2 + 1])
        qpar = 1
    # UNSTABLE sorts: packed keys are all distinct (the parity bit
    # disambiguates data from queries), and a stable TPU sort silently
    # moves a hidden iota tiebreaker channel through every merge pass
    # (~35% of the sort time at the mmark tier).
    (k_s,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
    j = jnp.arange(n_d + n_queries, dtype=jnp.int32)
    isq = (k_s & 1) == qpar
    # The k-th query's merged slot j_k has exactly j_k - k data elements
    # before it, and queries keep their k order through the merge — so
    # sorting just the query slot POSITIONS (1 operand, no payload) and
    # subtracting arange gives the dense answer directly. (Positions are
    # distinct except the dump fill, whose order is irrelevant.)
    pos = jnp.where(isq, j, jnp.int32(2 ** 30))
    (pos_s,) = jax.lax.sort((pos,), num_keys=1, is_stable=False)
    return pos_s[:n_queries] - jnp.arange(n_queries, dtype=jnp.int32)


def segment_starts(sorted_ids: jnp.ndarray, num_segments: int):
    """starts[s] = first index with id >= s, for s in [0, num_segments].
    starts[s+1] doubles as the END of segment s, so one lookup serves
    both bounds."""
    return searchsorted_dense(sorted_ids, num_segments + 1, side="left")


def _cumsum0(vals):
    """Inclusive cumsum over axis 0; streams through the Pallas kernel for
    big 2-D f32 arrays on TPU."""
    if vals.ndim == 2 and vals.dtype == jnp.float32 \
            and vals.shape[0] >= 4096 and vals.shape[1] % 128 == 0:
        from .pallas_kernels import cumsum_pallas, use_pallas
        if use_pallas():
            return cumsum_pallas(vals)
    return jnp.cumsum(vals, axis=0)


def segment_sum_from_starts(vals: jnp.ndarray, starts: jnp.ndarray
                            ) -> jnp.ndarray:
    """Segment sums via one cumsum + ONE gather: out[s] =
    csum[starts[s+1]-1] - csum[starts[s]-1] (start 0 masked to 0) — a
    masked gather instead of physically prepending a zero row (the concat
    would copy the whole cumsum tensor)."""
    c = _cumsum0(vals)
    mask = starts > 0
    idx = jnp.maximum(starts - 1, 0)
    if vals.ndim > 1:
        mask = mask.reshape((-1,) + (1,) * (vals.ndim - 1))
        at = jnp.where(mask, c[idx], 0)
    else:
        # Narrow-source gathers fall off a cliff once the source has
        # >= 2^15 sublane tiles (measured: f32 (2^18, 1) rows gather at
        # ~8.6 ns/row vs 2.7 for the same data packed 8-wide): gather a
        # ROW-PACKED (N/8, 8) view at idx//8, then one-hot-select idx%8.
        n = c.shape[0]
        cp = jnp.pad(c, (0, (-n) % 8)).reshape(-1, 8)
        g = cp[idx // 8]                               # (Q, 8)
        sel = (idx % 8)[:, None] == jnp.arange(8, dtype=idx.dtype)[None]
        at = jnp.where(mask, jnp.sum(jnp.where(sel, g, 0), axis=1), 0)
    return at[1:] - at[:-1]


def segment_bounds(sorted_ids: jnp.ndarray, num_segments: int):
    """(lo, hi) index ranges of each segment in a sorted id array."""
    starts = segment_starts(sorted_ids, num_segments)
    return starts[:-1], starts[1:]


def segment_sum_from_bounds(vals, lo, hi):
    c = jnp.cumsum(vals, axis=0)
    zero = jnp.zeros((1,) + vals.shape[1:], dtype=c.dtype)
    cpad = jnp.concatenate([zero, c], axis=0)
    return cpad[hi] - cpad[lo]


def segment_sum_sorted(vals: jnp.ndarray, sorted_ids: jnp.ndarray,
                       num_segments: int) -> jnp.ndarray:
    """Sum vals (N, ...) into (num_segments, ...) by ascending sorted_ids.

    ids >= num_segments are ignored (dump segment). Exact for ints; for f32
    the cumsum-difference loses ~sqrt(N)*eps relative accuracy — acceptable
    for coverage (bounded winding).
    """
    starts = segment_starts(sorted_ids, num_segments)
    return segment_sum_from_starts(vals, starts)


def segment_ends_sorted(sorted_ids: jnp.ndarray) -> jnp.ndarray:
    """For each element of a sorted id array, the index of the LAST element
    of its segment. Reverse cummin of boundary indices — ~25x faster on TPU
    than searchsorted(ids, ids) (which is 20 serialized gathers)."""
    n = sorted_ids.shape[0]
    is_last = jnp.concatenate([sorted_ids[1:] != sorted_ids[:-1],
                               jnp.ones(1, bool)])
    e = jnp.where(is_last, jnp.arange(n, dtype=jnp.int32), n)
    return jnp.minimum(jnp.flip(jax.lax.cummin(jnp.flip(e))), n - 1)


def segment_suffix_sum_sorted(vals: jnp.ndarray, sorted_ids: jnp.ndarray
                              ) -> jnp.ndarray:
    """Per-element sum of LATER elements in the same segment (exclusive
    suffix): s_i = sum_{j>i, id_j == id_i} vals_j. Used by the transmittance
    composite."""
    c = _cumsum0(vals)
    seg_end = segment_ends_sorted(sorted_ids)
    return c[seg_end] - c


def row_prefix_sum(vals: jnp.ndarray, row_start: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum within rows of a flat array; row_start[i] is the
    flat index where i's row begins (backdrop_dyn.wgsl replacement)."""
    c = jnp.cumsum(vals)
    return c - c[row_start] + vals[row_start]


def lookup_sorted(keys: jnp.ndarray, queries: jnp.ndarray):
    """For each query, the index of an element of sorted ``keys`` equal to
    it: returns (idx (Q,) i32, found (Q,) bool). Three sorts (merge trick)
    instead of jnp.searchsorted's ~20 serialized gather rounds.

    keys must be ascending, values in [0, 2**30); queries arbitrary order
    (negative queries report found=False)."""
    n = keys.shape[0]
    q = queries.shape[0]
    pos = jnp.arange(q, dtype=jnp.int32)
    qc = jnp.clip(queries, 0, jnp.int32(2 ** 30 - 1))
    # sort queries (carrying their position)
    q_s, pos_s = jax.lax.sort((qc, pos), num_keys=1)
    # merge: data first at equal values => idx = (#data <= q) - 1
    # (equal queries get equal answers, so the unstable merge is exact)
    packed = jnp.concatenate([keys.astype(jnp.int32) * 2, q_s * 2 + 1])
    (m,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
    isq = (m & 1) == 1
    j = jnp.arange(n + q, dtype=jnp.int32)
    qslot = jnp.where(isq, j, jnp.int32(2 ** 30))
    (qslot_s,) = jax.lax.sort((qslot,), num_keys=1, is_stable=False)
    idx_sq = qslot_s[:q] - jnp.arange(q, dtype=jnp.int32) - 1
    # back to query order
    _, idx = jax.lax.sort((pos_s, idx_sq), num_keys=1)
    idx_c = jnp.clip(idx, 0, n - 1)
    found = (idx >= 0) & (keys[idx_c] == queries)
    return idx_c, found


def rank_sorted(keys: jnp.ndarray, queries: jnp.ndarray):
    """#keys strictly less than each query — the side='left' insertion
    index — via the same 3-sort merge trick as lookup_sorted (vs
    jnp.searchsorted's ~20 serialized gather rounds).

    keys must be ascending, values in [0, 2**30); negative queries clip
    to 0 (rank 0 for anything below the key range)."""
    n = keys.shape[0]
    q = queries.shape[0]
    pos = jnp.arange(q, dtype=jnp.int32)
    qc = jnp.clip(queries, 0, jnp.int32(2 ** 30 - 1))
    q_s, pos_s = jax.lax.sort((qc, pos), num_keys=1)
    # merge with queries FIRST at equal values => slot - #queries-before
    # = #keys strictly below (equal queries land on consecutive slots, so
    # each still subtracts its own arange position exactly)
    packed = jnp.concatenate([keys.astype(jnp.int32) * 2 + 1, q_s * 2])
    (m,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
    isq = (m & 1) == 0
    j = jnp.arange(n + q, dtype=jnp.int32)
    qslot = jnp.where(isq, j, jnp.int32(2 ** 30))
    (qslot_s,) = jax.lax.sort((qslot,), num_keys=1, is_stable=False)
    rank_sq = qslot_s[:q] - pos
    _, rank = jax.lax.sort((pos_s, rank_sq), num_keys=1)
    return rank


def scatter_sum_via_sort(vals: jnp.ndarray, ids: jnp.ndarray,
                         num_segments: int) -> jnp.ndarray:
    """Unsorted scatter-add replacement: sort (ids, vals), then segmented sum.
    vals must be 1-D (scalars per record)."""
    ids_s, vals_s = jax.lax.sort((ids, vals), num_keys=1)
    return segment_sum_sorted(vals_s, ids_s, num_segments)
