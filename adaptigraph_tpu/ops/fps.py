"""Farthest point sampling.

The reference uses DGL's ``farthest_point_sampler`` followed by a radius
dedup (reference: ``src/dynamics/dataset/graph.py:8-36`` and
``src/dynamics/utils.py:10-24`` ``fps_rad_idx``). FPS is inherently
sequential, so we provide:

- ``fps_numpy`` / ``fps_rad_numpy`` — host-side numpy, used by the data
  pipeline (runs in loader workers, never on the device hot path)
- ``fps_jax`` — a ``lax.fori_loop`` device version for the perception loop,
  returning a fixed-size index set plus a validity count
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp


# points below this count get a precomputed pairwise squared-distance matrix
# (n=2048 -> 16 MB f32); above it per-pick BLAS matvec updates are used.
# Both paths compare SQUARED distances in f32 — sqrt is monotone, so picks
# and radius cuts match the reference's f32 norm loop up to FP rounding at
# exact radius-boundary ties (measure-zero on real point clouds).
_DENSE_N = 2048


def _sq_dist_matrix(pcd):
    pcd = np.asarray(pcd, np.float32)
    sq = np.einsum("ij,ij->i", pcd, pcd)
    D = sq[:, None] + sq[None, :] - 2.0 * (pcd @ pcd.T)
    np.maximum(D, 0.0, out=D)
    return D


class _SqDist:
    """Row provider for squared distances: dense matrix when small,
    on-demand BLAS matvec when large or when only a few rows will be
    visited (``expected_rows`` hint — e.g. FPS of 100 picks from 800+
    points touches ~100 rows; the full n^2 matrix would cost more than
    the whole loop)."""

    def __init__(self, pcd, expected_rows=None):
        self.pcd = np.asarray(pcd, np.float32)
        self.n = self.pcd.shape[0]
        dense = self.n <= _DENSE_N and (
            expected_rows is None or expected_rows * 4 >= self.n)
        if dense:
            self.D = _sq_dist_matrix(self.pcd)
            self.sq = None
        else:
            self.D = None
            self.sq = np.einsum("ij,ij->i", self.pcd, self.pcd)

    def row(self, i):
        if self.D is not None:
            return self.D[i]
        d = self.sq + self.sq[i] - 2.0 * (self.pcd @ self.pcd[i])
        np.maximum(d, 0.0, out=d)
        return d


def fps_numpy(pcd, num, start_idx=None, rng=None):
    """Greedy farthest-point sampling of ``num`` indices from ``pcd (n, d)``.

    Matches DGL's algorithm (random start like graph.py:12).
    """
    n = pcd.shape[0]
    num = min(num, n)
    if start_idx is None:
        rng = rng or np.random
        start_idx = int(rng.randint(0, n)) if hasattr(rng, "randint") else int(rng.integers(0, n))
    sd = _SqDist(pcd, expected_rows=num)
    idxs = np.empty(num, dtype=np.int64)
    idxs[0] = start_idx
    dist = sd.row(start_idx).copy()
    for i in range(1, num):
        nxt = int(dist.argmax())
        idxs[i] = nxt
        np.minimum(dist, sd.row(nxt), out=dist)
    return idxs


def fps_rad_numpy(pcd, radius, rng=None):
    """Radius-capped FPS: keep adding farthest points until max distance
    <= radius (reference: ``src/dynamics/utils.py:10-24``). Returns indices."""
    n = pcd.shape[0]
    rng = rng or np.random
    start = int(rng.randint(0, n)) if hasattr(rng, "randint") else int(rng.integers(0, n))
    return _fps_rad(_SqDist(pcd), radius, start)


def _fps_rad(sd, radius, start):
    r2 = float(radius) * float(radius)
    idxs = [start]
    dist = sd.row(start).copy()
    while dist.max() > r2:
        nxt = int(dist.argmax())
        idxs.append(nxt)
        np.minimum(dist, sd.row(nxt), out=dist)
    return np.asarray(idxs, dtype=np.int64)


def fps_downsample(pcd, max_num, radius, rng=None, start_idx=None):
    """The reference's two-stage downsample (graph.py:8-36): FPS to
    ``max_num`` points, then radius-dedup the result. Returns indices into
    ``pcd``.

    When ``max_num >= n`` stage 1 selects every point, and FPS is
    prefix-closed (greedy FPS over its own selection from the same start
    reproduces the pick order), so stage 2 just truncates the sequence at
    the radius cut — one loop with an early stop is exactly equivalent and
    skips the picks the dedup would discard."""
    n = np.asarray(pcd).shape[0]
    if max_num >= n:
        if start_idx is None:
            rng = rng or np.random
            start_idx = (int(rng.randint(0, n)) if hasattr(rng, "randint")
                         else int(rng.integers(0, n)))
        sd = _SqDist(pcd)
        r2 = float(radius) * float(radius)
        idxs = [start_idx]
        dist = sd.row(start_idx).copy()
        while len(idxs) < n and dist.max() > r2:
            nxt = int(dist.argmax())
            idxs.append(nxt)
            np.minimum(dist, sd.row(nxt), out=dist)
        return np.asarray(idxs, dtype=np.int64)
    idx1 = fps_numpy(pcd, max_num, start_idx=start_idx, rng=rng)
    # deterministic start for stage 2 to keep the first FPS point first
    idx2 = fps_rad_numpy_from(np.asarray(pcd)[idx1], radius, start=0)
    return idx1[idx2]


def fps_rad_numpy_from(pcd, radius, start=0):
    return _fps_rad(_SqDist(pcd), radius, start)


@functools.partial(jax.jit, static_argnames=("num",))
def fps_jax(pcd, mask, num, start_idx=0):
    """Device FPS returning exactly ``num`` indices (may repeat when fewer
    valid points than ``num``) plus per-index validity.

    Args:
      pcd: (n, d) points.
      mask: (n,) bool validity.
      num: static sample count.

    Returns:
      idxs: (num,) int32.
      valid: (num,) bool — False for slots beyond the valid point count.
    """
    n = pcd.shape[0]
    inf = jnp.asarray(jnp.inf, pcd.dtype)

    d0 = jnp.linalg.norm(pcd - pcd[start_idx], axis=1)
    d0 = jnp.where(mask, d0, -inf)

    def body(i, carry):
        dist, idxs = carry
        nxt = jnp.argmax(dist)
        idxs = idxs.at[i].set(nxt.astype(jnp.int32))
        dist = jnp.minimum(dist, jnp.where(mask, jnp.linalg.norm(pcd - pcd[nxt], axis=1), -inf))
        return dist, idxs

    idxs0 = jnp.zeros(num, dtype=jnp.int32).at[0].set(jnp.asarray(start_idx, jnp.int32))
    _, idxs = jax.lax.fori_loop(1, num, body, (d0, idxs0))
    valid = jnp.arange(num) < jnp.sum(mask)
    return idxs, valid
